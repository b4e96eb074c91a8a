// Native reliable-UDP transport — C++ implementation of the framework's
// ENet-equivalent wire protocol (see rl_ode_physics_tpu/net/transport.py,
// the executable spec; both speak the identical datagram format and
// interoperate on the wire).
//
// The reference game drives ENet (C) for its host/peer/channel/reliable
// transport (src/main.c:60-68,131,156-157,241-248). This library is the
// framework's native runtime counterpart: the Python layer binds it via
// ctypes (net/native_transport.py) and prefers it automatically when built.
//
// Features (matching the Python spec):
//   * host/peer model, connect & disconnect events
//   * 2 channels, reliable ordered delivery per (peer, channel)
//   * seq/ack with retransmission (RTO 50 ms, ~2 s give-up)
//   * fragmentation/reassembly for payloads beyond one datagram (the 78 KB
//     body snapshot exceeds the 64 KB UDP limit)
//   * non-blocking service() event pump with millisecond timeout
//
// Build: make -C native   (produces libtransport.so)

#include <arpa/inet.h>
#include <cerrno>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <string>
#include <sys/socket.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x52545055;  // 'RTPU'
constexpr size_t kMaxPayload = 1200;
constexpr double kRtoSeconds = 0.05;
constexpr int kMaxRetries = 300;
// Drop a peer with unacked traffic that has been silent this long (ENet's
// default ballpark). Must stay lenient: a single-threaded endpoint stalled
// in a jit compile stops pumping and its peers go "silent" through no fault
// of their own. The retransmit WINDOW below, not this timeout, bounds the
// dead-peer flood (60 Hz reliable snapshots to a vanished client otherwise
// retransmit an ever-growing pending backlog every RTO).
constexpr double kPeerTimeout = 30.0;
// Only the oldest N pending messages per peer retransmit per pass
// (ENet-style windowing; bounds retransmit flood bandwidth).
constexpr int kRetransmitWindow = 64;
constexpr int kNumChannels = 2;

enum Flags : uint8_t {
  kReliable = 1,
  kAck = 2,
  kConnect = 4,
  kConnectAck = 8,
  kDisconnect = 16,
};

#pragma pack(push, 1)
struct Header {  // must match net/transport.py HEADER = "<IBBHHI"
  uint32_t magic;
  uint8_t flags;
  uint8_t channel;
  uint16_t frag_idx;
  uint16_t frag_cnt;
  uint32_t seq;
};
#pragma pack(pop)
static_assert(sizeof(Header) == 14, "wire header must be 14 bytes");

double MonotonicSeconds() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

bool SeqLess(uint32_t a, uint32_t b) {  // serial-number arithmetic
  return static_cast<uint32_t>(a - b) > 0x80000000u;
}

struct Address {
  uint32_t ip;
  uint16_t port;
  bool operator<(const Address& o) const {
    return ip != o.ip ? ip < o.ip : port < o.port;
  }
};

struct Pending {
  std::map<int, std::vector<uint8_t>> packets;  // frag_idx → unacked datagram
  double sent_at = 0.0;
  int retries = 0;
};

struct Peer {
  Address addr;
  int id = -1;
  bool connected = false;
  double last_heard = 0.0;
  uint32_t next_out_seq[kNumChannels] = {0, 0};
  uint32_t next_in_seq[kNumChannels] = {0, 0};
  // (channel, seq) → unacked reliable message
  std::map<std::pair<int, uint32_t>, Pending> pending;
  // (channel, seq) → fragments in flight (empty vector slot = missing)
  std::map<std::pair<int, uint32_t>, std::vector<std::vector<uint8_t>>> frags;
  std::map<std::pair<int, uint32_t>, bool> frag_done;
  // (channel, seq) → complete message waiting for in-order delivery
  std::map<std::pair<int, uint32_t>, std::vector<uint8_t>> ready;
};

struct Event {
  int type;  // 0 none, 1 connect, 2 receive, 3 disconnect
  int peer_id;
  int channel;
  std::vector<uint8_t> data;
};

class Host {
 public:
  Host(int port, int max_peers) : max_peers_(max_peers) {
    fd_ = socket(AF_INET, SOCK_DGRAM, 0);
    int buf = 4 * 1024 * 1024;  // 60 Hz × 78 KB snapshots need depth
    setsockopt(fd_, SOL_SOCKET, SO_RCVBUF, &buf, sizeof(buf));
    setsockopt(fd_, SOL_SOCKET, SO_SNDBUF, &buf, sizeof(buf));
    sockaddr_in sa{};
    sa.sin_family = AF_INET;
    sa.sin_addr.s_addr = INADDR_ANY;
    sa.sin_port = htons(static_cast<uint16_t>(port));
    bind(fd_, reinterpret_cast<sockaddr*>(&sa), sizeof(sa));
    socklen_t len = sizeof(sa);
    getsockname(fd_, reinterpret_cast<sockaddr*>(&sa), &len);
    port_ = ntohs(sa.sin_port);
  }

  ~Host() { close(fd_); }

  int port() const { return port_; }

  int Connect(uint32_t ip, uint16_t port) {
    Address addr{ip, port};
    Peer& p = GetOrCreatePeer(addr);
    SendHeaderOnly(addr, kConnect);
    connecting_[addr] = MonotonicSeconds();
    return p.id;
  }

  void Disconnect(int peer_id) {
    Peer* p = FindPeer(peer_id);
    if (!p) return;
    SendHeaderOnly(p->addr, kDisconnect);
    DropPeer(p->addr, /*notify=*/false);
  }

  int Send(int peer_id, int channel, const uint8_t* data, size_t len,
           bool reliable) {
    Peer* p = FindPeer(peer_id);
    if (!p || channel < 0 || channel >= kNumChannels) return -1;
    uint32_t seq = p->next_out_seq[channel]++;
    size_t nfrags = len == 0 ? 1 : (len + kMaxPayload - 1) / kMaxPayload;
    Pending pend;
    for (size_t i = 0; i < nfrags; i++) {
      size_t off = i * kMaxPayload;
      size_t chunk = std::min(kMaxPayload, len - off);
      std::vector<uint8_t> pkt(sizeof(Header) + chunk);
      Header h{kMagic, static_cast<uint8_t>(reliable ? kReliable : 0),
               static_cast<uint8_t>(channel), static_cast<uint16_t>(i),
               static_cast<uint16_t>(nfrags), seq};
      memcpy(pkt.data(), &h, sizeof(h));
      if (chunk) memcpy(pkt.data() + sizeof(h), data + off, chunk);
      SendTo(pkt, p->addr);
      if (reliable) pend.packets[static_cast<int>(i)] = std::move(pkt);
    }
    if (reliable) {
      pend.sent_at = MonotonicSeconds();
      p->pending[{channel, seq}] = std::move(pend);
    }
    return 0;
  }

  void Broadcast(int channel, const uint8_t* data, size_t len) {
    std::vector<int> ids;
    for (auto& kv : peers_)
      if (kv.second.connected) ids.push_back(kv.second.id);
    for (int id : ids) Send(id, channel, data, len, /*reliable=*/true);
  }

  // Pump + retransmit; fills ev, returns its type (0 = no event).
  int Service(int timeout_ms, Event* ev) {
    double deadline = MonotonicSeconds() + timeout_ms / 1000.0;
    for (;;) {
      Pump();
      Retransmit();
      if (!events_.empty()) {
        *ev = std::move(events_.front());
        events_.pop_front();
        return ev->type;
      }
      double now = MonotonicSeconds();
      if (now >= deadline) return 0;
      timeval tv;
      double wait = std::min(deadline - now, 0.01);
      tv.tv_sec = 0;
      tv.tv_usec = static_cast<long>(wait * 1e6);
      fd_set rfds;
      FD_ZERO(&rfds);
      FD_SET(fd_, &rfds);
      select(fd_ + 1, &rfds, nullptr, nullptr, &tv);
    }
  }

 private:
  Peer& GetOrCreatePeer(const Address& addr) {
    auto it = peers_.find(addr);
    if (it != peers_.end()) return it->second;
    Peer p;
    p.addr = addr;
    p.id = next_peer_id_++;
    p.last_heard = MonotonicSeconds();
    auto res = peers_.emplace(addr, std::move(p));
    return res.first->second;
  }

  Peer* FindPeer(int id) {
    for (auto& kv : peers_)
      if (kv.second.id == id) return &kv.second;
    return nullptr;
  }

  void DropPeer(const Address& addr, bool notify) {
    auto it = peers_.find(addr);
    if (it == peers_.end()) return;
    bool was_connected = it->second.connected;
    int id = it->second.id;
    peers_.erase(it);
    if (notify && was_connected) events_.push_back({3, id, 0, {}});
  }

  void SendTo(const std::vector<uint8_t>& pkt, const Address& addr) {
    sockaddr_in sa{};
    sa.sin_family = AF_INET;
    sa.sin_addr.s_addr = addr.ip;
    sa.sin_port = htons(addr.port);
    sendto(fd_, pkt.data(), pkt.size(), MSG_DONTWAIT,
           reinterpret_cast<sockaddr*>(&sa), sizeof(sa));
  }

  void SendHeaderOnly(const Address& addr, uint8_t flags) {
    std::vector<uint8_t> pkt(sizeof(Header));
    Header h{kMagic, flags, 0, 0, 1, 0};
    memcpy(pkt.data(), &h, sizeof(h));
    SendTo(pkt, addr);
  }

  void Retransmit() {
    double now = MonotonicSeconds();
    for (auto it = connecting_.begin(); it != connecting_.end(); ++it) {
      if (now - it->second > kRtoSeconds) {
        SendHeaderOnly(it->first, kConnect);
        it->second = now;
      }
    }
    std::vector<Address> dead;
    for (auto& kv : peers_) {
      Peer& p = kv.second;
      if (!p.pending.empty() && now - p.last_heard > kPeerTimeout) {
        dead.push_back(p.addr);  // silent peer with unacked data
        continue;
      }
      int window = 0;
      for (auto& pk : p.pending) {
        if (++window > kRetransmitWindow) break;  // oldest (ch,seq) first
        Pending& pend = pk.second;
        if (now - pend.sent_at > kRtoSeconds) {
          if (++pend.retries > kMaxRetries) {
            dead.push_back(p.addr);
            break;
          }
          for (auto& pkt : pend.packets) SendTo(pkt.second, p.addr);
          pend.sent_at = now;
        }
      }
    }
    for (auto& a : dead) DropPeer(a, /*notify=*/true);
  }

  void Pump() {
    uint8_t buf[65536];
    for (;;) {
      sockaddr_in sa{};
      socklen_t slen = sizeof(sa);
      ssize_t n = recvfrom(fd_, buf, sizeof(buf), MSG_DONTWAIT,
                           reinterpret_cast<sockaddr*>(&sa), &slen);
      if (n < static_cast<ssize_t>(sizeof(Header))) {
        if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) return;
        if (n < 0) return;
        continue;
      }
      Header h;
      memcpy(&h, buf, sizeof(h));
      if (h.magic != kMagic) continue;
      Address addr{sa.sin_addr.s_addr, ntohs(sa.sin_port)};
      Handle(addr, h, buf + sizeof(Header), n - sizeof(Header));
    }
  }

  void Handle(const Address& addr, const Header& h, const uint8_t* payload,
              size_t len) {
    if (h.flags & kConnect) {
      // ENet parity: no peer slot left → ignore the connect (the client
      // retries until its own timeout); known peers always re-ack
      if (peers_.find(addr) == peers_.end() &&
          static_cast<int>(peers_.size()) >= max_peers_)
        return;
      Peer& p = GetOrCreatePeer(addr);
      p.last_heard = MonotonicSeconds();
      SendHeaderOnly(addr, kConnectAck);
      if (!p.connected) {
        p.connected = true;
        events_.push_back({1, p.id, 0, {}});
      }
      return;
    }
    if (h.flags & kConnectAck) {
      auto it = peers_.find(addr);
      if (it != peers_.end()) {
        it->second.last_heard = MonotonicSeconds();
        if (!it->second.connected) {
          it->second.connected = true;
          connecting_.erase(addr);
          events_.push_back({1, it->second.id, 0, {}});
        }
      }
      return;
    }
    if (h.flags & kDisconnect) {
      DropPeer(addr, /*notify=*/true);
      return;
    }

    auto it = peers_.find(addr);
    if (it == peers_.end()) return;
    Peer& p = it->second;
    p.last_heard = MonotonicSeconds();
    int ch = h.channel;
    if (ch < 0 || ch >= kNumChannels) return;

    if (h.flags & kAck) {
      // per-fragment ack: frag_idx names the acknowledged datagram
      auto pit = p.pending.find({ch, h.seq});
      if (pit != p.pending.end()) {
        pit->second.packets.erase(h.frag_idx);
        if (pit->second.packets.empty()) p.pending.erase(pit);
      }
      return;
    }

    if (h.flags & kReliable) {
      std::vector<uint8_t> pkt(sizeof(Header));
      Header ack{kMagic, kAck, static_cast<uint8_t>(ch), h.frag_idx, 1, h.seq};
      memcpy(pkt.data(), &ack, sizeof(ack));
      SendTo(pkt, addr);
    }

    if (SeqLess(h.seq, p.next_in_seq[ch])) return;  // stale duplicate

    auto key = std::make_pair(ch, h.seq);
    std::vector<uint8_t> complete;
    if (h.frag_cnt > 1) {
      if (p.frag_done[key]) return;  // duplicate of assembled message
      auto& parts = p.frags[key];
      if (parts.empty()) parts.resize(h.frag_cnt);
      if (h.frag_idx >= parts.size()) return;
      parts[h.frag_idx].assign(payload, payload + len);
      bool done = true;
      for (size_t i = 0; i < parts.size(); i++)
        if (parts[i].empty() && !(i == static_cast<size_t>(h.frag_idx) && len == 0))
          done = false;
      if (!done) return;
      for (auto& part : parts)
        complete.insert(complete.end(), part.begin(), part.end());
      p.frags.erase(key);
      p.frag_done[key] = true;
    } else {
      complete.assign(payload, payload + len);
    }

    p.ready[key] = std::move(complete);
    for (;;) {
      auto rk = std::make_pair(ch, p.next_in_seq[ch]);
      auto rit = p.ready.find(rk);
      if (rit == p.ready.end()) break;
      events_.push_back({2, p.id, ch, std::move(rit->second)});
      p.ready.erase(rit);
      p.frag_done.erase(rk);
      p.next_in_seq[ch]++;
    }
  }

  int fd_;
  int port_;
  int max_peers_;
  int next_peer_id_ = 0;
  std::map<Address, Peer> peers_;
  std::map<Address, double> connecting_;
  std::deque<Event> events_;

 public:
  // Last event delivered by rt_host_service — per host, so servicing two
  // Hosts on one thread cannot clobber each other's payload before
  // rt_event_data copies it out.
  Event last_event;
};

}  // namespace

// ---------------------------------------------------------------------------
// C API (ctypes binding surface)
// ---------------------------------------------------------------------------

extern "C" {

void* rt_host_create(int port, int max_peers) {
  return new Host(port, max_peers);
}

void rt_host_destroy(void* h) { delete static_cast<Host*>(h); }

int rt_host_port(void* h) { return static_cast<Host*>(h)->port(); }

int rt_host_connect(void* h, const char* ip, int port) {
  in_addr a{};
  inet_pton(AF_INET, ip, &a);
  return static_cast<Host*>(h)->Connect(a.s_addr,
                                        static_cast<uint16_t>(port));
}

int rt_peer_send(void* h, int peer_id, int channel, const uint8_t* data,
                 int len, int reliable) {
  return static_cast<Host*>(h)->Send(peer_id, channel, data,
                                     static_cast<size_t>(len),
                                     reliable != 0);
}

void rt_host_broadcast(void* h, int channel, const uint8_t* data, int len) {
  static_cast<Host*>(h)->Broadcast(channel, data, static_cast<size_t>(len));
}

void rt_peer_disconnect(void* h, int peer_id) {
  static_cast<Host*>(h)->Disconnect(peer_id);
}

// Service: returns event type (0 none / 1 connect / 2 receive / 3
// disconnect); fills peer/channel/data_len. Payload is kept per host until
// its next rt_host_service call; copy it out with rt_event_data.

int rt_host_service(void* h, int timeout_ms, int* peer_id, int* channel,
                    int* data_len) {
  Host* host = static_cast<Host*>(h);
  int type = host->Service(timeout_ms, &host->last_event);
  if (type != 0) {
    *peer_id = host->last_event.peer_id;
    *channel = host->last_event.channel;
    *data_len = static_cast<int>(host->last_event.data.size());
  } else {
    *peer_id = -1;
    *channel = 0;
    *data_len = 0;
  }
  return type;
}

int rt_event_data(void* h, uint8_t* out, int max_len) {
  const Event& ev = static_cast<Host*>(h)->last_event;
  int n = std::min<int>(max_len, static_cast<int>(ev.data.size()));
  if (n > 0) memcpy(out, ev.data.data(), n);
  return n;
}

}  // extern "C"
