"""Networking layer: wire format, reliable transport, server/client
round-trip, lockstep replay determinism (SURVEY.md §4 conformance/
determinism tiers; reference protocol in inc/msgs.h)."""

import time

import numpy as np
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.net import protocol
from rl_ode_physics_tpu.net.transport import EventType, Host
from rl_ode_physics_tpu.net.server import GameServer, SimCore
from rl_ode_physics_tpu.net.client import GameClient
from rl_ode_physics_tpu.net import replay as replay_m

SMALL = EngineConfig(max_bodies=16, max_pair_candidates=64, max_contacts=64)


# --- protocol ---------------------------------------------------------------

def test_bodystate_wire_layout_is_152_bytes():
    """Matches the reference's x86-64 struct layout: 512-body snapshot is
    the documented ~78 KB packet (SURVEY.md §1)."""
    assert protocol.BODY_STATE_DTYPE.itemsize == 152
    assert protocol.msg_update_bodies_dtype(512).itemsize == 8 + 512 * 152


def test_player_roundtrip():
    data = protocol.encode_player_update([1, 2, 3], [0, 0, 1], 5)
    assert protocol.peek_type(data) is protocol.MsgType.S_PLAYER_UPDATE
    out = protocol.decode_player_update(data)
    assert out["id"] == 5
    assert np.allclose(out["pos"], [1, 2, 3])


def test_new_body_roundtrip():
    t16 = np.eye(4).flatten(order="F")
    data = protocol.encode_new_body(1, t16, (0.15, 0, 0), (10, 20, 30, 255))
    out = protocol.decode_new_body(data)
    assert out["type"] == 1
    assert np.allclose(out["transform"], t16)
    assert np.allclose(out["size"], [0.15, 0, 0])
    assert tuple(out["color"]) == (10, 20, 30, 255)


def test_update_bodies_roundtrip():
    bodies = np.zeros((16,), protocol.BODY_STATE_DTYPE)
    bodies["type"][3] = 2
    bodies["transform"][3] = np.arange(16)
    data = protocol.encode_update_bodies(bodies)
    out = protocol.decode_update_bodies(data, 16)
    assert out["type"][3] == 2
    assert np.allclose(out["transform"][3], np.arange(16))


# --- transport --------------------------------------------------------------

def _drain(host, events, budget=0.05):
    deadline = time.monotonic() + budget
    while time.monotonic() < deadline:
        ev = host.service(0.005)
        if ev is not None:
            events.append(ev)


def test_transport_connect_send_fragmented():
    server = Host(port=None, max_peers=4)
    client = Host(port=None, max_peers=1)
    try:
        client.connect(("127.0.0.1", server.port))
        sev, cev = [], []
        for _ in range(20):
            _drain(server, sev, 0.01)
            _drain(client, cev, 0.01)
            if sev and cev:
                break
        assert any(e.type is EventType.CONNECT for e in sev)
        assert any(e.type is EventType.CONNECT for e in cev)

        # large payload (> 64 KB datagram limit) must fragment + reassemble
        big = bytes(range(256)) * 400          # 102400 bytes
        speer = next(e.peer for e in sev if e.type is EventType.CONNECT)
        speer.send(0, big)
        got = []
        for _ in range(100):
            _drain(client, got, 0.01)
            if any(e.type is EventType.RECEIVE for e in got):
                break
        recv = [e for e in got if e.type is EventType.RECEIVE]
        assert recv and recv[0].data == big
    finally:
        server.close()
        client.close()


def test_transport_ordered_delivery():
    server = Host(port=None, max_peers=4)
    client = Host(port=None, max_peers=1)
    try:
        peer = client.connect(("127.0.0.1", server.port))
        sev = []
        for _ in range(50):
            _drain(server, sev, 0.01)
            _drain(client, [], 0.005)
            if peer.connected:
                break
        assert peer.connected
        for i in range(20):
            peer.send(0, f"msg{i}".encode())
        got = []
        for _ in range(100):
            _drain(server, got, 0.01)
            if len([e for e in got if e.type is EventType.RECEIVE]) >= 20:
                break
        msgs = [e.data for e in got if e.type is EventType.RECEIVE]
        assert msgs == [f"msg{i}".encode() for i in range(20)]
    finally:
        server.close()
        client.close()


def test_transport_duplicate_fragment_of_assembled_message():
    """A retransmitted fragment arriving after its message assembled (but
    before in-order delivery) must be dropped, not crash reassembly: the
    reorder entry already holds the completed bytes (regression: duplicate
    frag raised TypeError and killed the event loop)."""
    from rl_ode_physics_tpu.net.transport import Flags, Host as PyHost

    server = PyHost(port=None, max_peers=4)
    try:
        addr = ("127.0.0.1", 65000)
        peer = server.connect(addr)      # materialize a peer object
        peer.connected = True

        # seq 1 (out of order: seq 0 never arrives) assembles from 2 frags
        # but cannot deliver yet
        server._handle(addr, Flags.RELIABLE, 0, 0, 2, 1, b"aa")
        server._handle(addr, Flags.RELIABLE, 0, 1, 2, 1, b"bb")
        assert isinstance(peer.reorder[(0, 1)], bytes)
        # duplicate of fragment 0 (ACK was lost, sender retransmitted)
        server._handle(addr, Flags.RELIABLE, 0, 0, 2, 1, b"aa")
        assert peer.reorder[(0, 1)] == b"aabb"

        # seq 0 arrives → both deliver, in order
        server._handle(addr, Flags.RELIABLE, 0, 0, 1, 0, b"first")
        got = [server.events.popleft().data for _ in range(len(server.events))]
        assert got == [b"first", b"aabb"]
    finally:
        server.close()


def test_transport_max_peers_enforced():
    """ENet parity: a host with max_peers=1 ignores the overflow connect."""
    server = Host(port=None, max_peers=1)
    c1 = Host(port=None, max_peers=1)
    c2 = Host(port=None, max_peers=1)
    try:
        p1 = c1.connect(("127.0.0.1", server.port))
        for _ in range(50):
            _drain(server, [], 0.005)
            _drain(c1, [], 0.005)
            if p1.connected:
                break
        assert p1.connected
        p2 = c2.connect(("127.0.0.1", server.port))
        for _ in range(20):
            _drain(server, [], 0.005)
            _drain(c2, [], 0.005)
        assert not p2.connected
        assert len(server.peers) == 1
    finally:
        server.close()
        c1.close()
        c2.close()


# --- server/client round trip ----------------------------------------------

def test_server_client_roundtrip():
    """Full §3.4 spawn round trip: connect → id assignment → spawn request →
    server physics → snapshot mirror on the client."""
    server = GameServer(SMALL, port=0, max_players=4)
    client = GameClient(("127.0.0.1", server.host.port), max_bodies=16,
                        max_players=4)
    try:
        for _ in range(100):
            server.pump(0.005)
            client.pump(0.005)
            if client.connected:
                break
        assert client.connected
        assert client.local_id == 0

        # spawn a sphere at y=3 and let it fall
        client.spawn_at_camera()
        for _ in range(50):
            server.pump(0.005)
            if server.sim.world.body_type.max() > 0 and int(
                    np.sum(np.asarray(server.sim.world.active))) >= 5:
                break
        # 4 arena boxes + 1 spawned sphere
        assert int(np.sum(np.asarray(server.sim.world.active))) == 5

        # run server physics + broadcast; client should mirror the body
        for _ in range(30):
            server.tick(1.0 / 60.0)
            server.pump(0.002)
            client.pump(0.01)
        types = client.bodies["type"]
        assert (types == 1).sum() == 1          # the sphere
        assert (types == 2).sum() == 4          # arena boxes
        sphere_idx = int(np.flatnonzero(types == 1)[0])
        y = client.bodies["transform"][sphere_idx][13]
        assert y < 2.0                           # it fell from the camera pos
    finally:
        client.close()
        server.close()


def test_server_full_rejects():
    server = GameServer(SMALL, port=0, max_players=1)
    c1 = GameClient(("127.0.0.1", server.host.port), max_players=1)
    c2 = GameClient(("127.0.0.1", server.host.port), max_players=1)
    try:
        for _ in range(100):
            server.pump(0.005)
            c1.pump(0.005)
            c2.pump(0.005)
            if c1.connected or c2.connected:
                break
        for _ in range(50):
            server.pump(0.005)
            c1.pump(0.005)
            c2.pump(0.005)
        assert sum([c1.local_id != -1, c2.local_id != -1]) == 1
        assert any("full" in line for line in server.log)
    finally:
        c1.close()
        c2.close()
        server.close()


# --- lockstep replay --------------------------------------------------------

def test_replay_bitwise_reproducible(tmp_path):
    """BASELINE config 5: record intents on a live sim, replay twice,
    require bitwise-identical state digests."""
    sim = SimCore(SMALL, seed=3)
    rng = np.random.default_rng(0)
    t16 = np.eye(4).flatten(order="F")
    for k in range(5):
        sim.advance(7)
        t = t16.copy()
        t[12:15] = rng.uniform(-2, 2, 3)
        t[13] = abs(t[13]) + 3.0
        sim.spawn_body(1 + (k % 2), t, (0.3, 0.3, 0.3), (1, 2, 3, 255))
    sim.advance(60)
    digest_live = sim.state_digest()

    log_path = tmp_path / "intents.jsonl"
    replay_m.save_log(sim.intent_log, str(log_path))
    log = replay_m.load_log(str(log_path))

    r1 = replay_m.replay(log, sim.tick, SMALL, seed=3)
    r2 = replay_m.replay(log, sim.tick, SMALL, seed=3)
    assert r1.state_digest() == digest_live
    assert r2.state_digest() == digest_live


def test_player_capsule_embodiment_and_replay(tmp_path):
    """Players as kinematic capsules (the reference's src/main.c:244 TODO):
    join → capsule spawns; move → capsule follows and pushes bodies;
    the whole interaction replays bitwise from the intent log."""
    sim = SimCore(SMALL, seed=9, player_capsules=True)
    slot = sim.player_join(3)
    assert slot >= 0
    # drop a sphere in front of the spawn point, let it rest
    t16 = np.eye(4).flatten(order="F")
    t16[12:15] = [0.0, 1.2, -1.0]
    sim.spawn_body(1, t16, (0.3, 0, 0), (1, 1, 1, 255))
    sim.advance(60)
    sphere_slot = 5
    x0 = float(sim.world.pos[sphere_slot, 2])

    # walk the player through the sphere: it must get pushed in +z
    for i in range(30):
        sim.player_move(3, (0.0, 1.0, -2.9 + i * 0.1))
        sim.advance(2)
    assert float(sim.world.pos[sphere_slot, 2]) > x0 + 0.1

    sim.player_leave(3)
    sim.advance(10)
    assert not bool(sim.world.active[slot])

    digest = sim.state_digest()
    r = replay_m.replay(sim.intent_log, sim.tick, SMALL, seed=9,
                        player_capsules=True)
    assert r.state_digest() == digest


def test_simcore_diagnostics_metrics():
    """SURVEY.md §5: structured per-tick counters on the server."""
    sim = SimCore(SMALL, seed=2, diagnostics=True)
    t16 = np.eye(4).flatten(order="F")
    t16[13] = 0.8
    sim.spawn_body(1, t16, (0.3, 0, 0), (1, 1, 1, 255))
    sim.advance(30)
    row = sim.metrics.last()
    assert row["tick"] == 30
    assert row["num_contacts"] >= 1
    assert row["contact_overflow"] == 0
    summary = sim.metrics.summary()
    assert summary["kinetic_energy"]["max"] >= 0.0

    # diagnostics mode is trajectory-identical to the plain step
    sim2 = SimCore(SMALL, seed=2, diagnostics=False)
    sim2.spawn_body(1, t16, (0.3, 0, 0), (1, 1, 1, 255))
    sim2.advance(30)
    assert sim.state_digest() == sim2.state_digest()


def test_spawn_with_velocity_extension():
    """X_NEW_BODY_VEL extension: wire round-trip + thrown sphere flies in
    the view direction; replay covers velocity spawns."""
    data = protocol.encode_new_body_vel(
        1, np.eye(4).flatten(order="F"), (0.15, 0, 0), (1, 2, 3, 255),
        linvel=(3.0, 1.0, 0.0), angvel=(0.0, 0.5, 0.0))
    assert protocol.peek_type(data) is protocol.MsgType.X_NEW_BODY_VEL
    out = protocol.decode_new_body_vel(data)
    assert np.allclose(out["linvel"], [3.0, 1.0, 0.0])
    assert np.allclose(out["angvel"], [0.0, 0.5, 0.0])

    sim = SimCore(SMALL, seed=1)
    t16 = np.eye(4).flatten(order="F")
    t16[12:15] = [0.0, 2.0, 0.0]
    slot = sim.spawn_body(1, t16, (0.15, 0, 0), (1, 1, 1, 255),
                          linvel=(5.0, 2.0, 0.0))
    sim.advance(12)          # 0.1 s
    x = float(sim.world.pos[slot, 0])
    assert 0.3 < x < 0.6     # ballistic: ~5 m/s * 0.1 s

    digest = sim.state_digest()
    r = replay_m.replay(sim.intent_log, sim.tick, SMALL, seed=1)
    assert r.state_digest() == digest


def test_late_join_receives_full_state():
    """SURVEY.md §5 failure recovery: the 60 Hz full-state broadcast IS the
    late-join/recovery mechanism — a client connecting mid-game mirrors the
    whole world from its first snapshot."""
    server = GameServer(SMALL, port=0, max_players=4)
    # pre-populate the world before any client exists
    t16 = np.eye(4).flatten(order="F")
    for i in range(3):
        t16[12:15] = [i * 1.0, 2.0, 0.0]
        server.sim.spawn_body(1, t16, (0.2, 0, 0), (9, 9, 9, 255))
    server.sim.advance(60)

    late = GameClient(("127.0.0.1", server.host.port), max_bodies=16,
                      max_players=4)
    try:
        for _ in range(100):
            server.pump(0.005)
            late.pump(0.005)
            if late.connected:
                break
        assert late.connected
        for _ in range(20):
            server.tick(1.0 / 60.0)
            server.pump(0.002)
            late.pump(0.01)
        types = late.bodies["type"]
        assert (types == 1).sum() == 3          # the pre-join spheres
        assert (types == 2).sum() == 4          # arena
    finally:
        late.close()
        server.close()


def test_multi_client_lockstep_replay():
    """BASELINE config 5 verbatim: multiple concurrent clients drive the
    server; the recorded intent stream replays to a bitwise-identical
    state."""
    import time as _time

    server = GameServer(SMALL, port=0, max_players=4, player_capsules=True)
    clients = [GameClient(("127.0.0.1", server.host.port), max_bodies=16,
                          max_players=4, seed=i) for i in range(3)]
    try:
        deadline = _time.monotonic() + 5.0
        while (_time.monotonic() < deadline
               and not all(c.connected for c in clients)):
            server.pump(0.003)
            for c in clients:
                c.pump(0.003)
        assert all(c.connected for c in clients)

        # interleave physics, player motion, and spawns from every client
        for round_i in range(6):
            for ci, c in enumerate(clients):
                c.pos = c.pos + np.asarray([0.1 * (ci + 1), 0.0, 0.05],
                                           np.float32)
                c.update(1.0 / 60.0 + 1.0)   # force a player-update send
                if round_i % 2 == ci % 2:
                    c.spawn_at_camera()
            deadline = _time.monotonic() + 0.5
            while _time.monotonic() < deadline:
                server.pump(0.003)
                for c in clients:
                    c.pump(0.001)
            server.sim.advance(4)

        live_digest = server.sim.state_digest()
        n_spawns = sum(1 for it in server.sim.intent_log
                       if it.kind == "spawn")
        assert n_spawns >= 6, "expected spawns from multiple clients"
        kinds = {it.kind for it in server.sim.intent_log}
        assert "player_join" in kinds and "player_move" in kinds

        r = replay_m.replay(server.sim.intent_log, server.sim.tick, SMALL,
                            seed=0, player_capsules=True)
        assert r.state_digest() == live_digest
    finally:
        for c in clients:
            c.close()
        server.close()
