"""Player-only replication server — parity with the reference's standalone
2D prototype (`src/server.c:17-111`): no physics, no world; just connect →
id assignment → player-state echo, rebroadcast when dirty (`:99-104`).

    python examples/minimal_server.py [port]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from rl_ode_physics_tpu.net import protocol
from rl_ode_physics_tpu.net.transport import EventType, Host


def main(port: int = 12345, duration: float = None):
    host = Host(port=port, max_peers=protocol.MAX_PLAYERS)
    players = protocol.empty_players()
    peer_to_pid = {}
    dirty = False
    print(f"minimal server on port {host.port}", flush=True)
    t_end = None if duration is None else time.monotonic() + duration
    while t_end is None or time.monotonic() < t_end:
        ev = host.service(1.0)          # 1000 ms timeout like src/server.c:40
        if ev is None:
            continue
        if ev.type is EventType.CONNECT:
            import numpy as np
            free = np.flatnonzero(players["id"] == -1)
            if free.size == 0:
                ev.peer.disconnect()
                continue
            pid = int(free[0])
            players["id"][pid] = pid
            peer_to_pid[ev.peer.addr] = pid
            ev.peer.send(0, protocol.encode_player_id(pid))
            dirty = True
        elif ev.type is EventType.RECEIVE:
            if protocol.peek_type(ev.data) is protocol.MsgType.S_PLAYER_UPDATE:
                upd = protocol.decode_player_update(ev.data)
                players[upd["id"]] = (tuple(upd["pos"]), tuple(upd["dir"]),
                                      upd["id"])
                dirty = True
        elif ev.type is EventType.DISCONNECT:
            pid = peer_to_pid.pop(ev.peer.addr, None)
            if pid is not None:
                players["id"][pid] = -1
                dirty = True
        if dirty:                        # rebroadcast-on-update (:99-104)
            host.broadcast(0, protocol.encode_update_players(players))
            dirty = False


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12345)
