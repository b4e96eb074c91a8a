"""Headless 2D-prototype client — parity with `src/client.c:15-122`:
connect to 127.0.0.1:12345 (`:29-30`), receive an id, send player updates,
mirror the roster (prints instead of drawing circles).

    python examples/minimal_client.py [port] [duration_s]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from rl_ode_physics_tpu.net import protocol
from rl_ode_physics_tpu.net.transport import EventType, Host


def main(port: int = 12345, duration: float = 5.0):
    host = Host(port=None, max_peers=1)
    peer = host.connect(("127.0.0.1", port))
    local_id = -1
    players = protocol.empty_players()
    pos = np.zeros(3, np.float32)
    t_end = time.monotonic() + duration
    while time.monotonic() < t_end:
        ev = host.service(0.016)        # ~60 FPS loop (src/client.c:45)
        if ev is not None and ev.type is EventType.RECEIVE:
            mtype = protocol.peek_type(ev.data)
            if mtype is protocol.MsgType.C_PLAYER_ID and local_id == -1:
                local_id = protocol.decode_player_id(ev.data)
                print("RECEIVED ID:", local_id, flush=True)
            elif mtype is protocol.MsgType.C_UPDATE_PLAYERS:
                players = protocol.decode_update_players(ev.data)
        if local_id != -1:
            pos[0] += 0.01              # wander like the WASD drift
            peer.send(0, protocol.encode_player_update(
                pos, [1.0, 0.0, 0.0], local_id))
    roster = int((players["id"] != -1).sum())
    print(f"roster size {roster}", flush=True)
    host.close()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12345,
         float(sys.argv[2]) if len(sys.argv) > 2 else 5.0)
