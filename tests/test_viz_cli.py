"""Debug viz dump and CLI entry (menu replacement)."""

import subprocess
import sys

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.utils.viz import dump_obj
import pytest

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64)


def test_dump_obj(tmp_path):
    w = scenes.sphere_drop_world(CFG, height=2.0)
    path = str(tmp_path / "frame.obj")
    n = dump_obj(w, path)
    assert n == 5                       # 4 arena boxes + sphere
    text = open(path).read()
    assert text.count("o body_") == 5
    assert "v " in text and "f " in text


@pytest.mark.slow
def test_cli_server_client_session():
    """End-to-end over the CLI: headless server + spawning client."""
    import socket
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    server = subprocess.Popen(
        [sys.executable, "-m", "rl_ode_physics_tpu.net", "server",
         "--port", str(port), "--duration", "180",
         "--max-bodies", "64", "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        outputs = []
        # session 1 spawns; if its window closed before the server finished
        # compiling/spawning, session 2 observes the persistent world
        for spawn in ("3", "0"):
            client = subprocess.run(
                [sys.executable, "-m", "rl_ode_physics_tpu.net", "client",
                 "--port", str(port), "--spawn", spawn, "--duration", "40",
                 "--max-bodies", "64", "--platform", "cpu"],
                capture_output=True, text=True, timeout=120)
            outputs.append(client.stdout + client.stderr)
            if "mirrored 7 bodies" in client.stdout:
                break
        assert any("mirrored 7 bodies" in o for o in outputs), outputs
    finally:
        server.kill()
        server.wait()
