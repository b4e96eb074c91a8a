"""The 2D-prototype pair (reference src/server.c + src/client.c parity)."""

import socket
import subprocess
import sys


def test_minimal_server_client_pair():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    server = subprocess.Popen(
        [sys.executable, "examples/minimal_server.py", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo")
    try:
        out = subprocess.run(
            [sys.executable, "examples/minimal_client.py", str(port), "4"],
            capture_output=True, text=True, timeout=60, cwd="/root/repo")
        assert "RECEIVED ID: 0" in out.stdout, out.stdout + out.stderr
        assert "roster size 1" in out.stdout, out.stdout
    finally:
        server.kill()
        server.wait()


def test_articulated_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/articulated.py", "8"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DONE: arm swept" in out.stdout
