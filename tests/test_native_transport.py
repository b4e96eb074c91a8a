"""Native C++ transport: build, native↔native, and Python↔native interop
(identical wire format — net/transport.py is the executable spec)."""

import time

import pytest

from rl_ode_physics_tpu.net import native_transport as nt
from rl_ode_physics_tpu.net.transport import EventType, Host

pytestmark = pytest.mark.skipif(
    not nt.build(), reason="g++/make unavailable to build libtransport.so")


def _drain(host, events, budget=0.05):
    deadline = time.monotonic() + budget
    while time.monotonic() < deadline:
        ev = host.service(0.005)
        if ev is not None:
            events.append(ev)


def test_native_to_native_roundtrip():
    server = nt.NativeHost(port=None, max_peers=4)
    client = nt.NativeHost(port=None, max_peers=1)
    try:
        peer = client.connect(("127.0.0.1", server.port))
        sev, cev = [], []
        for _ in range(50):
            _drain(server, sev, 0.01)
            _drain(client, cev, 0.01)
            if peer.connected and sev:
                break
        assert peer.connected

        big = bytes(range(256)) * 400        # forces fragmentation
        peer.send(0, big)
        got = []
        for _ in range(100):
            _drain(server, got, 0.01)
            if any(e.type is EventType.RECEIVE for e in got):
                break
        recv = [e for e in got if e.type is EventType.RECEIVE]
        assert recv and recv[0].data == big

        # ordered delivery
        for i in range(10):
            peer.send(0, f"m{i}".encode())
        got2 = []
        for _ in range(100):
            _drain(server, got2, 0.01)
            if len([e for e in got2 if e.type is EventType.RECEIVE]) >= 10:
                break
        msgs = [e.data for e in got2 if e.type is EventType.RECEIVE]
        assert msgs == [f"m{i}".encode() for i in range(10)]
    finally:
        server.close()
        client.close()


def test_python_client_native_server_interop():
    server = nt.NativeHost(port=None, max_peers=4)
    client = Host(port=None, max_peers=1)          # pure-Python peer
    try:
        peer = client.connect(("127.0.0.1", server.port))
        sev = []
        for _ in range(50):
            _drain(server, sev, 0.01)
            _drain(client, [], 0.005)
            if peer.connected:
                break
        assert peer.connected, "python client failed to connect to native host"

        peer.send(0, b"hello-from-python")
        got = []
        for _ in range(100):
            _drain(server, got, 0.01)
            if any(e.type is EventType.RECEIVE for e in got):
                break
        recv = [e for e in got if e.type is EventType.RECEIVE]
        assert recv and recv[0].data == b"hello-from-python"

        # native → python broadcast
        server.broadcast(0, b"hello-from-native")
        got2 = []
        for _ in range(100):
            _drain(client, got2, 0.01)
            if any(e.type is EventType.RECEIVE for e in got2):
                break
        recv2 = [e for e in got2 if e.type is EventType.RECEIVE]
        assert recv2 and recv2[0].data == b"hello-from-native"
    finally:
        client.close()
        server.close()


def test_make_host_prefers_native():
    h = nt.make_host(port=None)
    try:
        assert isinstance(h, nt.NativeHost)
    finally:
        h.close()
