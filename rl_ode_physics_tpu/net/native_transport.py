"""ctypes binding for the native C++ transport (native/transport.cpp).

Same event/host/peer API shape as ``net.transport`` and the identical wire
format — the two interoperate (a Python ``Host`` can talk to a native one).
``available()``/``build()`` manage the shared library; ``NativeHost`` is a
drop-in for latency-sensitive servers (no GIL-bound packet pump).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

from rl_ode_physics_tpu.net.transport import Event, EventType

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtransport.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile libtransport.so with make (g++). Returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        raise OSError("libtransport.so not built (run make -C native)")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.rt_host_create.restype = ctypes.c_void_p
    lib.rt_host_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.rt_host_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_host_port.restype = ctypes.c_int
    lib.rt_host_port.argtypes = [ctypes.c_void_p]
    lib.rt_host_connect.restype = ctypes.c_int
    lib.rt_host_connect.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int]
    lib.rt_peer_send.restype = ctypes.c_int
    lib.rt_peer_send.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.rt_host_broadcast.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_char_p, ctypes.c_int]
    lib.rt_peer_disconnect.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rt_host_service.restype = ctypes.c_int
    lib.rt_host_service.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rt_event_data.restype = ctypes.c_int
    lib.rt_event_data.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


class NativePeer:
    def __init__(self, host: "NativeHost", peer_id: int):
        self.host = host
        self.peer_id = peer_id
        self.connected = False
        self.addr = ("native", peer_id)   # identity key, API parity

    def send(self, channel: int, data: bytes, reliable: bool = True):
        self.host._lib.rt_peer_send(
            self.host._h, self.peer_id, channel, data, len(data),
            1 if reliable else 0)

    def disconnect(self):
        self.host._lib.rt_peer_disconnect(self.host._h, self.peer_id)


class NativeHost:
    """API-compatible with ``net.transport.Host`` (service/broadcast/...)."""

    def __init__(self, port: Optional[int] = None, max_peers: int = 32,
                 bind_host: str = "0.0.0.0"):
        del bind_host  # native lib binds INADDR_ANY
        self._lib = _load()
        self._h = self._lib.rt_host_create(0 if port is None else port,
                                           max_peers)
        self.port = self._lib.rt_host_port(self._h)
        self.peers: Dict[int, NativePeer] = {}

    def connect(self, address: Tuple[str, int]) -> NativePeer:
        pid = self._lib.rt_host_connect(
            self._h, address[0].encode(), address[1])
        peer = self.peers.setdefault(pid, NativePeer(self, pid))
        return peer

    def broadcast(self, channel: int, data: bytes, reliable: bool = True):
        del reliable  # native broadcast is always reliable (like the server)
        self._lib.rt_host_broadcast(self._h, channel, data, len(data))

    def service(self, timeout: float = 0.0) -> Optional[Event]:
        pid = ctypes.c_int()
        ch = ctypes.c_int()
        dlen = ctypes.c_int()
        etype = self._lib.rt_host_service(
            self._h, int(timeout * 1000),
            ctypes.byref(pid), ctypes.byref(ch), ctypes.byref(dlen))
        if etype == 0:
            return None
        peer = self.peers.setdefault(pid.value, NativePeer(self, pid.value))
        data = b""
        if dlen.value > 0:
            buf = (ctypes.c_uint8 * dlen.value)()
            n = self._lib.rt_event_data(self._h, buf, dlen.value)
            data = bytes(buf[:n])
        if etype == 1:
            peer.connected = True
            return Event(EventType.CONNECT, peer)
        if etype == 2:
            return Event(EventType.RECEIVE, peer, ch.value, data)
        peer.connected = False
        return Event(EventType.DISCONNECT, peer)

    def flush(self):
        self.service(0.0)

    def close(self):
        if self._h:
            self._lib.rt_host_destroy(self._h)
            self._h = None


def make_host(port: Optional[int] = None, max_peers: int = 32,
              prefer_native: bool = True):
    """Best transport available: native C++ if built, else pure Python."""
    if prefer_native and available():
        return NativeHost(port=port, max_peers=max_peers)
    from rl_ode_physics_tpu.net.transport import Host
    return Host(port=port, max_peers=max_peers)
