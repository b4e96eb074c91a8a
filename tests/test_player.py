"""Player controller conformance vs src/player.c math."""

import numpy as np

from rl_ode_physics_tpu.models.player import (
    MAX_PITCH, PlayerCamera, PlayerInput, update_local,
)


def test_default_camera_matches_reference():
    cam = PlayerCamera()
    assert np.allclose(cam.pos, [0.0, 2.0, -3.0])    # src/player.c:8
    assert cam.fovy == 90.0


def test_forward_motion():
    cam = PlayerCamera()
    # yaw=0, pitch=0 → forward = +Z (src/player.c:38-42)
    cam2 = update_local(cam, PlayerInput(w=True), 2.0, 2.0, dt=0.5)
    assert np.allclose(cam2.pos - cam.pos, [0.0, 0.0, 1.0], atol=1e-6)


def test_pitch_clamped():
    cam = PlayerCamera()
    for _ in range(100):
        cam = update_local(cam, PlayerInput(i=True), dt=0.1)
    assert abs(cam.pitch - MAX_PITCH) < 1e-9


def test_shift_ramps_speed():
    cam = PlayerCamera()
    a = update_local(cam, PlayerInput(w=True), dt=0.1)
    b = update_local(cam, PlayerInput(w=True, shift=True), dt=0.1)
    assert b.pos[2] > a.pos[2]
    assert b.mult > 1.0
    # releasing shift resets the ramp (src/player.c:15-16)
    c = update_local(b, PlayerInput(), dt=0.1)
    assert c.mult == 1.0


def test_zoom_toggle():
    cam = update_local(PlayerCamera(), PlayerInput(zoom=True), dt=0.01)
    assert cam.fovy == 40.0
    cam = update_local(cam, PlayerInput(), dt=0.01)
    assert cam.fovy == 90.0


def test_strafe_uses_up_cross_forward():
    cam = PlayerCamera()
    cam2 = update_local(cam, PlayerInput(a=True), 2.0, 2.0, dt=0.5)
    # right = up × forward = (0,1,0)×(0,0,1) = (1,0,0); A moves +x
    assert np.allclose(cam2.pos - cam.pos, [1.0, 0.0, 0.0], atol=1e-6)
