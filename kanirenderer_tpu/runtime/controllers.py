"""Input controllers as pure state-transition functions.

The reference's CameraController / MovableLightController mutate state from
winit events each frame (reference src/camera.rs:90-198,
src/light.rs:172-283).  Here the *pressed-key set* is host state and the
per-frame integration is pure: ``update(state, inputs, dt) -> state`` — so
the controllers compose with jit and are unit-testable as math.

Bindings (reference src/main.rs:11-17 banner + src/lib.rs:1208-1379):
  camera: WASD/arrows planar, Space/LShift vertical, mouse look (RMB held),
          scroll zoom along the view direction;
  movable light: IJKL planar, U/O vertical, =/- range, [/] color;
  directional light: R/T/Y rotate 4° about x/y/z, Key2/Key3 distance ±10;
  Tab render mode, Key1 debug texture, F1 present mode, F11 fullscreen.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from kanirenderer_tpu.core import math3d
from kanirenderer_tpu.core.types import (CameraState, DirectionalLight,
                                         MovableLight)

Array = jnp.ndarray

SAFE_PITCH = 1.5707964 - 1e-4  # FRAC_PI_2 - 0.0001 (reference src/camera.rs:15)

CAMERA_SPEED = 300.0        # reference src/lib.rs:386
CAMERA_SENSITIVITY = 0.4
LIGHT_SPEED = 300.0         # reference src/lib.rs:445
LIGHT_SENSITIVITY = 1.0


class CameraInputs(NamedTuple):
    """Per-frame input amounts (1.0 while key held, mouse deltas in px)."""

    forward: float = 0.0
    backward: float = 0.0
    left: float = 0.0
    right: float = 0.0
    up: float = 0.0
    down: float = 0.0
    rotate_dx: float = 0.0
    rotate_dy: float = 0.0
    scroll: float = 0.0


class LightInputs(NamedTuple):
    forward: float = 0.0
    backward: float = 0.0
    left: float = 0.0
    right: float = 0.0
    up: float = 0.0
    down: float = 0.0
    d_range: float = 0.0   # ±5 steps applied on key press
    d_color: float = 0.0   # ±5 per channel on key press


@partial(jax.jit, static_argnames=("speed", "sensitivity"))
def update_camera(cam: CameraState, inp: CameraInputs, dt: float,
                  speed: float = CAMERA_SPEED,
                  sensitivity: float = CAMERA_SENSITIVITY) -> CameraState:
    """Reference CameraController::update_camera (src/camera.rs:170-197):
    yaw-basis planar movement, scroll along the pitched view direction,
    mouse-delta yaw/pitch with pitch clamped to ±(π/2 − 1e-4)."""
    dt = jnp.float32(dt)
    yaw_sin = jnp.sin(cam.yaw)
    yaw_cos = jnp.cos(cam.yaw)
    forward = jnp.stack([yaw_cos, jnp.float32(0.0), yaw_sin])
    right = jnp.stack([-yaw_sin, jnp.float32(0.0), yaw_cos])
    pos = cam.position
    pos = pos + forward * (inp.forward - inp.backward) * speed * dt
    pos = pos + right * (inp.right - inp.left) * speed * dt

    pitch_sin = jnp.sin(cam.pitch)
    pitch_cos = jnp.cos(cam.pitch)
    scrollward = math3d.normalize(jnp.stack(
        [pitch_cos * yaw_cos, pitch_sin, pitch_cos * yaw_sin]))
    pos = pos + scrollward * inp.scroll * speed * sensitivity * dt
    pos = pos.at[1].add((inp.up - inp.down) * speed * dt)

    yaw = cam.yaw + inp.rotate_dx * sensitivity * dt
    pitch = cam.pitch + (-inp.rotate_dy) * sensitivity * dt
    pitch = jnp.clip(pitch, -SAFE_PITCH, SAFE_PITCH)
    return CameraState(position=pos, yaw=yaw, pitch=pitch)


@partial(jax.jit, static_argnames=("speed",))
def update_movable_light(light: MovableLight, inp: LightInputs, dt: float,
                         speed: float = LIGHT_SPEED) -> MovableLight:
    """Reference MovableLightController::update_light (src/light.rs:263-282)
    plus the range/color key steps (src/light.rs:229-258): range ±5 within
    (32, 12800), color ∓5 per channel within (1e-5, 10000)."""
    dt = jnp.float32(dt)
    yaw_sin = jnp.sin(light.yaw)
    yaw_cos = jnp.cos(light.yaw)
    forward = jnp.stack([yaw_cos, jnp.float32(0.0), yaw_sin])
    right = jnp.stack([-yaw_sin, jnp.float32(0.0), yaw_cos])
    pos = light.position
    pos = pos + forward * (inp.forward - inp.backward) * speed * dt
    pos = pos + right * (inp.right - inp.left) * speed * dt
    pos = pos.at[1].add((inp.up - inp.down) * speed * dt)

    # Key steps replicate the reference's guard-then-step quirk: the guard
    # tests the bound but the step applies regardless of direction.
    rng = light.range
    rng = jnp.where((inp.d_range > 0) & (rng > 32.0), rng + 5.0, rng)
    rng = jnp.where((inp.d_range < 0) & (rng < 12800.0), rng - 5.0, rng)
    col = light.color
    col = jnp.where((inp.d_color < 0) & (col[0] > 1e-5), col - 5.0, col)
    col = jnp.where((inp.d_color > 0) & (col[0] < 10000.0), col + 5.0, col)
    return MovableLight(position=pos, color=col, range=rng, yaw=light.yaw)


def rotate_directional_light(d: DirectionalLight, deg_x: float, deg_y: float,
                             deg_z: float) -> DirectionalLight:
    """R/T/Y keys: rotate the sun 4° about x/y/z
    (reference src/lib.rs:1341-1355 → src/light.rs:112-119)."""
    new_dir = math3d.rotate_direction_zyx(d.direction, deg_x, deg_y, deg_z)
    return d._replace(direction=new_dir)


def step_directional_distance(d: DirectionalLight,
                              delta: float) -> DirectionalLight:
    """Key2/Key3: distance ±10 clamped to [-3000, -100], with
    shadow_scene_size = |distance| * 1.5 (reference src/lib.rs:1329-1340)."""
    dist = jnp.clip(d.distance + delta, -3000.0, -100.0)
    return d._replace(distance=dist,
                      shadow_scene_size=jnp.abs(dist) * 1.5)
