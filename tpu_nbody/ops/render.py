"""On-device point-splat rendering.

Replaces both reference render paths with a device-side scatter into an RGB
framebuffer; only the final image crosses to the host (the reference GPU demo
reads back ALL per-body data every frame, ``src/main/kotlin/gpu/GPU.kt:390-411``
— the BASELINE north star explicitly forbids that pattern).

Color modes:

* ``"classic"`` — the Swing panel's scheme (``NBodyPanel.kt:302-307``):
  1px points, white for m < 1000, black for m >= 1000, on black background.
* ``"speed"`` — the GPU fragment shader's speed ramp
  (``gpu/GPU.kt:241-257``): t = clamp(|v| * speed_scale, 0, 1) * 5, colors
  mixed toward white with W = 0.77: white -> cyan (smoothstep 0..0.5) ->
  purple (smoothstep 0.5..1). Default speed_scale = 1/10000
  (``gpu/GPU.kt:454``).

The world->screen transform matches the panel viewport
(``NBodyPanel.kt:68-73``): screen = (world - view) * zoom. Splats accumulate
additively and saturate, which reads like the reference's overdrawn points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def speed_colors(vel, speed_scale=1.0 / 10_000.0):
    """Per-body RGB from the GPU shader's white->cyan->purple ramp."""
    sp = jnp.linalg.norm(vel, axis=-1)
    t = jnp.clip(sp * speed_scale, 0.0, 1.0) * 5.0
    W = 0.77
    white = jnp.asarray([1.0, 1.0, 1.0])
    mid = white * W + jnp.asarray([0.0, 1.0, 1.0]) * (1.0 - W)
    fast = white * W + jnp.asarray([0.65, 0.0, 0.95]) * (1.0 - W)
    s1 = _smoothstep(0.0, 0.5, t)[:, None]
    s2 = _smoothstep(0.5, 1.0, t)[:, None]
    return (white * (1 - s1) + mid * s1) * (1 - s2) + fast * s2


def classic_colors(mass):
    """Swing panel scheme: white below mass 1000, black at/above."""
    heavy = (mass >= 1000.0)[:, None]
    return jnp.where(heavy, jnp.zeros(3), jnp.ones(3))


# 5x5 circular sprite tiers (gpu/GPU.kt:226 point size + :242-243 round
# sprite discard): ring 1 completes a 3x3 disc for point size >= 3, ring 2
# the 21-pixel 5x5 disc (corners discarded) for size >= 5.
_RING1 = tuple((dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (dx, dy) != (0, 0))
_RING2 = tuple((dx, dy) for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)
               if max(abs(dx), abs(dy)) == 2 and abs(dx) * abs(dy) != 4)


@functools.partial(jax.jit, static_argnames=("width", "height", "mode",
                                              "size_base", "size_mass_scale"))
def render_frame(pos, vel, mass, alive, *, width: int, height: int,
                 view_x=0.0, view_y=0.0, zoom=1.0, mode: str = "speed",
                 speed_scale=1.0 / 10_000.0, gain=1.0,
                 size_base: float = 1.0, size_mass_scale: float = 0.0):
    """Splat bodies into an (height, width, 3) float [0,1] framebuffer.

    With ``size_mass_scale`` > 0, per-body point size =
    clamp(size_base + size_mass_scale * mass, 1, 5) — the GPU vertex
    shader's mass-scaled ``gl_PointSize`` (``gpu/GPU.kt:226``) — and heavy
    bodies splat as circular 3x3 / 5x5 sprites (the fragment shader's round
    discard, ``gpu/GPU.kt:242-243``). 0 (default) keeps the 1-pixel splat
    and its single-scatter cost.
    """
    sx = (pos[:, 0] - view_x) * zoom
    sy = (pos[:, 1] - view_y) * zoom
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)

    if mode == "speed":
        col = speed_colors(vel, speed_scale)
    elif mode == "classic":
        col = classic_colors(mass)
    else:
        raise ValueError(f"unknown color mode {mode!r}")

    fb = jnp.zeros((width * height + 1, 3), col.dtype)

    def splat(fb, dx, dy, sel):
        jx, jy = ix + dx, iy + dy
        on = sel & (jx >= 0) & (jx < width) & (jy >= 0) & (jy < height)
        lin = jnp.where(on, jy * width + jx, width * height)
        return fb.at[lin].add(col * gain * on[:, None].astype(col.dtype))

    fb = splat(fb, 0, 0, alive)
    if size_mass_scale:
        size = jnp.clip(size_base + size_mass_scale * mass, 1.0, 5.0)
        for dx, dy in _RING1:
            fb = splat(fb, dx, dy, alive & (size >= 2.5))
        for dx, dy in _RING2:
            fb = splat(fb, dx, dy, alive & (size >= 4.5))
    return jnp.clip(fb[:-1].reshape(height, width, 3), 0.0, 1.0)


def render_frame_3d(pos, vel, mass, alive, *, width: int, height: int,
                    cam_angle=0.0, cam_pitch=0.2617994, center=None,
                    speed_scale=1.0 / 10_000.0, gain=1.0):
    """GPU-demo camera: translate to COM, yaw, fixed 15deg pitch, project.

    Mirrors the vertex shader (``gpu/GPU.kt:200-230``): screen x = pr.x /
    (W/2), y = -pr.y / (H/2); here mapped to pixels.
    """
    if center is None:
        m = jnp.sum(jnp.where(alive, mass, 0.0))
        center = jnp.sum(jnp.where(alive, mass, 0.0)[:, None] * pos, 0) / jnp.maximum(m, 1e-30)
    q = pos - center
    ca, sa = jnp.cos(cam_angle), jnp.sin(cam_angle)
    rx = ca * q[:, 0] + sa * q[:, 2]
    ry = q[:, 1]
    rz = -sa * q[:, 0] + ca * q[:, 2]
    cp, sp = jnp.cos(cam_pitch), jnp.sin(cam_pitch)
    py = cp * ry - sp * rz
    # NDC -> pixels
    sx = (rx / (width * 0.5) + 1.0) * 0.5 * width
    sy = (-py / (height * 0.5) + 1.0) * 0.5 * height
    pos2 = jnp.stack([sx, sy], axis=-1)
    return render_frame(pos2, vel, mass, alive, width=width, height=height,
                        mode="speed", speed_scale=speed_scale, gain=gain)


def to_uint8(fb):
    return (jnp.clip(fb, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def render_movie(state, params, step_fn, *, n_frames: int,
                 steps_per_frame: int, width: int, height: int,
                 view_x=0.0, view_y=0.0, zoom=1.0, mode: str = "speed",
                 speed_scale=1.0 / 10_000.0, gain=1.0):
    """Fused simulate+render loop: one jitted ``lax.scan`` produces a whole
    movie of uint8 frames with zero per-step host round-trips (BASELINE
    config[3]: fused step + on-device point-splat).

    ``step_fn(state, params) -> state`` advances one step. Returns
    (final_state, frames (n_frames, height, width, 3) uint8).
    """
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def run(state, params):
        def frame(state, _):
            def one(s, _):
                return step_fn(s, params), None
            state, _ = jax.lax.scan(one, state, None,
                                    length=steps_per_frame)
            fb = render_frame(state.pos, state.vel, state.mass, state.alive,
                              width=width, height=height, view_x=view_x,
                              view_y=view_y, zoom=zoom, mode=mode,
                              speed_scale=speed_scale, gain=gain)
            return state, to_uint8(fb)

        return jax.lax.scan(frame, state, None, length=n_frames)

    return run(state, params)
