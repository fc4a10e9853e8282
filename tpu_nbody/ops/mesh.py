"""P3M (particle-mesh + short-range pair correction) force solver.

The performance solver for large N on TPU. The Barnes-Hut solver
(:mod:`tpu_nbody.ops.tree` / :mod:`traverse`) reproduces the reference's MAC
semantics exactly but is bound by gather/scatter throughput; this solver
reformulates the same softened force law

    F(d) = G * m_src * d / (|d|^2 + eps^2)^(3/2)      (BarnesHutAlg.kt:250-259)

as dense, XLA-friendly work only: sort, prefix scans, FFT convolution, and
sliding-window (banded) pair blocks — no per-interaction gathers.

Force split (standard P3M): F = F_long + F_short with

    F_short(d) = F(d) * exp(-(|d|/a)^4)
    F_long(d)  = F(d) * (1 - exp(-(|d|/a)^4))

``F_long`` is smooth at scale ``a`` (resolvable by a mesh of spacing
h <= a/2) and is computed exactly as a discrete convolution of the deposited
mass grid with the sampled kernel, via zero-padded FFTs (the padded domain is
2x the root quad, so the linear — not periodic — convolution is exact for
bodies inside the root). ``F_short`` decays like exp(-(r/a)^4) and is summed
over a +-``band`` window in Hilbert order: bodies are sorted along the same
space-filling curve as the tree build, so spatial neighbors within ~a are
(almost always) within the window. Window misses cost only the tail of
``F_short``; accuracy is tuned by (mesh_level, split a, band) and measured
against the exact solver in the test suite.

Deviations from exact summation (documented): NGP mass deposit + CIC force
interpolation (mesh-order errors O(h/a)^2), and Hilbert-window misses for the
short-range part. Accuracy is comparable to Barnes-Hut at mid-range theta;
the BH solver remains the reference-exact path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_nbody.ops import morton


def _hilbert_sort(pos, mass, alive, origin, side):
    codes = morton.hilbert_codes(pos, origin, side, alive)
    order = jnp.argsort(codes, stable=True)
    return (pos[order], jnp.where(alive[order], mass[order], 0.0),
            alive[order], jnp.argsort(order))


def _kernel_hats(grid, h, soft2, a, dtype):
    """rfft2 of the sampled long-range force kernel (Kx, Ky).

    Offsets are arranged in FFT (wrapped) order over the padded domain; the
    kernel is odd so K(0) = 0 and there is no self-force. The convolution
    computes F(x) = sum_j m_j K(x - x_j), so K(u) is the acceleration a
    target at displacement u FROM the source feels: -u / (|u|^2 + eps^2)^1.5.
    """
    ix = jnp.arange(grid)
    off = jnp.where(ix <= grid // 2, ix, ix - grid).astype(dtype) * h
    # Grid layout is row-major [y][x]: axis 0 = y, axis 1 = x.
    dy = off[:, None]
    dx = off[None, :]
    r2 = dx * dx + dy * dy
    inv = jax.lax.rsqrt(r2 + soft2) / (r2 + soft2)
    r = jnp.sqrt(r2)
    long_frac = 1.0 - jnp.exp(-((r / a) ** 4))
    kx = -dx * inv * long_frac
    ky = -dy * inv * long_frac
    return jnp.fft.rfft2(kx), jnp.fft.rfft2(ky)


@functools.partial(jax.jit, static_argnames=("mesh_level", "split_cells",
                                              "dtype"))
def kernel_hats_for(root_side, soft2, *, mesh_level: int, split_cells: float,
                    dtype=jnp.float32):
    """Precompute the (Kx_hat, Ky_hat) long-range kernel FFTs.

    They depend only on static config + per-run-constant ``soft2``, so hoist
    them out of the step loop: two full padded-grid rfft2s per force pass
    (~40% of the P3M FFT work at N=1M) become one computation per jitted
    step_n call, carried into ``lax.scan`` as loop constants. Pass the result
    as ``pm_accel(..., kernel=...)``.
    """
    root_side = jnp.asarray(root_side, dtype)
    nw = 1 << mesh_level
    grid = 2 * nw
    h = root_side / nw
    a = split_cells * h
    return _kernel_hats(grid, h, soft2, a, dtype)


def _band_short_range(spos, smass, soft2, a, *, band: int, chunk: int):
    """Short-range pair sum over a sorted-order band.

    Block-tridiagonal formulation: bodies are split into blocks of ``band``
    consecutive sorted slots; each block interacts densely with itself and
    both neighbor blocks, guaranteeing coverage of every pair within
    ``band`` sorted positions (and then some). Pure reshapes/slices + fused
    elementwise pair math — no gathers, no im2col (whose feature ordering
    proved unreliable on this backend for wide windows). Padding partners
    carry mass 0; blocks stream through ``lax.map`` chunks to bound memory.
    """
    cap = spos.shape[0]
    S = band
    nb = -(-cap // S)
    fields = jnp.concatenate([spos, smass[:, None]], axis=1)  # (cap, 3)
    fields = jnp.concatenate(
        [fields, jnp.zeros((nb * S - cap, 3), spos.dtype)])
    X = fields.reshape(nb, S, 3)
    # zero guard blocks on both ends: no wraparound pairs
    Xp = jnp.concatenate([jnp.zeros((1, S, 3), spos.dtype), X,
                          jnp.zeros((1, S, 3), spos.dtype)])

    cb = max(1, min(nb, chunk // S))          # blocks per map chunk
    n_chunks = -(-nb // cb)
    pad_blocks = n_chunks * cb - nb
    Xp = jnp.concatenate([Xp, jnp.zeros((pad_blocks, S, 3), spos.dtype)])
    starts = jnp.arange(n_chunks) * cb

    def one_chunk(b0):
        ctr = jax.lax.dynamic_slice(Xp, (b0 + 1, 0, 0), (cb, S, 3))
        left = jax.lax.dynamic_slice(Xp, (b0, 0, 0), (cb, S, 3))
        right = jax.lax.dynamic_slice(Xp, (b0 + 2, 0, 0), (cb, S, 3))
        part = jnp.concatenate([left, ctr, right], axis=1)   # (cb, 3S, 3)
        dx = part[:, None, :, 0] - ctr[:, :, None, 0]        # (cb, S, 3S)
        dy = part[:, None, :, 1] - ctr[:, :, None, 1]
        mj = part[:, None, :, 2]
        r2 = dx * dx + dy * dy
        w = mj * jax.lax.rsqrt(r2 + soft2) / (r2 + soft2)
        w = w * jnp.exp(-((r2 / (a * a)) ** 2))  # (r/a)^4 switch
        return jnp.stack([jnp.sum(w * dx, axis=2),
                          jnp.sum(w * dy, axis=2)], axis=-1)  # (cb, S, 2)

    acc = jax.lax.map(one_chunk, starts)
    return acc.reshape(n_chunks * cb * S, 2)[:cap]


def _mesh_force(spos, smass, origin, h, nw, grid, soft2, a, order, kernel):
    """Deposit -> FFT convolution -> interpolate, for one grid registration.

    Deposit and interpolation MUST use the same assignment scheme: for the
    odd force kernel, symmetric deposit/interp makes the self-force cancel
    exactly (mixed schemes leave a large spurious self-kick).
    """
    dtype = spos.dtype
    cap = spos.shape[0]
    scaled = (spos - origin) / h          # position in cell units
    if order == 1:
        cell = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, nw - 1)
        idx4 = (cell[:, 1] * grid + cell[:, 0],)
        w4 = (jnp.ones((cap,), dtype),)
    else:
        u = scaled - 0.5                   # in cell-CENTER coordinates
        base = jnp.floor(u).astype(jnp.int32)
        frac = u - base.astype(dtype)      # in [0, 1)
        bx0 = jnp.clip(base[:, 0], 0, nw - 1)
        by0 = jnp.clip(base[:, 1], 0, nw - 1)
        bx1 = jnp.clip(base[:, 0] + 1, 0, nw - 1)
        by1 = jnp.clip(base[:, 1] + 1, 0, nw - 1)
        wx1, wy1 = frac[:, 0], frac[:, 1]
        wx0, wy0 = 1.0 - wx1, 1.0 - wy1
        idx4 = (by0 * grid + bx0, by0 * grid + bx1,
                by1 * grid + bx0, by1 * grid + bx1)
        w4 = (wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1)

    rho = jnp.zeros((grid * grid,), dtype)
    for idx, w in zip(idx4, w4):
        rho = rho.at[idx].add(smass * w)
    kx_hat, ky_hat = kernel
    rho_hat = jnp.fft.rfft2(rho.reshape(grid, grid))
    fx = jnp.fft.irfft2(rho_hat * kx_hat, s=(grid, grid))
    fy = jnp.fft.irfft2(rho_hat * ky_hat, s=(grid, grid))
    fgrid = jnp.stack([fx, fy], axis=-1).reshape(grid * grid, 2)

    acc_mesh = jnp.zeros_like(spos)
    for idx, w in zip(idx4, w4):
        acc_mesh = acc_mesh + fgrid[idx] * w[:, None]
    return acc_mesh


@functools.partial(jax.jit, static_argnames=("mesh_level", "split_cells",
                                              "band", "chunk", "order",
                                              "interlace"))
def pm_accel(pos, mass, alive, G, soft2, origin, root_side, *,
             mesh_level: int, split_cells: float, band: int, chunk: int,
             order: int = 2, interlace: bool = False, kernel=None):
    """P3M acceleration, original body order. (n, 2) -> (n, 2).

    mesh_level: world grid is 2^level x 2^level over the root quad; the FFT
    grid is twice that (zero padding for a linear convolution).
    split_cells: short/long split radius ``a`` in units of the cell size.
    band: Hilbert-order half-window for the short-range sum.
    order: mass-assignment order — 2 = CIC (4 cells/body, default),
    1 = NGP (1 cell/body: ~2x fewer scatter/gather passes, extra O(h/a)
    mesh noise).
    interlace: average a second mesh pass on a half-cell-shifted grid —
    cancels leading-order assignment aliasing. Measured effect on the galaxy
    scene is modest (mean error -10-15% at ~2x mesh cost); the residual error
    is dominated by the split-region (r ~ a) kernel quantization, not
    aliasing.
    kernel: optional precomputed :func:`kernel_hats_for` result; when None
    the kernel FFTs are recomputed per call (fine for one-shot use, wasteful
    inside a step loop).
    """
    dtype = pos.dtype
    origin = jnp.asarray(origin, dtype)
    root_side = jnp.asarray(root_side, dtype)
    nw = 1 << mesh_level            # world cells per side
    grid = 2 * nw                   # padded FFT grid
    h = root_side / nw
    a = split_cells * h

    spos, smass, salive, unsort = _hilbert_sort(pos, mass, alive, origin,
                                                root_side)

    if kernel is None:
        kernel = _kernel_hats(grid, h, soft2, a, dtype)
    acc_mesh = _mesh_force(spos, smass, origin, h, nw, grid, soft2, a,
                           order, kernel)
    if interlace:
        acc_mesh = 0.5 * (acc_mesh + _mesh_force(
            spos, smass, origin - 0.5 * h, h, nw, grid, soft2, a, order,
            kernel))

    acc_short = _band_short_range(spos, smass, soft2, a, band=band,
                                  chunk=chunk)

    acc = (acc_mesh + acc_short) * salive[:, None].astype(dtype)
    return G * acc[unsort]
