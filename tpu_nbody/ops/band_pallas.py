"""Pallas TPU kernel for the P3M band short-range pass (measured attempt).

The band pass (``ops/mesh.py::_band_short_range``) is one of the two
remaining non-floor phases of the N=1M P3M step (7.5 ms at band=128).
Its XLA form is a lax.map of dense (S, 3S) pair blocks; this kernel is
the hand-tiled equivalent: the grid walks 1024-body tiles, each tile
loads its own and both neighbor 1024-blocks of the Hilbert-sorted SoA
(so every |sorted-rank gap| <= S pair is covered exactly like the XLA
block-tridiagonal form), and evaluates 8x3 static (S=128 x S=128) pair
sub-blocks as (column, row) broadcasts — the layout the backend's Mosaic
compiler accepted for the all-pairs kernel (``ops/forces.py``: 1D f32
blocks in 1024 multiples, (N,1)x(1,128) pair temporaries).

Pair math is identical to the XLA path: rsqrt^3 Plummer kernel
(``BarnesHutAlg.kt:250-259`` softening inside r^2) with the (r/a)^4
Gaussian switch that hands the long-range part to the mesh. Guard blocks
of zero mass at both ends kill wraparound pairs; mass-0 padding
contributes exactly zero force.

Result (PERFORMANCE.md "Pallas on the hot paths"): measured on the
tunnel backend vs the XLA band pass at N=1M/band=128 — see the table
before relying on this kernel; ``mesh.py`` keeps the XLA form as the
production default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; tests run on CPU.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

TILE = 1024  # bodies per grid step; 1D f32 Pallas blocks must be 1024-mult
S = 128      # band block width (matches SimConfig.mesh_band=128 bench point)


def _band_kernel(params_ref, xp, yp, mp, xc, yc, mc, xn, yn, mn,
                 ox_ref, oy_ref):
    """One 1024-body tile: 8 sub-blocks x 3 partner rows of (128,128)."""
    soft2 = params_ref[0, 0]
    inv_a2 = params_ref[0, 1]          # 1 / a^2

    R = TILE // S                      # 8 sub-rows per tile
    # centers as columns (sublane-major), partners as (R, S) row planes
    cx = xc[:].reshape(TILE, 1)
    cy = yc[:].reshape(TILE, 1)
    rx = {-1: xp[:].reshape(R, S), 0: xc[:].reshape(R, S),
          1: xn[:].reshape(R, S)}
    ry = {-1: yp[:].reshape(R, S), 0: yc[:].reshape(R, S),
          1: yn[:].reshape(R, S)}
    rm = {-1: mp[:].reshape(R, S), 0: mc[:].reshape(R, S),
          1: mn[:].reshape(R, S)}

    def partner_row(arrs, r):
        # row r in -1..R: -1 = last row of prev block, R = first of next
        if r < 0:
            return arrs[-1][R - 1:R, :]
        if r >= R:
            return arrs[1][0:1, :]
        return arrs[0][r:r + 1, :]

    for k in range(R):                 # center sub-block k
        ccx = cx[k * S:(k + 1) * S]
        ccy = cy[k * S:(k + 1) * S]
        sax = jnp.zeros((S, 1), cx.dtype)
        say = jnp.zeros((S, 1), cx.dtype)
        for c in (k - 1, k, k + 1):    # block-tridiagonal partners
            px = partner_row(rx, c)    # (1, S)
            py = partner_row(ry, c)
            pm = partner_row(rm, c)
            dx = px - ccx              # (S, S)
            dy = py - ccy
            r2 = dx * dx + dy * dy
            inv = jax.lax.rsqrt(r2 + soft2)
            q = r2 * inv_a2
            w = pm * (inv * inv * inv) * jnp.exp(-(q * q))
            sax = sax + jnp.sum(w * dx, axis=1, keepdims=True)
            say = say + jnp.sum(w * dy, axis=1, keepdims=True)
        ox_ref[k * S:(k + 1) * S] = sax.reshape(S)
        oy_ref[k * S:(k + 1) * S] = say.reshape(S)


@jax.jit
def band_short_range_pallas(spos, smass, soft2, a):
    """Band pair pass on sorted SoA arrays; returns (cap, 2) accelerations.

    Semantically identical to ``mesh._band_short_range(band=128)`` (same
    block-tridiagonal coverage, same switch); see module docstring for the
    measured verdict vs the XLA form.
    """
    cap = spos.shape[0]
    npad = -(-cap // TILE) * TILE
    # one zero guard tile each side: index maps i-1/i/i+1 stay in range and
    # wraparound pairs get mass 0 (exactly zero force)
    x = jnp.zeros((npad + 2 * TILE,), spos.dtype).at[TILE:TILE + cap].set(
        spos[:, 0])
    y = jnp.zeros((npad + 2 * TILE,), spos.dtype).at[TILE:TILE + cap].set(
        spos[:, 1])
    m = jnp.zeros((npad + 2 * TILE,), smass.dtype).at[TILE:TILE + cap].set(
        smass)

    grid = (npad // TILE,)
    prev = pl.BlockSpec((TILE,), lambda i: (i,))
    cur = pl.BlockSpec((TILE,), lambda i: (i + 1,))
    nxt = pl.BlockSpec((TILE,), lambda i: (i + 2,))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    params = jnp.asarray([[soft2, 1.0 / (a * a)]], spos.dtype)
    ox, oy = pl.pallas_call(
        _band_kernel,
        grid=grid,
        in_specs=[smem, prev, prev, prev, cur, cur, cur, nxt, nxt, nxt],
        out_specs=(pl.BlockSpec((TILE,), lambda i: (i,)),
                   pl.BlockSpec((TILE,), lambda i: (i,))),
        out_shape=(jax.ShapeDtypeStruct((npad,), spos.dtype),
                   jax.ShapeDtypeStruct((npad,), spos.dtype)),
    )(params, x, y, m, x, y, m, x, y, m)
    return jnp.stack([ox[:cap], oy[:cap]], axis=-1)
