"""Morton (Z-order) encoding for on-device spatial sorting.

The reference builds a pointer-based recursive quadtree by inserting bodies
one at a time (``src/main/kotlin/BarnesHutAlg.kt:125-156``). On TPU we
replace pointer chasing with a Morton-code radix sort: each body gets a
30-bit interleaved code (15 bits per axis) over the root quad, bodies are
sorted by code, and every quadtree node is then a contiguous range of the
sorted order. 15+15 bits keep codes in int32 (no x64 requirement) and allow
trees up to 15 levels deep — spatial resolution ~2404px / 2^15 = 0.073px,
far below the softening length eps=1.

Half-open cell semantics [lo, hi) match the reference's Quad.contains
(``BarnesHutAlg.kt:61-62``).
"""

from __future__ import annotations


import jax.numpy as jnp

COORD_BITS = 15
CODE_BITS = 2 * COORD_BITS  # 30
MAX_COORD = (1 << COORD_BITS) - 1
# Sentinel code for dead bodies: sorts after every valid 30-bit code.
DEAD_CODE = jnp.int32(1 << CODE_BITS)


def part1by1(x):
    """Spread the low 15 bits of ``x`` so bit i lands at position 2i."""
    x = jnp.asarray(x, jnp.int32) & 0x7FFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def compact1by1(x):
    """Inverse of :func:`part1by1`: gather even bits of ``x``."""
    x = jnp.asarray(x, jnp.int32) & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF
    return x


def encode2d(ix, iy):
    """Interleave two 15-bit ints into a 30-bit Morton code (x = even bits)."""
    return part1by1(ix) | (part1by1(iy) << 1)


def decode2d(code):
    return compact1by1(code), compact1by1(code >> 1)


def hilbert2d(ix, iy):
    """Hilbert-curve index of 15-bit cell coordinates (30-bit result).

    Used as the body sort key instead of the raw Morton code: the Hilbert
    curve is spatially continuous, so fixed-size blocks of consecutive sorted
    bodies have compact bounding boxes even when the scene straddles the root
    quadrant boundaries (the reference centers its default scenes exactly on
    the root center, ``BodyFactory.kt:19-20``, which makes plain Z-order
    groups degenerate). Like Morton, every aligned quadtree cell at level l
    is a contiguous range of 4^(15-l) Hilbert codes, so the flat-tree build
    (code-range searchsorted) is unchanged — only the child->quadrant mapping
    rotates, which the build never relies on.

    Vectorized form of the standard xy->d loop (Wikipedia "Hilbert curve",
    public domain algorithm).
    """
    x = jnp.asarray(ix, jnp.int32)
    y = jnp.asarray(iy, jnp.int32)
    d = jnp.zeros_like(x)
    # Python-unrolled (not fori_loop): XLA fuses the 15 rounds into ONE
    # elementwise kernel; a loop would pay per-iteration dispatch (~0.2 ms
    # each on this backend) — 15 rounds x all callers adds up.
    for i in range(COORD_BITS):
        s = jnp.int32(1) << (COORD_BITS - 1 - i)
        rx = ((x & s) > 0).astype(jnp.int32)
        ry = ((y & s) > 0).astype(jnp.int32)
        d = d + s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = jnp.where(flip, s - 1 - x, x)
        yf = jnp.where(flip, s - 1 - y, y)
        x, y = jnp.where(swap, yf, xf), jnp.where(swap, xf, yf)
    return d


def hilbert2d_inverse(d):
    """Cell coordinates of a 30-bit Hilbert index (inverse of hilbert2d)."""
    t = jnp.asarray(d, jnp.int32)
    x = jnp.zeros_like(t)
    y = jnp.zeros_like(t)
    for i in range(COORD_BITS):  # unrolled for fusion, like hilbert2d
        s = jnp.int32(1) << i
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = jnp.where(flip, s - 1 - x, x)
        yf = jnp.where(flip, s - 1 - y, y)
        x, y = jnp.where(swap, yf, xf), jnp.where(swap, xf, yf)
        x, y, t = x + s * rx, y + s * ry, t // 4
    return x, y


def cell_coords(pos, origin, side):
    """Integer cell coordinates of positions on the 2^15 grid over the root.

    Out-of-root bodies are clamped to edge cells (deviation from the
    reference, which silently drops them from the tree while still applying
    tree forces to them — ``BarnesHutAlg.kt:126,359-366``; pass their
    exerted mass as 0 for strict parity).
    """
    scale = (1 << COORD_BITS) / side
    ij = jnp.floor((pos - jnp.asarray(origin, pos.dtype)) * scale).astype(jnp.int32)
    return jnp.clip(ij, 0, MAX_COORD)


def morton_codes(pos, origin, side, alive=None):
    ij = cell_coords(pos, origin, side)
    codes = encode2d(ij[..., 0], ij[..., 1])
    if alive is not None:
        codes = jnp.where(alive, codes, DEAD_CODE)
    return codes


def hilbert_codes(pos, origin, side, alive=None):
    """Default body sort key (see :func:`hilbert2d` for why not Morton)."""
    ij = cell_coords(pos, origin, side)
    codes = hilbert2d(ij[..., 0], ij[..., 1])
    if alive is not None:
        codes = jnp.where(alive, codes, DEAD_CODE)
    return codes
