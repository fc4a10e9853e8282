"""Bisect the BH N=1M engine-path worker crash (VERDICT round-2 item 3).

The standalone build+traverse+force pass runs fine at N=1M, but the engine
step crashes the TPU worker. Run each candidate stage in a SUBPROCESS so a
kernel fault kills only that stage; poll worker recovery between stages.

Usage: python tools/bh_fault_bisect.py [stage ...]
Stages: accel kdk16 kdk64 reuse16 scan2
"""

from __future__ import annotations

import subprocess
import sys
import time

COMMON = r'''
import jax, jax.numpy as jnp, numpy as np
from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Engine

n = 1_000_000; cap = 1048576
def make(gc, integ):
    cfg = SimConfig(capacity=cap, max_depth=14, group_chunk=gc,
                    approx_cap=1024, direct_body_cap=4096,
                    frontier_cap=1024, leaf_list_cap=512)
    eng = Engine(cfg, Params.default(), solver="bh", integrator=integ,
                 seed=3, auto_retune=False)
    n2 = n // 5
    eng.reset_default_scene(n1=n - n2, n2=n2)
    return eng
'''

STAGES = {
    "accel": COMMON + '''
from tpu_nbody.ops import tree as tree_lib, traverse
eng = make(16, "kdk")
cfg = eng.cfg
ox, oy = cfg.root_center
origin = (ox - cfg.root_half, oy - cfg.root_half)
t = tree_lib.build_tree(eng.state.pos,
                        jnp.where(eng.state.alive, eng.state.mass, 0.0),
                        eng.state.alive, origin, 2.0 * cfg.root_half,
                        num_nodes=eng.caps.num_nodes, leaf_size=cfg.leaf_size,
                        max_depth=cfg.max_depth)
acc, st = traverse.bh_accel_from_tree(
    t, jnp.float32(0.5), jnp.float32(1.0), jnp.float32(80.0),
    group_size=512, group_cap=eng.caps.group_cap, max_depth=14,
    frontier_cap=1024, approx_cap=1024, leaf_list_cap=512,
    direct_body_cap=4096, group_chunk=16)
print("OK accel", float(acc[0, 0]))
''',
    "kdk16": COMMON + '''
eng = make(16, "kdk")
eng.step(1)
print("OK kdk16", float(eng.state.pos[0, 0]))
''',
    "euler16": COMMON + '''
eng = make(16, "euler")
eng.step(1)
print("OK euler16", float(eng.state.pos[0, 0]))
''',
    "euler16nomerge": COMMON + '''
eng = make(16, "euler")
eng.params = eng.params._replace(merge_min_dist=jnp.float32(0.0))
eng.step(1)
print("OK euler16nomerge", float(eng.state.pos[0, 0]))
''',
    "kdk16nomerge": COMMON + '''
eng = make(16, "kdk")
eng.params = eng.params._replace(merge_min_dist=jnp.float32(0.0))
eng.step(1)
print("OK kdk16nomerge", float(eng.state.pos[0, 0]))
''',
    "kdk64": COMMON + '''
eng = make(64, "kdk")
eng.step(1)
print("OK kdk64", float(eng.state.pos[0, 0]))
''',
    "reuse16": COMMON + '''
eng = make(16, "kdk_reuse")
eng.step(1)
print("OK reuse16", float(eng.state.pos[0, 0]))
''',
    "scan2": COMMON + '''
eng = make(16, "kdk")
eng.step(2)
print("OK scan2", float(eng.state.pos[0, 0]))
''',
}

# Round-4 hier-traversal stages: the split probe (tree and traversal in
# SEPARATE executables, tools/hier_probe.py) runs fine at N=1M while the
# engine path crashes the worker — these bisect the one_step graph.
HIER_COMMON = r'''
import jax, jax.numpy as jnp, numpy as np
from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Engine

n = 1_000_000; cap = 1048576
def make_hier(integ, merge=True):
    cfg = SimConfig(capacity=cap, max_depth=14, group_chunk=64,
                    direct_body_cap=16384, leaf_list_cap=2048,
                    approx_cap=1024, frontier_cap=1024,
                    bh_hier_cand_caps=(131072, 32768, 4096),
                    bh_traversal="hier")
    p = Params.default() if merge else Params.default(merge_min_dist=0.0)
    eng = Engine(cfg, p, solver="bh", integrator=integ, seed=3,
                 auto_retune=False)
    n2 = n // 5
    eng.reset_default_scene(n1=n - n2, n2=n2)
    return eng
'''

STAGES.update({
    # tree build + hier traversal FUSED in one executable (the
    # make_bh_accel path the engine's seed_fn compiles)
    "hier_fused": HIER_COMMON + '''
from tpu_nbody.engine import Caps, make_bh_accel
eng = make_hier("kdk_reuse")
accel = make_bh_accel(eng.cfg, eng.caps)
acc, st = accel(eng.state.pos, eng.state.mass, eng.state.alive, eng.params)
print("OK hier_fused", float(acc[0, 0]))
''',
    "hier_reuse1": HIER_COMMON + '''
eng = make_hier("kdk_reuse")
eng.step(1)
print("OK hier_reuse1", float(eng.state.pos[0, 0]))
''',
    "hier_reuse1_nomerge": HIER_COMMON + '''
eng = make_hier("kdk_reuse", merge=False)
eng.step(1)
print("OK hier_reuse1_nomerge", float(eng.state.pos[0, 0]))
''',
    "hier_reuse4": HIER_COMMON + '''
eng = make_hier("kdk_reuse")
eng.step(4)
print("OK hier_reuse4", float(eng.state.pos[0, 0]))
''',
})


def wait_worker(max_wait=900):
    probe = ("import jax, jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.ones((64,64)))))")
    deadline = time.time() + max_wait
    while time.time() < deadline:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=90)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(25)
    return False


def main():
    stages = sys.argv[1:] or list(STAGES)
    for name in stages:
        if not wait_worker():
            print(f"[{name}] SKIPPED: worker never recovered", flush=True)
            continue
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", STAGES[name]],
                           capture_output=True, text=True, timeout=1800)
        dt = time.time() - t0
        tail = (r.stdout.strip().splitlines() or ["<no stdout>"])[-1]
        err = (r.stderr.strip().splitlines() or [""])[-1]
        print(f"[{name}] rc={r.returncode} {dt:.0f}s: {tail}"
              + ("" if r.returncode == 0 else f" | {err[:160]}"), flush=True)


if __name__ == "__main__":
    main()
