"""Measure the mask-reuse lazy curvature refresh (curv_knn_refresh_every)
on the real TPU at the headline bench shape (PointNet, b=32, n=1024).

The engine's lazy path now caches the kappa kernel's selection MASK and
runs the mask-consuming forward inside each refresh block — the 16-round
knockout loop (~0.9 ms of the 3.62 ms step at K=1) runs once per K steps
instead of every step. Prints trace-timed ms/step per K.

Env: B (32), STEPS (100), KS (comma list, default "4,10").
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

import bench
from geoa3_tpu.attack.engine import make_attack_fn

B = int(os.environ.get("B", 32))
STEPS = int(os.environ.get("STEPS", 100))
KS = [int(x) for x in os.environ.get("KS", "4,10").split(",")]

logits_fn, cfg, (pc, nrm, gt) = bench._setup(B, STEPS, 1024)

for K in KS:
    cfgk = dataclasses.replace(cfg, curv_knn_refresh_every=K)
    fn = jax.jit(make_attack_fn(logits_fn, cfgk))
    k0, k1 = jax.random.split(
        jax.random.PRNGKey(time.time_ns() % (2**31))
    )
    t0 = time.time()
    res = fn(pc, nrm, gt, gt, k0)
    np.asarray(res.best_attack)
    compile_s = time.time() - t0
    ms = bench._traced_ms_per_step(fn, (pc, nrm, gt, gt, k1), STEPS)
    aps = B / (ms / 1000.0) / 5000.0
    print(
        f"K={K}: {ms:.3f} ms/step (compile {compile_s:.1f}s) -> "
        f"{aps:.3f} attacks/s at full budget",
        flush=True,
    )
