"""Measure the PN++ attack step at the CLI-default lazy curvature refresh
(curv_knn_refresh_every, engine deviation #7) on the real TPU.

The per-step time is weight-independent (same program/shapes), so the
victim is random-init — no trained checkpoint needed. Prints trace-timed
ms/step per (ARCH, K), bench.py methodology (device-track trace, fresh
PRNG keys against the relay memoizer).

Env: ARCH (PointNetPP | PointNetPP_MSG), B (16 SSG / 10 MSG convention),
STEPS (50), KS (comma list, default "1,10").
"""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

import bench
from geoa3_tpu.attack import AttackConfig
from geoa3_tpu.attack.engine import make_attack_fn
from geoa3_tpu.data.synthetic import sample_shape
from geoa3_tpu.models.registry import build_model, make_eval_fn

ARCH = os.environ.get("ARCH", "PointNetPP")
B = int(os.environ.get("B", "16" if ARCH == "PointNetPP" else "10"))
STEPS = int(os.environ.get("STEPS", 50))
KS = [int(x) for x in os.environ.get("KS", "1,10").split(",")]
N = 1024

model = build_model(ARCH, classes=40, npoint=N)
variables = model.init(
    {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, N, 3)), train=False
)
logits_fn = make_eval_fn(model, variables)

rng = np.random.RandomState(0)
clouds, normals = [], []
for i in range(B):
    p, m = sample_shape(i % 10, N, rng)
    clouds.append(p)
    normals.append(m)
pc = jnp.asarray(np.stack(clouds))
nrm = jnp.asarray(np.stack(normals))
gt = jnp.asarray(rng.randint(0, 40, B))

cfg = AttackConfig(
    attack_label="Untarget", classes=40, npoint=N,
    binary_max_steps=1, iter_max_steps=STEPS,
    cls_loss_type="CE", dis_loss_type="CD", dis_loss_weight=1.0,
    hd_loss_weight=0.1, curv_loss_weight=1.0, curv_loss_knn=16,
)

# the engine asserts iter_max_steps % curv_knn_refresh_every == 0 — drop
# non-divisor Ks up front instead of aborting mid-sweep
ks_ok = [k for k in KS if STEPS % k == 0]
if ks_ok != KS:
    print(f"WARNING: dropping K values that do not divide STEPS={STEPS}: "
          f"{sorted(set(KS) - set(ks_ok))}", flush=True)

for K in ks_ok:
    cfgk = dataclasses.replace(cfg, curv_knn_refresh_every=K)
    fn = jax.jit(make_attack_fn(logits_fn, cfgk))
    # bench._measure is the timing methodology of record (fresh PRNG keys,
    # compile timing, wall-clock fallback when the trace is unusable)
    compile_s, ms = bench._measure(fn, (pc, nrm, gt, gt), STEPS)
    aps = B / (ms / 1000.0) / 5000.0
    print(
        f"{ARCH} B={B} K={K}: {ms:.3f} ms/step (compile {compile_s:.1f}s) "
        f"-> {aps:.3f} attacks/s at full budget",
        flush=True,
    )
