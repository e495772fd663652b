"""Dense-cloud attack benchmark (SURVEY §5 scaling axis: n <= 10000).

The headline bench runs at n=1024 where every hot op rides a Pallas kernel.
Dense source clouds (the reference's modelnet_pure 10000-pt set,
main_attack.py:213,283-295) run the subsample-opt config: the optimised
offset lives on the FULL n-point cloud and each step FPS-subsamples
cfg.npoint=1024 points for the victim, while the geometry losses run at
full n — where the kappa kernel gate (n <= 4096) and the [b, n, n] mask
residual bite and composed XLA paths take over.

Usage: python runs/bench_dense.py [n ...]   (default: 5000 10000)
Emits one BENCH-style JSON line per shape to stdout.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update(
    "jax_compilation_cache_dir", "/root/repo/.jax_cache"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import bench
from geoa3_tpu.attack import AttackConfig
from geoa3_tpu.attack.engine import make_attack_fn
from geoa3_tpu.data.synthetic import sample_shape
from geoa3_tpu.models.registry import build_model, make_eval_fn

FULL_BUDGET = 10 * 500


def _make_fn(logits_fn, steps: int):
    cfg = AttackConfig(
        attack_label="Untarget",
        classes=40,
        npoint=1024,           # victim shape; n-pt cloud is subsampled
        binary_max_steps=1,
        iter_max_steps=steps,
        cls_loss_type="CE",
        dis_loss_type="CD",
        hd_loss_weight=0.1,
        curv_loss_weight=1.0,
        curv_loss_knn=16,
        is_subsample_opt=True,
        eval_num=1,
    )
    return jax.jit(make_attack_fn(logits_fn, cfg))


def run_dense(n: int, batch: int, steps: int) -> dict:
    model = build_model("PointNet", classes=40, npoint=1024)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1024, 3)),
        train=False,
    )
    logits_fn = make_eval_fn(model, variables)

    rng = np.random.RandomState(0)
    clouds, normals = [], []
    for i in range(batch):
        p, m = sample_shape(i % 10, n, rng)
        clouds.append(p)
        normals.append(m)
    pc = jnp.asarray(np.stack(clouds))
    nrm = jnp.asarray(np.stack(normals))
    gt = jnp.asarray(rng.randint(0, 40, batch))

    # The dense prologue is NOT per-step work: kappa_ori runs ONE
    # [b, n, n] kNN (an XLA top_k sort — 373 ms at n=10000, 68% of a
    # 50-step trace) before the attack scan, exactly like the reference
    # computes _get_kappa_ori once per batch (geoA3_attack.py:116-124).
    # A single T(steps)/steps division smears it: two scan lengths give
    # the honest split T(s) = prologue + s * per_step, and the headline
    # extrapolates to the full 5000-step budget where the prologue
    # amortises to ~2%.
    s1, s2 = steps, steps * 4
    fn1 = _make_fn(logits_fn, s1)
    fn2 = _make_fn(logits_fn, s2)
    compile_s, t1 = bench._measure(fn1, (pc, nrm, gt, gt), 1)
    _, t2 = bench._measure(fn2, (pc, nrm, gt, gt), 1)
    per_step = (t2 - t1) / (s2 - s1)
    prologue = max(t1 - s1 * per_step, 0.0)
    aps = batch / ((prologue + per_step * FULL_BUDGET) / 1000)
    return {
        "metric": "attacks_per_sec_per_chip_dense",
        "value": round(aps, 4),
        "unit": f"attacks/s ({n}-pt cloud, subsample-opt 1024-pt PointNet, "
                "full GeoA3 budget)",
        "n": n,
        "batch": batch,
        "ms_per_step": round(per_step, 2),
        "prologue_ms": round(prologue, 1),
        "compile_s": round(compile_s, 1),
        # round 5: the EXACT-shape kappa gate still rejects dense n, but
        # the prologue rides the sentinel-padded kernel and the per-step
        # 1-NN rides the dense-gated dual-1NN kernel (PARITY round-5)
        "kappa_exact_gate_off": n > 4096 or n % 128 != 0,
    }


if __name__ == "__main__":
    shapes = [int(a) for a in sys.argv[1:]] or [5000, 10000]
    steps = int(os.environ.get("GEOA3_BENCH_STEPS", 50))
    bset = os.environ.get("GEOA3_DENSE_BATCH")  # e.g. "8" or "4,8,16"
    for n in shapes:
        # default batch = the round-5 sweep's measured optimum (larger
        # batches amortise the victim+FPS fixed costs now that no [b, n, m]
        # matrix materialises: n=5000 b=8/16/32 -> 0.589/0.684/0.711
        # attacks/s, n=10000 b=4/8/16 -> 0.297/0.421/0.458);
        # GEOA3_DENSE_BATCH overrides, e.g. "8" or "4,8,16"
        bs = (
            [int(x) for x in bset.split(",")]
            if bset
            else [32 if n <= 5000 else 16]
        )
        for b in bs:
            print(json.dumps(run_dense(n, b, steps)), flush=True)
