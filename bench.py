"""Benchmark: GeoA3 attack throughput on one TPU chip.

Measures attacks/sec/chip for the reference's headline configuration — the
full geometry-aware attack (CE + Chamfer 1.0 + Hausdorff 0.1 + curvature 1.0
k=16) on the 1024-point PointNet victim at the default budget of
binary_max_steps=10 x iter_max_steps=500 = 5000 optimisation steps per
instance (reference main_attack.py:331-348).

Method: compile the attack program once, run `MEASURE_STEPS` inner steps of
the scanned loop under a jax.profiler trace, and read the module's on-device
execution time out of the trace (the longest single event on the device
track). Host wall-clock is NOT trustworthy on the tunnelled runtime:
`block_until_ready` can return before execution finishes and host fetches
cost ~2.4 s, so wall timing can both under- and over-state. The full
5000-step budget is a pure repetition of the same compiled inner step, so
throughput extrapolates exactly; binary-search bookkeeping between scans is
a few fused vector ops.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
denominator used for vs_baseline is an estimate of the reference PyTorch
pipeline on a V100-class GPU: 5000 Python-loop iterations, each with two
victim forwards (one per-instance no-grad eval loop + one grad pass), a
backward, and ~6 CUDA kNN calls at batch 18 — ~30 ms/step measured scale,
i.e. 18 attacks / (5000 * 0.030 s) ~= 0.12 attacks/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_ATTACKS_PER_SEC = 0.12  # estimated reference GPU throughput (above)
FULL_BUDGET_STEPS = 10 * 500  # reference default binary x iter budget
MEASURE_STEPS = int(os.environ.get("GEOA3_BENCH_STEPS", 250))
BATCH = int(os.environ.get("GEOA3_BENCH_BATCH", 32))


def _traced_ms_per_step(fn, args):
    """On-device ms/inner-step from a jax.profiler trace (longest X event =
    the attack module's device execution). None if the trace is unusable."""
    import glob
    import gzip
    import shutil
    import tempfile

    logdir = tempfile.mkdtemp(prefix="geoa3_bench_trace")
    try:
        with jax.profiler.trace(logdir):
            res = fn(*args)
            np.asarray(res.best_attack)  # real fetch inside the trace
        paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
        if not paths:
            return None
        with gzip.open(paths[0], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        # only DEVICE-track events count: the in-trace host fetch (~2.4 s)
        # would otherwise win the max and silently replace the module time
        dev_pids = {
            ev.get("pid")
            for ev in events
            if ev.get("ph") == "M"
            and ev.get("name") == "process_name"
            and "device:" in str(ev.get("args", {}).get("name", ""))
        }
        top = max(
            (
                ev.get("dur", 0)
                for ev in events
                if ev.get("ph") == "X" and ev.get("pid") in dev_pids
            ),
            default=0,
        )
        return (top / 1e3) / MEASURE_STEPS if top > 0 else None
    except Exception:
        return None
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def main() -> None:
    from geoa3_tpu.attack import AttackConfig
    from geoa3_tpu.attack.engine import make_attack_fn
    from geoa3_tpu.data.synthetic import sample_shape
    from geoa3_tpu.models.registry import build_model, make_eval_fn

    n = 1024
    model = build_model("PointNet", classes=40, npoint=n)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, n, 3)), train=False
    )
    logits_fn = make_eval_fn(model, variables)

    rng = np.random.RandomState(0)
    clouds, normals = [], []
    for i in range(BATCH):
        p, m = sample_shape(i % 10, n, rng)
        clouds.append(p)
        normals.append(m)
    pc = jnp.asarray(np.stack(clouds))
    nrm = jnp.asarray(np.stack(normals))
    gt = jnp.asarray(rng.randint(0, 40, BATCH))

    cfg = AttackConfig(
        attack_label="Untarget",
        classes=40,
        npoint=n,
        binary_max_steps=1,
        iter_max_steps=MEASURE_STEPS,
        cls_loss_type="CE",
        dis_loss_type="CD",
        dis_loss_weight=1.0,
        hd_loss_weight=0.1,
        curv_loss_weight=1.0,
        curv_loss_knn=16,
    )
    fn = jax.jit(make_attack_fn(logits_fn, cfg))
    # fresh keys: the relay memoizes identical (program, input) calls
    k0, k1 = jax.random.split(jax.random.PRNGKey(time.time_ns() % (2**31)))

    t0 = time.time()
    res = fn(pc, nrm, gt, gt, k0)
    np.asarray(res.best_attack)  # real host fetch (block_until_ready lies)
    compile_s = time.time() - t0

    t0 = time.time()
    ms_per_step = _traced_ms_per_step(fn, (pc, nrm, gt, gt, k1))
    run_s = time.time() - t0
    if ms_per_step is None:  # no trace available: fall back to wall-clock
        ms_per_step = run_s / MEASURE_STEPS * 1000
    attacks_per_sec = BATCH / (ms_per_step / 1000 * FULL_BUDGET_STEPS)

    print(
        f"# batch={BATCH} n={n} steps={MEASURE_STEPS} "
        f"compile={compile_s:.1f}s step={ms_per_step:.2f}ms "
        f"(full 5000-step budget)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "attacks_per_sec_per_chip",
                "value": round(attacks_per_sec, 4),
                "unit": "attacks/s (1024-pt PointNet, full GeoA3 budget)",
                "vs_baseline": round(attacks_per_sec / BASELINE_ATTACKS_PER_SEC, 2),
                # the reference publishes no throughput numbers; the 0.12
                # attacks/s denominator is a V100-class estimate (see module
                # docstring), so vs_baseline is NOT a measured comparison
                "baseline_is_estimate": True,
            }
        )
    )


if __name__ == "__main__":
    main()
