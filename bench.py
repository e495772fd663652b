"""Benchmark: GeoA3 attack throughput on one TPU chip (and over a mesh).

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

Mesh mode (`python bench.py --mesh N`): shard an N-x-larger batch of the
same attack program over an N-chip ('data') mesh via
parallel.make_sharded_attack_fn, measure the sharded per-step time from the
device trace, and report total attacks/s plus scaling efficiency vs the
single-chip run at the same per-chip batch. With fewer than N real chips the
run re-execs itself on a virtual N-device CPU mesh (harness smoke only —
the JSON is then labelled "virtual": true and proves the sharded program
compiles and executes, not ICI performance).
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
NPOINT = int(os.environ.get("GEOA3_BENCH_NPOINT", 1024))


def _traced_ms_per_step(fn, args, steps):
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
        return (top / 1e3) / steps if top > 0 else None
    except Exception:
        return None
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def _setup(batch, steps, npoint, refresh=None):
    """Victim + attack config + a synthetic measurement batch.

    refresh=None picks the attack CLI's K=10 lazy-refresh default (largest
    divisor of `steps` <= 10); refresh=1 is exact per-step reference
    semantics (engine deviation #7 off)."""
    from geoa3_tpu.attack import AttackConfig
    from geoa3_tpu.data.synthetic import sample_shape
    from geoa3_tpu.models.registry import build_model, make_eval_fn

    model = build_model("PointNet", classes=40, npoint=npoint)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, npoint, 3)),
        train=False,
    )
    logits_fn = make_eval_fn(model, variables)

    rng = np.random.RandomState(0)
    clouds, normals = [], []
    for i in range(batch):
        p, m = sample_shape(i % 10, npoint, rng)
        clouds.append(p)
        normals.append(m)
    pc = jnp.asarray(np.stack(clouds))
    nrm = jnp.asarray(np.stack(normals))
    gt = jnp.asarray(rng.randint(0, 40, batch))

    cfg = AttackConfig(
        attack_label="Untarget",
        classes=40,
        npoint=npoint,
        binary_max_steps=1,
        iter_max_steps=steps,
        cls_loss_type="CE",
        dis_loss_type="CD",
        dis_loss_weight=1.0,
        hd_loss_weight=0.1,
        curv_loss_weight=1.0,
        curv_loss_knn=16,
        # the attack CLI's default lazy curvature refresh (engine deviation
        # #7, e2e-recertified on all three victims): the bench measures the
        # config a user actually runs. Largest divisor <= 10 so any
        # GEOA3_BENCH_STEPS keeps compiling.
        curv_knn_refresh_every=(
            refresh
            if refresh is not None
            else max(d for d in range(1, 11) if steps % d == 0)
        ),
    )
    return logits_fn, cfg, (pc, nrm, gt)


def _measure(fn, args, steps):
    """(compile_s, ms_per_step) for a compiled attack fn, trace-timed."""
    # fresh keys: the relay memoizes identical (program, input) calls
    k0, k1 = jax.random.split(jax.random.PRNGKey(time.time_ns() % (2**31)))
    t0 = time.time()
    res = fn(*args, k0)
    np.asarray(res.best_attack)  # real host fetch (block_until_ready lies)
    compile_s = time.time() - t0
    t0 = time.time()
    ms = _traced_ms_per_step(fn, (*args, k1), steps)
    if ms is None:  # no trace available: fall back to wall-clock
        ms = (time.time() - t0) / steps * 1000
    return compile_s, ms


def run_single(batch=None, steps=None, npoint=None) -> dict:
    """Single-chip headline measurement (the driver's metric)."""
    from geoa3_tpu.attack.engine import make_attack_fn

    batch = batch or BATCH
    steps = steps or MEASURE_STEPS
    npoint = npoint or NPOINT
    logits_fn, cfg, (pc, nrm, gt) = _setup(batch, steps, npoint)
    fn = jax.jit(make_attack_fn(logits_fn, cfg))
    compile_s, ms_per_step = _measure(fn, (pc, nrm, gt, gt), steps)
    attacks_per_sec = batch / (ms_per_step / 1000 * FULL_BUDGET_STEPS)
    print(
        f"# batch={batch} n={npoint} steps={steps} "
        f"compile={compile_s:.1f}s step={ms_per_step:.2f}ms "
        f"(full 5000-step budget)",
        file=sys.stderr,
    )
    out = {
        "metric": "attacks_per_sec_per_chip",
        "value": round(attacks_per_sec, 4),
        "unit": "attacks/s (1024-pt PointNet, full GeoA3 budget)",
        "step_ms": round(ms_per_step, 3),
        # the defensible perf claim: analytic model FLOPs (victim fwd+bwd +
        # loss-geometry matmuls, utils/flops.py conventions) over the chip's
        # bf16 peak. vs_baseline is a footnote — the reference publishes no
        # throughput numbers and its 0.12 attacks/s denominator is a
        # V100-class ESTIMATE (module docstring), not a measurement.
        "vs_baseline": round(attacks_per_sec / BASELINE_ATTACKS_PER_SEC, 2),
        "baseline_is_estimate": True,
        # tracked because remote cold-compiles are a known platform cost
        # (20-500 s; a miss outweighs attacking a whole batch) — a jump
        # here flags a compilation-cache miss or a toolchain change
        "compile_s": round(compile_s, 1),
    }
    from geoa3_tpu.utils.flops import mfu

    stats = mfu(ms_per_step, batch, npoint, k=16)
    if stats:
        out.update(stats)

    # exact-reference-semantics probe (engine deviations #6 AND #7 off:
    # per-step curvature re-selection + exact nn1 argmins), short trace in
    # the same run — the headline measures the CLI's recertified deviated
    # default, and this key keeps the exact number beside it so cross-round
    # comparisons can never silently mix semantics. GEOA3_BENCH_EXACT=0
    # skips it (e.g. inner sweeps).
    if os.environ.get("GEOA3_BENCH_EXACT", "1") != "0":
        exact_steps = min(steps, 50)
        prev = os.environ.get("GEOA3_NN1_SELECT")
        os.environ["GEOA3_NN1_SELECT"] = "exact"
        try:
            lf_e, cfg_e, (pc_e, nrm_e, gt_e) = _setup(
                batch, exact_steps, npoint, refresh=1
            )
            fn_e = jax.jit(make_attack_fn(lf_e, cfg_e))
            compile_e, ms_exact = _measure(
                fn_e, (pc_e, nrm_e, gt_e, gt_e), exact_steps
            )
        finally:
            if prev is None:
                os.environ.pop("GEOA3_NN1_SELECT", None)
            else:
                os.environ["GEOA3_NN1_SELECT"] = prev
        print(
            f"# exact-semantics probe: step={ms_exact:.2f}ms "
            f"(compile={compile_e:.1f}s, {exact_steps} steps)",
            file=sys.stderr,
        )
        out["step_ms_exact"] = round(ms_exact, 3)
        out["attacks_per_sec_exact"] = round(
            batch / (ms_exact / 1000 * FULL_BUDGET_STEPS), 4
        )
        out["exact_compile_s"] = round(compile_e, 1)
    return out


def run_mesh(mesh_n, batch_per_chip=None, steps=None, npoint=None) -> dict:
    """N-chip scaling measurement: same attack program, batch x N, sharded
    over the 'data' axis. Reports total attacks/s + scaling efficiency
    (per-step time single-chip / per-step time sharded, same per-chip batch).
    """
    from geoa3_tpu import parallel

    batch_per_chip = batch_per_chip or BATCH
    steps = steps or MEASURE_STEPS
    npoint = npoint or NPOINT
    devices = jax.devices()
    assert len(devices) >= mesh_n, (
        f"need {mesh_n} devices, have {len(devices)} — run via main() for "
        "the virtual-mesh re-exec"
    )
    virtual = devices[0].platform == "cpu"
    mesh = parallel.make_mesh(n_data=mesh_n, n_model=1, devices=devices[:mesh_n])

    # single-chip anchor at the same per-chip batch (on device 0)
    from geoa3_tpu.attack.engine import make_attack_fn

    logits_fn, cfg, (pc1, nrm1, gt1) = _setup(batch_per_chip, steps, npoint)
    fn1 = jax.jit(make_attack_fn(logits_fn, cfg))
    _, ms_single = _measure(fn1, (pc1, nrm1, gt1, gt1), steps)

    # sharded run: N x the batch over the mesh
    total_b = batch_per_chip * mesh_n
    logits_fn, cfg, argsN = _setup(total_b, steps, npoint)
    fnN = parallel.make_sharded_attack_fn(logits_fn, cfg, mesh)
    pc, nrm, gt = parallel.shard_batch(mesh, *argsN)
    compile_s, ms_mesh = _measure(fnN, (pc, nrm, gt, gt), steps)

    efficiency = ms_single / ms_mesh if ms_mesh > 0 else 0.0
    # work efficiency: the sharded program's TOTAL device time vs N copies
    # of the single program. On real chips scaling_efficiency ~ this (each
    # chip runs in parallel); on the virtual CPU mesh (devices share host
    # cores — this machine has ONE) wall scaling is meaningless but work
    # efficiency still catches collective regressions that inflate the
    # sharded program's total work (e.g. an accidental full-batch
    # all-gather per step).
    work_efficiency = (
        ms_single * mesh_n / ms_mesh if ms_mesh > 0 else 0.0
    )
    attacks_per_sec = total_b / (ms_mesh / 1000 * FULL_BUDGET_STEPS)
    print(
        f"# mesh={mesh_n} per-chip batch={batch_per_chip} n={npoint} "
        f"steps={steps} compile={compile_s:.1f}s single={ms_single:.2f}ms "
        f"sharded={ms_mesh:.2f}ms eff={efficiency:.2%} virtual={virtual}",
        file=sys.stderr,
    )
    out = {
        "metric": "attacks_per_sec_scaling",
        "value": round(attacks_per_sec, 4),
        "unit": f"attacks/s total ({mesh_n}-chip data-parallel, "
                f"{npoint}-pt PointNet, full GeoA3 budget)",
        "mesh": mesh_n,
        "attacks_per_sec_per_chip": round(attacks_per_sec / mesh_n, 4),
        "scaling_efficiency": round(efficiency, 4),
        "work_efficiency": round(work_efficiency, 4),
        "vs_baseline": round(attacks_per_sec / BASELINE_ATTACKS_PER_SEC, 2),
        "baseline_is_estimate": True,
        "virtual": virtual,
    }
    if not virtual:
        from geoa3_tpu.utils.flops import mfu

        # per-chip MFU of the sharded program (data-parallel: each chip
        # runs batch_per_chip instances of the same step)
        stats = mfu(ms_mesh, batch_per_chip, npoint, k=16)
        if stats:
            out.update(stats)
    return out


def main() -> None:
    if "--mesh" in sys.argv:
        mesh_n = int(sys.argv[sys.argv.index("--mesh") + 1])
        if len(jax.devices()) < mesh_n:
            # not enough real chips: re-exec on a virtual CPU mesh (the
            # jax.config update must happen pre-backend-use in the child;
            # env vars alone don't defeat the axon sitecustomize)
            import subprocess

            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={mesh_n}"
            ).strip()
            env["JAX_PLATFORMS"] = "cpu"
            env.setdefault("GEOA3_BENCH_STEPS", "4")
            env.setdefault("GEOA3_BENCH_BATCH", "4")
            env.setdefault("GEOA3_BENCH_NPOINT", "64")
            child = (
                "import jax; jax.config.update('jax_platforms', 'cpu'); "
                "import sys; sys.argv = ['bench.py', '--mesh', "
                f"'{mesh_n}']; "
                "import bench; bench.main()"
            )
            proc = subprocess.run(
                [sys.executable, "-c", child],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env=env, text=True, timeout=1800,
            )
            sys.exit(proc.returncode)
        print(json.dumps(run_mesh(mesh_n)))
        return
    print(json.dumps(run_single()))


if __name__ == "__main__":
    main()
