"""Row-block sweep for the dual-1NN payload kernel on the real TPU at the
attack shape (b=32, n=m=1024, 8 payload planes), trace-timed."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from geoa3_tpu.ops.pallas.nn1_kernel import nn1_dual_payload_pallas

b, n = 32, 1024
rng = np.random.RandomState(int(time.time()) % 99999)
ori = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.5)
pay = jnp.asarray(rng.randn(b, 8, n).astype(np.float32))


def traced_ms(fn, *args):
    logdir = f"/tmp/nn1_rb_trace_{time.time_ns()}"
    with jax.profiler.trace(logdir):
        out = fn(*args)
        np.asarray(out[0])
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    dev = {
        ev.get("pid")
        for ev in events
        if ev.get("ph") == "M" and ev.get("name") == "process_name"
        and "device:" in str(ev.get("args", {}).get("name", ""))
    }
    os.system(f"rm -rf {logdir}")
    return max(
        (ev.get("dur", 0) for ev in events
         if ev.get("ph") == "X" and ev.get("pid") in dev),
        default=0,
    ) / 1e3


for rb in (128, 256, 512, 1024):
    f = jax.jit(lambda a, rb=rb: nn1_dual_payload_pallas(a, ori, pay, row_block=rb))
    adv = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.5)
    out = f(adv)
    np.asarray(out[0])
    adv2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.5)
    ms = traced_ms(f, adv2)
    print(f"row_block={rb:5d}: module {ms:.3f} ms", flush=True)
