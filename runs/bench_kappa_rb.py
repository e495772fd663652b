"""Row-block sweep for the kappa kernel on the real TPU: trace-timed
fwd+bwd module time per (row_block) at the attack shape b=32, n=1024, k=16.
"""
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

from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

b, n, k = 32, 1024, 16
rng = np.random.RandomState(int(time.time()) % 99999)
nrm = rng.randn(b, n, 3).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
nrm = jnp.asarray(nrm)
w = jnp.asarray(rng.randn(b, n).astype(np.float32))


def traced_ms(fn, *args):
    logdir = f"/tmp/kappa_rb_trace_{time.time_ns()}"
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
    def loss(c, rb=rb):
        kap = kappa_pallas(c, nrm, k, rb)
        return jnp.sum(kap * w)

    f = jax.jit(jax.value_and_grad(loss))
    cloud = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.5)
    v, g = f(cloud)  # compile
    np.asarray(v)
    cloud2 = jnp.asarray(rng.randn(b, n, 3).astype(np.float32) * 0.5)
    ms = traced_ms(f, cloud2)
    print(f"row_block={rb:5d}: fwd+bwd module {ms:.3f} ms", flush=True)
