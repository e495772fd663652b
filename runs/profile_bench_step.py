"""Profile the bench.py PointNet attack step on the real TPU: per-step time
+ top ops by accumulated self-time from a jax.profiler trace.

Uses bench.py's exact setup (random-init victim, synthetic clouds) so the
profile matches the driver's metric of record. Env knobs: B (batch, 32),
STEPS (100), ARCH is fixed to PointNet (use profile_pnpp.py for PN++).
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

import bench

B = int(os.environ.get("B", 32))
STEPS = int(os.environ.get("STEPS", 100))

from geoa3_tpu.attack.engine import make_attack_fn

logits_fn, cfg, (pc, nrm, gt) = bench._setup(B, STEPS, 1024)
fn = jax.jit(make_attack_fn(logits_fn, cfg))

base = jax.random.PRNGKey(time.time_ns() % (2**31))
k0, k1 = jax.random.split(base)
t0 = time.time()
res = fn(pc, nrm, gt, gt, k0)
np.asarray(res.best_attack)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)

logdir = "/tmp/bench_step_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    res = fn(pc, nrm, gt, gt, k1)
    np.asarray(res.best_attack)

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, "no trace written"
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)

events = tr.get("traceEvents", [])
dev_pids = {
    ev.get("pid")
    for ev in events
    if ev.get("ph") == "M"
    and ev.get("name") == "process_name"
    and "device:" in str(ev.get("args", {}).get("name", ""))
}
by_op = defaultdict(float)
long = {}
top_ev = 0.0
for ev in events:
    if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
        continue
    cat = ev.get("args", {})
    name = ev.get("name", "")
    dur = ev.get("dur", 0) / 1e3  # ms
    top_ev = max(top_ev, dur)
    by_op[name] += dur
    if "long_name" in cat and name not in long:
        long[name] = cat["long_name"]

print(f"\nTRACE: module {top_ev:.1f} ms -> {top_ev/STEPS:.2f} ms/step "
      f"-> {B/(top_ev/1e3/STEPS*5000):.3f} attacks/s at full budget",
      flush=True)

print("\ntop 40 ops by accumulated time (ms over the whole program):")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
    ln = long.get(k, "")[:160]
    print(f"  {v:9.2f} ms  {k[:64]}   {ln}")
