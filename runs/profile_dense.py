"""Profile the dense-cloud (subsample-opt) attack step on the real TPU:
per-step time + top ops by accumulated self-time from a jax.profiler trace.

Env: N (cloud size, 10000), B (batch, 4), STEPS (50).
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from runs.bench_dense import FULL_BUDGET  # noqa: E402
import bench  # noqa: E402
from geoa3_tpu.attack import AttackConfig  # noqa: E402
from geoa3_tpu.attack.engine import make_attack_fn  # noqa: E402
from geoa3_tpu.data.synthetic import sample_shape  # noqa: E402
from geoa3_tpu.models.registry import build_model, make_eval_fn  # noqa: E402

N = int(os.environ.get("N", 10000))
B = int(os.environ.get("B", 4))
STEPS = int(os.environ.get("STEPS", 50))

model = build_model("PointNet", classes=40, npoint=1024)
variables = model.init(
    {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1024, 3)), train=False
)
logits_fn = make_eval_fn(model, variables)
rng = np.random.RandomState(1)
clouds, normals = [], []
for i in range(B):
    p, m = sample_shape(i % 10, N, rng)
    clouds.append(p)
    normals.append(m)
pc = jnp.asarray(np.stack(clouds))
nrm = jnp.asarray(np.stack(normals))
gt = jnp.asarray(rng.randint(0, 40, B))

cfg = AttackConfig(
    attack_label="Untarget", classes=40, npoint=1024,
    binary_max_steps=1, iter_max_steps=STEPS,
    cls_loss_type="CE", dis_loss_type="CD", hd_loss_weight=0.1,
    curv_loss_weight=1.0, curv_loss_knn=16,
    is_subsample_opt=True, eval_num=1,
)
fn = jax.jit(make_attack_fn(logits_fn, cfg))

base = jax.random.PRNGKey(time.time_ns() % (2**31))
k0, k1 = jax.random.split(base)
t0 = time.time()
res = fn(pc, nrm, gt, gt, k0)
np.asarray(res.best_attack)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)

logdir = "/tmp/dense_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    res = fn(pc, nrm, gt, gt, k1)
    np.asarray(res.best_attack)

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, "no trace written"
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)
events = tr.get("traceEvents", [])
device_pids = {
    e["pid"] for e in events
    if e.get("ph") == "M" and e.get("name") == "process_name"
    and "device:" in str(e.get("args", {}).get("name", ""))
}
acc = defaultdict(float)
total = 0.0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in device_pids:
        name = e.get("name", "?")
        acc[name] += e.get("dur", 0.0)
        total += e.get("dur", 0.0)
print(f"device total {total/1000:.1f} ms over {STEPS} steps "
      f"({total/1000/STEPS:.3f} ms/step)")
for name, us in sorted(acc.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{us/1000/STEPS:8.3f} ms/step  {100*us/total:5.1f}%  {name[:110]}")
