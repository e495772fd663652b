"""Profile the PN++ (config 4) attack step on the real TPU: per-step time +
top ops by self-time from a jax.profiler trace."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

_ARCH = os.environ.get("ARCH", "PointNetPP")
_DIR = {"PointNetPP_MSG": "msg", "PointNetPP": "pnpp", "PointNet": "flagship"}
os.chdir(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), _DIR[_ARCH],
))
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from geoa3_tpu.attack import AttackConfig
from geoa3_tpu.attack.engine import make_attack_fn
from geoa3_tpu.models.registry import build_model, make_eval_fn
from geoa3_tpu.utils.checkpoint import load_victim_variables

B = int(os.environ.get("B", 16))
STEPS = int(os.environ.get("STEPS", 100))
ARCH = os.environ.get("ARCH", "PointNetPP")
DTYPE = os.environ.get("DTYPE", "")  # "bf16" -> bf16 victim
N = 1024

model = build_model(ARCH, 40, N)
variables = load_victim_variables(f"Pretrained/{ARCH}/1024", arch=ARCH)
logits_fn = make_eval_fn(
    model, variables, dtype=jnp.bfloat16 if DTYPE == "bf16" else None
)

import scipy.io as sio

d = sio.loadmat(f"Data/modelnet10_250instances1024_{ARCH}.mat")
pc = jnp.asarray(d["data"][:B].transpose(0, 2, 1))
nrm = jnp.asarray(d["normal"][:B].transpose(0, 2, 1))
gt = jnp.asarray(d["label"][:B].reshape(-1))

cfg = AttackConfig(
    attack_label="Untarget", classes=40, npoint=N,
    binary_max_steps=1, iter_max_steps=STEPS,
    cls_loss_type="CE", dis_loss_type="CD", dis_loss_weight=1.0,
    hd_loss_weight=0.1, curv_loss_weight=1.0, curv_loss_knn=16,
    curv_knn_refresh_every=int(os.environ.get("REFRESH", 1)),
)
fn = jax.jit(make_attack_fn(logits_fn, cfg))
t0 = time.time()
res = fn(pc, nrm, gt, gt, jax.random.PRNGKey(0))
jax.block_until_ready(res.best_attack)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
res = fn(pc, nrm, gt, gt, jax.random.PRNGKey(1))
jax.block_until_ready(res.best_attack)
dt = time.time() - t0
print(f"B={B} steps={STEPS}: {dt*1000/STEPS:.2f} ms/step "
      f"-> {B/(dt/STEPS*5000):.3f} attacks/s at full budget", flush=True)

# ---- trace ----
logdir = "/tmp/pnpp_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    res = fn(pc, nrm, gt, gt, jax.random.PRNGKey(2))
    jax.block_until_ready(res.best_attack)

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
assert paths, "no trace written"
with gzip.open(paths[0], "rt") as f:
    tr = json.load(f)

by_op = defaultdict(float)
long = {}
for ev in tr.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    cat = ev.get("args", {})
    name = ev.get("name", "")
    dur = ev.get("dur", 0) / 1e3  # ms
    by_op[name] += dur
    if "long_name" in cat and name not in long:
        long[name] = cat["long_name"]

print("\ntop 30 ops by accumulated time (ms over the whole program):")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
    ln = long.get(k, "")[:160]
    print(f"  {v:9.2f} ms  {k[:60]}   {ln}")
