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
_d = os.path.join(os.path.dirname(os.path.abspath(__file__)), _DIR[_ARCH])
os.makedirs(_d, exist_ok=True)
os.chdir(_d)
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
try:
    variables = load_victim_variables(f"Pretrained/{ARCH}/1024", arch=ARCH)
except Exception:
    # per-step time is weight-independent (same program/shapes): random
    # init when the e2e workspace has not been rebuilt this round
    print("no checkpoint — random-init victim (timing-only)", flush=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, N, 3)), train=False
    )
logits_fn = make_eval_fn(
    model, variables, dtype=jnp.bfloat16 if DTYPE == "bf16" else None
)
# bf16 mode mirrors the CLI: grad pass bf16, success eval f32 (an attack
# judged by the bf16 victim fails the f32 one on ~half the instances)
eval_fn = make_eval_fn(model, variables) if DTYPE == "bf16" else None

try:
    import scipy.io as sio

    d = sio.loadmat(f"Data/modelnet10_250instances1024_{ARCH}.mat")
    pc = jnp.asarray(d["data"][:B].transpose(0, 2, 1))
    nrm = jnp.asarray(d["normal"][:B].transpose(0, 2, 1))
    gt = jnp.asarray(d["label"][:B].reshape(-1))
except Exception:
    from geoa3_tpu.data.synthetic import sample_shape

    r = np.random.RandomState(0)
    cl, ns = zip(*(sample_shape(i % 10, N, r) for i in range(B)))
    pc, nrm = jnp.asarray(np.stack(cl)), jnp.asarray(np.stack(ns))
    gt = jnp.asarray(r.randint(0, 40, B))

cfg = AttackConfig(
    attack_label="Untarget", classes=40, npoint=N,
    binary_max_steps=1, iter_max_steps=STEPS,
    cls_loss_type="CE", dis_loss_type="CD", dis_loss_weight=1.0,
    hd_loss_weight=0.1, curv_loss_weight=1.0, curv_loss_knn=16,
    curv_knn_refresh_every=int(os.environ.get("REFRESH", 1)),
)
fn = jax.jit(make_attack_fn(logits_fn, cfg, eval_logits_fn=eval_fn))
# fresh keys every invocation: the axon relay memoizes repeated identical
# (program, input) calls ACROSS processes, so fixed seeds return cached
# results in ~0 ms on reruns of this script
base = jax.random.PRNGKey(time.time_ns() % (2**31))
k0, k1, k2 = jax.random.split(base, 3)
t0 = time.time()
res = fn(pc, nrm, gt, gt, k0)
jax.block_until_ready(res.best_attack)
print(f"compile+run {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
res = fn(pc, nrm, gt, gt, k1)
# block_until_ready can return early on this backend; a real host fetch is
# the only trustworthy barrier — but it adds ~2.4 s relay overhead, so the
# authoritative per-step number comes from the TRACE below, not this.
np.asarray(res.best_attack)
dt = time.time() - t0
print(f"wall (incl. fetch): B={B} steps={STEPS}: {dt*1000/STEPS:.2f} ms/step",
      flush=True)

# ---- trace ----
logdir = "/tmp/pnpp_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    res = fn(pc, nrm, gt, gt, k2)
    jax.block_until_ready(res.best_attack)

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
    # only device-track events: a host-side event (e.g. a fetch) must not
    # win the max or pollute the op table
    if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
        continue
    cat = ev.get("args", {})
    name = ev.get("name", "")
    dur = ev.get("dur", 0) / 1e3  # ms
    top_ev = max(top_ev, dur)
    by_op[name] += dur
    if "long_name" in cat and name not in long:
        long[name] = cat["long_name"]

# the longest single event is the whole jitted attack module on the device
# track — the authoritative on-device time (host wall-clock is unusable on
# the relay: block_until_ready returns early, fetches cost ~2.4 s)
print(f"\nTRACE: module {top_ev:.1f} ms -> {top_ev/STEPS:.2f} ms/step "
      f"-> {B/(top_ev/1e3/STEPS*5000):.3f} attacks/s at full budget",
      flush=True)

print("\ntop 30 ops by accumulated time (ms over the whole program):")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
    ln = long.get(k, "")[:160]
    print(f"  {v:9.2f} ms  {k[:60]}   {ln}")
