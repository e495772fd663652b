"""A/B probe for the MSG success regression: attack the first 20 MSG
instances at full budget with the whole-SA fused kernel (default) vs with
it disabled (GEOA3_DISABLE_PALLAS=safused -> SA2 unfused, the round-2
path), and report success under BOTH configurations' own judges plus a
cross-check with the unfused evaluator.

Usage: python runs/msg_safused_probe.py [mode]   (mode: fused|unfused)
With no arg, runs both in subprocesses and prints the comparison.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
MODE = sys.argv[1] if len(sys.argv) > 1 else None

if MODE is None:
    out = {}
    for mode in ("fused", "unfused"):
        env = dict(os.environ)
        if mode == "unfused":
            env["GEOA3_DISABLE_PALLAS"] = "safused"
        r = subprocess.run(
            [sys.executable, __file__, mode], env=env, text=True,
            capture_output=True, timeout=3600,
        )
        print(r.stdout, r.stderr[-2000:] if r.returncode else "", flush=True)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                out[mode] = json.loads(line)
    print("COMPARISON:", json.dumps(out), flush=True)
    sys.exit(0)

os.chdir("/root/repo/runs/msg")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
import scipy.io as sio

from geoa3_tpu.attack import AttackConfig
from geoa3_tpu.attack.engine import make_attack_fn
from geoa3_tpu.models.registry import build_model, make_eval_fn
from geoa3_tpu.utils.checkpoint import load_victim_variables

B, N = 10, 1024
model = build_model("PointNetPP_MSG", 40, N)
variables = load_victim_variables("Pretrained/PointNetPP_MSG/1024",
                                  arch="PointNetPP_MSG")
logits_fn = make_eval_fn(model, variables)

d = sio.loadmat("Data/modelnet10_250instances1024_PointNetPP_MSG.mat")
data = d["data"].transpose(0, 2, 1).astype(np.float32)
normal = d["normal"].transpose(0, 2, 1).astype(np.float32)
label = d["label"].reshape(-1).astype(np.int64)

cfg = AttackConfig(
    attack_label="Untarget", classes=40, npoint=N,
    binary_max_steps=10, iter_max_steps=500,
    cls_loss_type="CE", dis_loss_type="CD", dis_loss_weight=1.0,
    hd_loss_weight=0.1, curv_loss_weight=1.0, curv_loss_knn=16,
)
fn = make_attack_fn(logits_fn, cfg, host_binary_loop=True)
rng = jax.random.PRNGKey(time.time_ns() % (2**31))
succ_total, n_total = 0, 0
advs = []
for s in range(0, 20, B):
    pc = jnp.asarray(data[s:s + B])
    nrm = jnp.asarray(normal[s:s + B])
    gt = jnp.asarray(label[s:s + B])
    rng, k = jax.random.split(rng)
    res = fn(pc, nrm, gt, gt, k)
    succ = np.asarray(res.success)
    preds = np.asarray(logits_fn(res.best_attack)).argmax(-1)
    ok = succ & (preds != np.asarray(gt))
    succ_total += int(ok.sum())
    n_total += B
    advs.append(np.asarray(res.best_attack))
    print(f"[{MODE}] {s + B}/20: {succ_total}/{n_total}", flush=True)

np.save(f"/tmp/msg_probe_adv_{MODE}.npy", np.concatenate(advs))
print(json.dumps({"mode": MODE, "success": succ_total, "n": n_total}),
      flush=True)
