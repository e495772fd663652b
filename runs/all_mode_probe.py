"""Probe the All-mode failures: collect the (instance, target) pairs the main
run could not flip, then re-attack ONLY those under stronger settings
(Margin loss / more binary-search steps) to see what closes the gap.

Usage: python runs/all_mode_probe.py <saved_mat_dir>
(defaults to the --id 2 All-mode experiment dir under runs/flagship/Exps).
"""
import json
import os
import re
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "flagship"))
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
import scipy.io as sio

from geoa3_tpu.attack import AttackConfig
from geoa3_tpu.attack.engine import make_attack_fn
from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES
from geoa3_tpu.models.registry import build_model, make_eval_fn
from geoa3_tpu.utils.checkpoint import load_victim_variables

MAT_DIR = sys.argv[1] if len(sys.argv) > 1 else (
    "Exps/PointNet_npoint1024/All/GeoA3_2_BiStep10_IterStep500_Optadam_"
    "Lr0.01_Initcons10_CE_CDLoss1.0_HDLoss0.1_CurLoss1.0_k16/Mat"
)
N = 1024

d = sio.loadmat("Data/modelnet10_250instances1024_PointNet.mat")
data = d["data"].transpose(0, 2, 1).astype(np.float32)
normal = d["normal"].transpose(0, 2, 1).astype(np.float32)
label = d["label"].reshape(-1).astype(np.int64)

# succeeded (inst, target) pairs from the saved filenames
succ = set()
pat = re.compile(r"adv_(\d+)_gt(\d+)_attack(\d+)_expect(\d+)\.mat")
for f in os.listdir(MAT_DIR):
    m = pat.match(f)
    if m:
        succ.add((int(m.group(1)), int(m.group(4))))

pairs = []  # failing (inst, target)
for i in range(data.shape[0]):
    for t in [c for c in TEN_LABEL_INDEXES if c != label[i]]:
        if (i, t) not in succ:
            pairs.append((i, t))
print(f"{len(pairs)} failing pairs of {data.shape[0] * 9}", flush=True)
if not pairs:
    sys.exit(0)

model = build_model("PointNet", 40, N)
variables = load_victim_variables("Pretrained/PointNet/1024", arch="PointNet")
logits_fn = make_eval_fn(model, variables)

B = 54  # same padded program size as the main run
pc = np.stack([data[i] for i, _ in pairs])
nrm = np.stack([normal[i] for i, _ in pairs])
gt = np.asarray([label[i] for i, _ in pairs])
tgt = np.asarray([t for _, t in pairs])
pad = (-len(pairs)) % B
if pad:
    pc = np.concatenate([pc, pc[:1].repeat(pad, 0)])
    nrm = np.concatenate([nrm, nrm[:1].repeat(pad, 0)])
    gt = np.concatenate([gt, gt[:1].repeat(pad, 0)])
    tgt = np.concatenate([tgt, tgt[:1].repeat(pad, 0)])

VARIANTS = {
    "ce_bi20": dict(cls_loss_type="CE", binary_max_steps=20),
    "margin_bi10": dict(cls_loss_type="Margin", binary_max_steps=10),
    "margin_bi20": dict(cls_loss_type="Margin", binary_max_steps=20),
}

report = {"failing_pairs": len(pairs)}
for name, kw in VARIANTS.items():
    cfg = AttackConfig(
        attack_label="All", classes=40, npoint=N, iter_max_steps=500,
        dis_loss_type="CD", dis_loss_weight=1.0, hd_loss_weight=0.1,
        curv_loss_weight=1.0, curv_loss_knn=16, **kw,
    )
    fn = make_attack_fn(logits_fn, cfg, host_binary_loop=True)
    t0 = time.time()
    n_ok = 0
    per = []
    for s in range(0, len(pc), B):
        res = fn(
            jnp.asarray(pc[s:s + B]), jnp.asarray(nrm[s:s + B]),
            jnp.asarray(gt[s:s + B]), jnp.asarray(tgt[s:s + B]),
            jax.random.PRNGKey(s + 1),
        )
        adv = np.asarray(res.best_attack)
        preds = np.asarray(jnp.argmax(logits_fn(jnp.asarray(adv)), -1))
        ok = preds == tgt[s:s + B]
        lim = min(B, len(pairs) - s)
        n_ok += int(ok[:lim].sum())
        per.extend(ok[:lim].tolist())
    rate = n_ok / len(pairs) * 100
    report[name] = {
        "closed": n_ok, "rate_on_failures": rate,
        "time_s": round(time.time() - t0, 1),
    }
    print(f"{name}: closed {n_ok}/{len(pairs)} ({rate:.1f}%) "
          f"in {report[name]['time_s']}s", flush=True)

with open("/root/repo/runs/artifacts/all_mode_probe.json", "w") as f:
    json.dump(report, f, indent=2)
print("PROBE DONE", flush=True)
