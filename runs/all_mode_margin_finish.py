"""Finish the integrated All-mode protocol run (GeoA3_6): the CE main pass
completed 42/42 and saved its successes, but the wrapper killed the process
during the margin-retry pass (the liveness contract is fixed for future
runs). This script performs the identical Margin second pass standalone:
failing (instance, target) pairs from the Mat dir -> Margin attack (host
binary loop, same padded batch program) -> f32 re-eval gate -> save through
the same IO helpers -> final recount + attack_result.txt + metrics.
"""
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
from geoa3_tpu.data import io as gio
from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES
from geoa3_tpu.models.registry import build_model, make_eval_fn
from geoa3_tpu.utils.checkpoint import load_victim_variables

SAVED_DIR = (
    "Exps/PointNet_npoint1024/All/GeoA3_6_BiStep10_IterStep500_Optadam_"
    "Lr0.01_Initcons10_CE_CDLoss1.0_HDLoss0.1_CurLoss1.0_k16"
)
MAT_DIR = os.path.join(SAVED_DIR, "Mat")
N = 1024
B = 54

d = sio.loadmat("Data/modelnet10_250instances1024_PointNet.mat")
data = d["data"].transpose(0, 2, 1).astype(np.float32)
normal = d["normal"].transpose(0, 2, 1).astype(np.float32)
label = d["label"].reshape(-1).astype(np.int64)

pat = re.compile(r"adv_(\d+)_gt\d+_attack\d+_expect(\d+)\.mat")
succ = {
    (int(m.group(1)), int(m.group(2)))
    for f in os.listdir(MAT_DIR)
    if (m := pat.match(f))
}
pairs = [
    (i, t)
    for i in range(data.shape[0])
    for t in [c for c in TEN_LABEL_INDEXES if c != label[i]]
    if (i, t) not in succ
]
total = data.shape[0] * 9
print(f"{len(pairs)} failing of {total}; CE successes {len(succ)}", flush=True)

model = build_model("PointNet", 40, N)
variables = load_victim_variables("Pretrained/PointNet/1024", arch="PointNet")
logits_fn = jax.jit(make_eval_fn(model, variables))

cfg = AttackConfig(
    attack_label="All", classes=40, npoint=N, cls_loss_type="Margin",
    binary_max_steps=10, iter_max_steps=500,
    dis_loss_type="CD", dis_loss_weight=1.0, hd_loss_weight=0.1,
    curv_loss_weight=1.0, curv_loss_knn=16,
)
fn = make_attack_fn(logits_fn, cfg, host_binary_loop=True)

closed = 0
t0 = time.time()
for s in range(0, len(pairs), B):
    chunk = pairs[s : s + B]
    nb = len(chunk)
    pad = B - nb
    fpc = np.stack([data[i] for i, _ in chunk] + [data[0]] * pad)
    fnrm = np.stack([normal[i] for i, _ in chunk] + [normal[0]] * pad)
    fgt = np.asarray([label[i] for i, _ in chunk] + [0] * pad)
    ftg = np.asarray([t for _, t in chunk] + [1] * pad)
    for attempt in range(3):
        try:
            res = fn(
                jnp.asarray(fpc), jnp.asarray(fnrm), jnp.asarray(fgt),
                jnp.asarray(ftg), jax.random.PRNGKey(int(time.time()) + s),
            )
            adv = np.asarray(res.best_attack)
            ok = np.asarray(res.success)
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"[warn] batch failed ({e}); retry {attempt + 1}/3",
                  flush=True)
            time.sleep(30)
            jax.clear_caches()
            fn = make_attack_fn(logits_fn, cfg, host_binary_loop=True)
    pred = np.asarray(jnp.argmax(logits_fn(jnp.asarray(adv)), -1))
    for k, (i, t) in enumerate(chunk):
        if not (ok[k] and pred[k] == t):
            continue
        closed += 1
        name = gio.adversarial_mat_name(i, int(label[i]), int(pred[k]), t)
        gio.save_adversarial_mat(
            os.path.join(MAT_DIR, name + ".mat"),
            adv[k], int(label[i]), int(pred[k]),
        )
        gio.save_point_obj(
            os.path.join(SAVED_DIR, "PC", name + ".obj"), adv[k]
        )
    print(f"[{s // B + 1}/{-(-len(pairs) // B)}] closed {closed} "
          f"({time.time() - t0:.0f}s)", flush=True)

num_success = len({
    (int(m.group(1)), int(m.group(2)))
    for f in os.listdir(MAT_DIR)
    if (m := pat.match(f))
})
rate = num_success / total * 100
with open(os.path.join(SAVED_DIR, "attack_result.txt"), "at") as f:
    f.write(f"attack success: {rate:.2f}\n")
    f.write(f"margin retry closed: {closed}/{len(pairs)}\n")
print(f"FINAL: {num_success}/{total} = {rate:.2f}% "
      f"(margin closed {closed}/{len(pairs)})", flush=True)

from geoa3_tpu import data as gdata
from geoa3_tpu.cli.main_attack import _write_attack_metrics

ds = gdata.AttackSetDataset(
    "Data/modelnet10_250instances1024_PointNet.mat", attack_label="All"
)
_write_attack_metrics(SAVED_DIR, ds, rate, None)
print("DONE", flush=True)
