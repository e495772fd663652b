"""Escalation ladder over the id-6 All-mode artifact's remaining failures.

Round-2 left the integrated protocol at 2176/2250 = 96.71% (CE pass +
Margin-bi10 retry). runs/margin_gap_analysis.py reconciled the probe gap
(different residual sets; the integrated artifact is NOT underperforming).
This script runs the next rung of the reference ladder
(main_attack.py:164-194 semantics — same attack, stronger search) on the
74 still-failing pairs:

  rung 1: Margin, binary_max_steps=20, iter 500  (probe: 51.7% on the
          EASIER id-2 residuals; expect less on this hard core)
  rung 2: Margin, bi20, initial_const warm-started high (100) — for pairs
          where even const=10's upper bound never flips the victim

Successes are saved into the SAME id-6 experiment dir with the standard
per-instance .mat/.obj contract, then the artifact is recounted from the
Mat dir (the authoritative basis). Pairs still failing get a per-pair
victim-resistance record (target logit rank & margin at the best iterate)
-> runs/artifacts/escalation_report.json, proving or disproving the
synthetic-victim-ceiling hypothesis for whatever remains.
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
from geoa3_tpu.data import io as gio
from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES
from geoa3_tpu.models.registry import build_model, make_eval_fn
from geoa3_tpu.utils.checkpoint import load_victim_variables

EXP = (
    "Exps/PointNet_npoint1024/All/GeoA3_6_BiStep10_IterStep500_Optadam_"
    "Lr0.01_Initcons10_CE_CDLoss1.0_HDLoss0.1_CurLoss1.0_k16"
)
N = 1024
PAT = re.compile(r"adv_(\d+)_gt(\d+)_attack(\d+)_expect(\d+)\.mat")

d = sio.loadmat("Data/modelnet10_250instances1024_PointNet.mat")
data = d["data"].transpose(0, 2, 1).astype(np.float32)
normal = d["normal"].transpose(0, 2, 1).astype(np.float32)
label = d["label"].reshape(-1).astype(np.int64)

closed = set()
for f in os.listdir(os.path.join(EXP, "Mat")):
    m = PAT.match(f)
    if m:
        closed.add((int(m.group(1)), int(m.group(4))))
pairs = [
    (i, t)
    for i in range(data.shape[0])
    for t in TEN_LABEL_INDEXES
    if t != label[i] and (i, t) not in closed
]
print(f"{len(pairs)} failing pairs of {data.shape[0] * 9}", flush=True)
if not pairs:
    sys.exit(0)

model = build_model("PointNet", 40, N)
variables = load_victim_variables("Pretrained/PointNet/1024", arch="PointNet")
logits_fn = make_eval_fn(model, variables)

RUNGS = [
    ("margin_bi20", dict(cls_loss_type="Margin", binary_max_steps=20,
                         initial_const=10.0)),
    ("margin_bi20_c100", dict(cls_loss_type="Margin", binary_max_steps=20,
                              initial_const=100.0)),
    # ---- round-5 heavy rungs: the reference's remaining attack machinery,
    # never previously tried on the survivors (VERDICT r04 next-round #4) --
    # pro-grad projection of the offset onto the ori tangent planes
    # (reference geoA3_attack.py:341-352)
    ("margin_bi20_prograd", dict(cls_loss_type="Margin", binary_max_steps=20,
                                 initial_const=10.0, is_pro_grad=True)),
    # tangent-plane jitter refreshed every 50 steps (reference :312-317)
    ("margin_bi20_jitter", dict(cls_loss_type="Margin", binary_max_steps=20,
                                initial_const=10.0,
                                is_pre_jitter_input=True)),
    # partial-var patch re-selection (reference :239-262) at the reference
    # default patch size and a wider patch
    ("margin_bi10_partialvar_k3", dict(cls_loss_type="Margin",
                                       binary_max_steps=10,
                                       initial_const=10.0,
                                       is_partial_var=True, knn_range=3)),
    ("margin_bi10_partialvar_k64", dict(cls_loss_type="Margin",
                                        binary_max_steps=10,
                                        initial_const=10.0,
                                        is_partial_var=True, knn_range=64)),
]
B = 54
report = {"initial_failures": len(pairs), "rungs": {}}
rng = jax.random.PRNGKey(int(time.time()) % (2**31))

for rung_name, kw in RUNGS:
    if not pairs:
        break
    cfg = AttackConfig(
        attack_label="All", classes=40, npoint=N, iter_max_steps=500,
        dis_loss_type="CD", dis_loss_weight=1.0, hd_loss_weight=0.1,
        curv_loss_weight=1.0, curv_loss_knn=16, **kw,
    )
    if kw.get("is_partial_var"):
        # partial-var runs as ONE fused scan^2 program (the host-loop entry
        # routes it around the per-search-step jit); at ~4 ms/step x
        # bi10 x 500 the device program stays ~20 s, inside worker limits
        fn = jax.jit(make_attack_fn(logits_fn, cfg))
    else:
        fn = make_attack_fn(logits_fn, cfg, host_binary_loop=True)
    t0 = time.time()
    still_failing = []
    n_ok = 0
    for s in range(0, len(pairs), B):
        chunk = pairs[s : s + B]
        nb = len(chunk)
        idx = [i for i, _ in chunk]
        pc = data[idx]
        nrm = normal[idx]
        gt = label[idx]
        tgt = np.asarray([t for _, t in chunk])
        if nb < B:
            pad = B - nb
            pc = np.concatenate([pc, pc[:1].repeat(pad, 0)])
            nrm = np.concatenate([nrm, nrm[:1].repeat(pad, 0)])
            gt = np.concatenate([gt, gt[:1].repeat(pad, 0)])
            tgt = np.concatenate([tgt, tgt[:1].repeat(pad, 0)])
        rng, akey = jax.random.split(rng)
        res = fn(jnp.asarray(pc), jnp.asarray(nrm), jnp.asarray(gt),
                 jnp.asarray(tgt), akey)
        adv = np.asarray(res.best_attack)
        succ = np.asarray(res.success)
        logits = np.asarray(logits_fn(jnp.asarray(adv)))
        preds = logits.argmax(-1)
        for k in range(nb):
            i, t = chunk[k]
            if succ[k] and preds[k] == t:
                n_ok += 1
                name = gio.adversarial_mat_name(i, int(gt[k]), int(preds[k]), t)
                gio.save_adversarial_mat(
                    os.path.join(EXP, "Mat", name + ".mat"),
                    adv[k], int(gt[k]), int(preds[k]),
                )
                gio.save_point_obj(
                    os.path.join(EXP, "PC", name + ".obj"), adv[k]
                )
            else:
                order = np.argsort(-logits[k])
                still_failing.append({
                    "pair": [int(i), int(t)],
                    "gt": int(gt[k]),
                    "pred": int(preds[k]),
                    "target_logit_rank": int(np.where(order == t)[0][0]),
                    "margin_to_top": float(logits[k].max() - logits[k, t]),
                })
        print(f"  [{rung_name}] {s + nb}/{len(pairs)}: closed {n_ok}",
              flush=True)
    report["rungs"][rung_name] = {
        "attempted": len(pairs), "closed": n_ok,
        "time_s": round(time.time() - t0, 1),
    }
    pairs = [tuple(r["pair"]) for r in still_failing]
    report["remaining"] = still_failing
    print(f"{rung_name}: closed {n_ok}, {len(pairs)} remain "
          f"({report['rungs'][rung_name]['time_s']}s)", flush=True)

# ---- second-victim diagnostic: are the residuals victim-DRAW-specific? --
# Train a second 100%-clean-accuracy victim from a different seed and
# re-attack the surviving pairs against it (Margin bi20). Closures here do
# NOT count toward the artifact (it is tied to victim 1) — they are
# evidence that the survivors are a property of the particular victim draw
# (the plateau/confidence-wall pathology), not of the attack machinery.
if pairs:
    t0 = time.time()
    v2dir = "Pretrained2/PointNet/1024"
    if not os.path.isfile(os.path.join(v2dir, "model_best.msgpack")):
        from geoa3_tpu.cli.main_train import build_parser as tp
        from geoa3_tpu.cli.main_train import main as train_main

        targs = tp().parse_args([
            "--datadir", "synthetic:100:10", "--npoint", "1024",
            "--epochs", "15", "-b", "32", "--arch", "PointNet", "-c", "40",
            "--random_seed", "1", "--modeldir", v2dir,
        ])
        train_main(targs)
    variables2 = load_victim_variables(v2dir, arch="PointNet")
    logits2_fn = make_eval_fn(build_model("PointNet", 40, N), variables2)
    idx_all = sorted({i for i, _ in pairs})
    preds2 = np.asarray(
        jnp.argmax(logits2_fn(jnp.asarray(data[idx_all])), axis=-1)
    )
    ok_inst = {i for i, p in zip(idx_all, preds2) if p == label[i]}
    pairs2 = [(i, t) for i, t in pairs if i in ok_inst]
    cfg2 = AttackConfig(
        attack_label="All", classes=40, npoint=N, iter_max_steps=500,
        dis_loss_type="CD", dis_loss_weight=1.0, hd_loss_weight=0.1,
        curv_loss_weight=1.0, curv_loss_knn=16, cls_loss_type="Margin",
        binary_max_steps=20, initial_const=10.0,
    )
    fn2 = make_attack_fn(logits2_fn, cfg2, host_binary_loop=True)
    closed2 = 0
    for s in range(0, len(pairs2), B):
        chunk = pairs2[s : s + B]
        nb = len(chunk)
        idx = [i for i, _ in chunk]
        pc, nrm = data[idx], normal[idx]
        gt = label[idx]
        tgt = np.asarray([t for _, t in chunk])
        if nb < B:
            pad = B - nb
            pc = np.concatenate([pc, pc[:1].repeat(pad, 0)])
            nrm = np.concatenate([nrm, nrm[:1].repeat(pad, 0)])
            gt = np.concatenate([gt, gt[:1].repeat(pad, 0)])
            tgt = np.concatenate([tgt, tgt[:1].repeat(pad, 0)])
        rng, akey = jax.random.split(rng)
        res = fn2(jnp.asarray(pc), jnp.asarray(nrm), jnp.asarray(gt),
                  jnp.asarray(tgt), akey)
        preds = np.asarray(
            jnp.argmax(logits2_fn(res.best_attack), axis=-1)
        )
        succ = np.asarray(res.success)
        closed2 += sum(
            1 for kk in range(nb) if succ[kk] and preds[kk] == chunk[kk][1]
        )
    report["second_victim"] = {
        "survivors_attempted": len(pairs2),
        "survivors_skipped_victim2_misclassifies_gt":
            len(pairs) - len(pairs2),
        "closed_on_victim2": closed2,
        "time_s": round(time.time() - t0, 1),
    }
    print(f"second-victim diagnostic: {closed2}/{len(pairs2)} survivors "
          f"close on an independently-drawn victim", flush=True)

final_closed = len(closed) + sum(r["closed"] for r in report["rungs"].values())
report["final"] = {
    "closed": final_closed, "total": data.shape[0] * 9,
    "rate_pct": round(final_closed / (data.shape[0] * 9) * 100, 2),
}
with open("/root/repo/runs/artifacts/escalation_report.json", "w") as f:
    json.dump(report, f, indent=2)
print(f"FINAL: {final_closed}/{data.shape[0] * 9} = "
      f"{report['final']['rate_pct']}%", flush=True)
