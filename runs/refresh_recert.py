"""E2e re-certification of the mask-reuse lazy curvature refresh
(curv_knn_refresh_every > 1) against the round-4 exact-mode certs.

Engine deviation discipline (like deviations #5/#6): the lazy refresh
holds the kappa selection mask fixed for K steps (reference re-selects
every call, Lib/loss_utils.py:70-85), so its effect on attack success and
perturbation quality must be measured e2e on the SAME victim + distilled
set as the exact-mode round-4 certs:

  flagship (PointNet): 250/250, CD 0.00236 / HD 0.0119
  pnpp (SSG):          250/250, CD 0.00243 / HD 0.00929
  msg (MSG):           250/250, CD 0.00413 / HD 0.0242

Usage: python runs/refresh_recert.py <K> [flagship|pnpp|msg]
"""
import json
import os
import sys
import time

K = sys.argv[1]
which = sys.argv[2] if len(sys.argv) > 2 else "flagship"
ARCH = {"flagship": "PointNet", "pnpp": "PointNetPP", "msg": "PointNetPP_MSG"}
BATCH = {"flagship": "25", "pnpp": "16", "msg": "10"}
arch = ARCH[which]
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), which))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

T0 = time.time()

from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

mat = f"Data/modelnet10_250instances1024_{arch}.mat"
assert os.path.isfile(mat), f"run runs/{which}_run.py first"
# experiment id 8<K> keeps this separate from the exact-mode dir
aargs = ap().parse_args([
    "--attack", "GeoA3", "--attack_label", "Untarget", "--arch", arch,
    "--data_dir_file", mat, "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", BATCH[which], "--id", f"8{K}",
    "--curv_knn_refresh_every", K,
    "--checkpoint", f"Pretrained/{arch}/1024",
])
saved_dir = attack_main(aargs)
print(f"[{time.time()-T0:.1f}s] refresh K={K} {arch} recert done -> "
      f"{saved_dir}", flush=True)

with open(os.path.join(saved_dir, "attack_metrics.json")) as f:
    m = json.load(f)
print(f"REFRESH RECERT K={K} {arch}:", json.dumps(m), flush=True)
ok = m["success_rate_percent"] == 100.0
print("PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
