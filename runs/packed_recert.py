"""E2e re-certification of the packed selection modes (engine deviation
discipline, like deviation #5's kappa-kernel recert).

Re-runs the flagship attack stage (same victim, same distilled set as
runs/flagship_r4_log.txt) with GEOA3_KAPPA_SELECT=packed +
GEOA3_NN1_SELECT=packed and compares success/CD/HD against the exact-mode
certification. Pass rule: success 250/250 and CD/HD within the
regeneration noise band (a few % — round-3 recerts moved CD by ~5%
between victim draws; here the victim and set are IDENTICAL, so the only
change is which near-tie neighbours the quantised selects pick).

Run AFTER runs/flagship_run.py has produced runs/flagship/{Pretrained,Data}.
"""
import json
import os
import sys
import time

# argv[1]: which selects ride packed — both (default) | kappa | nn1.
# Isolation runs attribute the measured CD/HD quality cost (the 'both'
# run certified 100% success but CD +24% / HD +62% vs exact) to a mode.
MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
_IDS = {"both": "7", "kappa": "8", "nn1": "9"}
if MODE in ("both", "kappa"):
    os.environ["GEOA3_KAPPA_SELECT"] = "packed"
if MODE in ("both", "nn1"):
    os.environ["GEOA3_NN1_SELECT"] = "packed"

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "flagship"))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

T0 = time.time()

from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

assert os.path.isfile("Data/modelnet10_250instances1024_PointNet.mat"), (
    "run runs/flagship_run.py first"
)
# experiment ids 7/8/9 keep these separate from the exact-mode dir (id 0)
aargs = ap().parse_args([
    "--attack", "GeoA3", "--attack_label", "Untarget",
    "--data_dir_file", "Data/modelnet10_250instances1024_PointNet.mat",
    "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", "25", "--id", _IDS[MODE],
    "--checkpoint", "Pretrained/PointNet/1024",
])
saved_dir = attack_main(aargs)
print(f"[{time.time()-T0:.1f}s] packed-mode attack done -> {saved_dir}",
      flush=True)

metrics_path = os.path.join(saved_dir, "attack_metrics.json")
with open(metrics_path) as f:
    m = json.load(f)
print("PACKED RECERT:", json.dumps(m), flush=True)
ok = m["success_rate_percent"] == 100.0
print("PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
