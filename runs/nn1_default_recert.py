"""E2e re-certification of the packed 1-NN default on the PN++ victims
(engine deviation discipline, like deviation #5's per-victim recerts).

Round 4 made GEOA3_NN1_SELECT=packed the default after the PointNet
isolation recert measured identical quality (runs/packed_recert.py nn1
arm); this re-runs the SSG and MSG attack stages against the SAME victims
and distilled sets as the round-4 protocol (runs/{pnpp,msg}/...) with the
new default. Pass rule: 250/250 success and CD/HD within the few-percent
regeneration noise band of the exact-mode round-4 certs
(SSG CD 0.00243 / HD 0.00929, MSG CD 0.00413 / HD 0.0242).

Usage: python runs/nn1_default_recert.py {pnpp|msg}
"""
import json
import os
import sys
import time

ARCH = {"pnpp": "PointNetPP", "msg": "PointNetPP_MSG"}
BATCH = {"pnpp": "16", "msg": "10"}
which = sys.argv[1]
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), which))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

T0 = time.time()

from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

arch = ARCH[which]
mat = f"Data/modelnet10_250instances1024_{arch}.mat"
assert os.path.isfile(mat), f"run runs/{which}_run.py first"
# experiment id 7 keeps this separate from the exact-mode dir (id 0)
aargs = ap().parse_args([
    "--attack", "GeoA3", "--attack_label", "Untarget", "--arch", arch,
    "--data_dir_file", mat, "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", BATCH[which], "--id", "7",
    "--checkpoint", f"Pretrained/{arch}/1024",
])
saved_dir = attack_main(aargs)
print(f"[{time.time()-T0:.1f}s] nn1-default recert done -> {saved_dir}",
      flush=True)

with open(os.path.join(saved_dir, "attack_metrics.json")) as f:
    m = json.load(f)
print(f"NN1 DEFAULT RECERT {arch}:", json.dumps(m), flush=True)
ok = m["success_rate_percent"] == 100.0
print("PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
