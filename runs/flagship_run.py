"""Flagship end-to-end run on real TPU: train a 1024-pt PointNet victim on
synthetic shapes, distill a 250-instance attack set, run the FULL default
GeoA3 attack (binary 10 x iter 500, CE + CD 1.0 + HD 0.1 + curv 1.0 k16),
then defense-evaluate. Results land in runs/flagship/."""

import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "flagship"))
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

T0 = time.time()


def stamp(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


# ---- 1. train victim ----
from geoa3_tpu.cli.main_train import build_parser as tp, main as train_main

if not os.path.isfile("Pretrained/PointNet/1024/model_best.msgpack"):
    stamp("training victim ...")
    targs = tp().parse_args([
        "--datadir", "synthetic:100:10", "--npoint", "1024", "--epochs", "15",
        "-b", "32", "--arch", "PointNet", "-c", "40",
    ])
    res = train_main(targs)
    stamp(f"victim trained: {res}")
else:
    stamp("victim exists, skipping training")

# ---- 2. distill attack set ----
from geoa3_tpu.cli.gen_data_mat import build_parser as gp, main as gen_main

stamp("distilling attack set ...")
gargs = gp().parse_args([
    "--datadir", "synthetic", "--npoint", "1024", "--max_out_num", "25",
    "--outdir", "Data", "--checkpoint", "Pretrained/PointNet/1024",
])
mat_path = gen_main(gargs)
stamp(f"attack set: {mat_path}")

# ---- 3. full default attack (Untarget over the whole set in one batch) ----
from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

stamp("running full-budget GeoA3 attack ...")
aargs = ap().parse_args([
    "--attack", "GeoA3", "--attack_label", "Untarget",
    "--data_dir_file", mat_path, "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", "25",
    "--checkpoint", "Pretrained/PointNet/1024",
])
saved_dir = attack_main(aargs)
stamp(f"attack done: {saved_dir}")

# ---- 4. defense eval ----
from geoa3_tpu.cli.defense import build_parser as dp, main as defense_main

stamp("defense eval (outliers_fixNum drop 128) ...")
dargs = dp().parse_args([
    "--datadir", os.path.join(saved_dir, "Mat"), "--npoint", "1024",
    "--defense_type", "outliers_fixNum", "--drop_num", "128",
    "--checkpoint", "Pretrained/PointNet/1024",
])
defense_main(dargs)

# ---- 5. smoothness ----
from geoa3_tpu.cli.smoothness import build_parser as sp, main as smooth_main

sargs = sp().parse_args(["--datadir", saved_dir, "--k", "16", "--k2", "16"])
smooth_main(sargs)
stamp("ALL DONE")
