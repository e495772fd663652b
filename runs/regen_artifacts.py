"""Regenerate the gitignored run artifacts (trained victims + distilled
attack sets) for all three victim archs after a workspace restore.

Idempotent: each stage is skipped when its output already exists, so this
is safe to re-run after a crash. Attack stages are NOT run here — the
victims + .mat attack sets are all that profiling and the All-mode
protocol need to start.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
ROOT = os.path.dirname(os.path.abspath(__file__))
T0 = time.time()


def stamp(m):
    print(f"[{time.time()-T0:8.1f}s] {m}", flush=True)


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from geoa3_tpu.cli.gen_data_mat import build_parser as gp  # noqa: E402
from geoa3_tpu.cli.gen_data_mat import main as gen_main  # noqa: E402
from geoa3_tpu.cli.main_train import build_parser as tp  # noqa: E402
from geoa3_tpu.cli.main_train import main as train_main  # noqa: E402

JOBS = [
    # (run dir, arch, epochs)  — epochs match the certified RESULTS.md runs
    ("flagship", "PointNet", 15),
    ("pnpp", "PointNetPP", 12),
    ("msg", "PointNetPP_MSG", 12),
]

for rundir, arch, epochs in JOBS:
    os.makedirs(os.path.join(ROOT, rundir), exist_ok=True)
    os.chdir(os.path.join(ROOT, rundir))
    ckpt = f"Pretrained/{arch}/1024/model_best.msgpack"
    if not os.path.isfile(ckpt):
        stamp(f"[{arch}] training victim ({epochs} epochs) ...")
        targs = tp().parse_args([
            "--datadir", "synthetic:100:10", "--npoint", "1024",
            "--epochs", str(epochs), "-b", "32", "--arch", arch, "-c", "40",
        ])
        res = train_main(targs)
        stamp(f"[{arch}] trained: {res}")
    else:
        stamp(f"[{arch}] victim exists")
    mat = f"Data/modelnet10_250instances1024_{arch}.mat"
    if not os.path.isfile(mat):
        stamp(f"[{arch}] distilling attack set ...")
        gargs = gp().parse_args([
            "--datadir", "synthetic", "--npoint", "1024",
            "--max_out_num", "25", "--outdir", "Data",
            "--checkpoint", f"Pretrained/{arch}/1024", "--arch", arch,
        ])
        mat_path = gen_main(gargs)
        stamp(f"[{arch}] attack set: {mat_path}")
    else:
        stamp(f"[{arch}] attack set exists")

stamp("ALL ARTIFACTS REGENERATED")
