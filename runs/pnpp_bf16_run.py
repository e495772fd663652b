"""PN++ SSG full-budget attack with --victim_dtype bfloat16 (EXPERIMENTAL —
see the post-mortem in RESULTS.md; f32 is the supported mode). Success is
judged by the f32 victim inside the engine and re-verified by the CLI.
Uses the victim + attack set from runs/pnpp_run.py (run that first)."""
import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "pnpp"))
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
T0 = time.time()

from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main

aargs = ap().parse_args([
    "--attack", "GeoA3", "--attack_label", "Untarget",
    "--data_dir_file", "Data/modelnet10_250instances1024_PointNetPP.mat",
    "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", "16", "--arch", "PointNetPP",
    "--checkpoint", "Pretrained/PointNetPP/1024",
    "--victim_dtype", "bfloat16",
    "--batch_timeout", "600",
    "--id", "3",
])
saved_dir = attack_main(aargs)
print(f"PNPP-BF16 DONE in {time.time()-T0:.0f}s -> {saved_dir}", flush=True)
