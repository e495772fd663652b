"""Targeted All-mode attack, round-2 rerun: 250 instances x 9 targets at the
full default budget with the --batch_timeout watchdog active (the round-1 run
died 39/42 batches in to an infra hang that predated the watchdog)."""
import os, sys, time
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "flagship"))
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from geoa3_tpu.cli.main_attack import build_parser, main
t0 = time.time()
args = build_parser().parse_args([
    "--attack", "GeoA3", "--attack_label", "All",
    "--data_dir_file", "Data/modelnet10_250instances1024_PointNet.mat",
    "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", "6",  # x9 targets = 54 per program
    "--checkpoint", "Pretrained/PointNet/1024",
    "--batch_timeout", "600",
    "--id", "2",
])
saved_dir = main(args)
print(f"ALL-MODE DONE in {time.time()-t0:.0f}s -> {saved_dir}", flush=True)
