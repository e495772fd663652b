"""PN++ MSG end-to-end (BASELINE config 4, MSG variant): train on synthetic
shapes, distill, full-budget untargeted attack.

Mirrors runs/pnpp_run.py with --arch PointNetPP_MSG
(reference Model/PointNetPP_msg.py:9-47)."""
import os, sys, time
_d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "msg")
os.makedirs(_d, exist_ok=True)
os.chdir(_d)
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
T0 = time.time()
def stamp(m): print(f"[{time.time()-T0:8.1f}s] {m}", flush=True)

from geoa3_tpu.cli.main_train import build_parser as tp, main as train_main
if not os.path.isfile("Pretrained/PointNetPP_MSG/1024/model_best.msgpack"):
    stamp("training PN++ MSG victim ...")
    targs = tp().parse_args([
        "--datadir", "synthetic:100:10", "--npoint", "1024", "--epochs", "12",
        "-b", "32", "--arch", "PointNetPP_MSG", "-c", "40",
    ])
    res = train_main(targs)
    stamp(f"trained: {res}")
else:
    stamp("victim exists")

from geoa3_tpu.cli.gen_data_mat import build_parser as gp, main as gen_main
stamp("distilling ...")
gargs = gp().parse_args([
    "--datadir", "synthetic", "--npoint", "1024", "--max_out_num", "25",
    "--outdir", "Data", "--checkpoint", "Pretrained/PointNetPP_MSG/1024",
    "--arch", "PointNetPP_MSG",
])
mat_path = gen_main(gargs)
stamp(f"attack set: {mat_path}")

from geoa3_tpu.cli.main_attack import build_parser as ap, main as attack_main
stamp("attacking (full budget) ...")
aargs = ap().parse_args([
    "--attack", "GeoA3", "--attack_label", "Untarget",
    "--data_dir_file", mat_path, "--npoint", "1024",
    "--binary_max_steps", "10", "--iter_max_steps", "500",
    "-b", "10", "--arch", "PointNetPP_MSG",
    "--checkpoint", "Pretrained/PointNetPP_MSG/1024",
    "--batch_timeout", "900",
])
saved_dir = attack_main(aargs)
stamp(f"MSG DONE -> {saved_dir}")
