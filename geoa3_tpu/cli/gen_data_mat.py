"""Attack-set distillation CLI (rebuild of reference Provider/gen_data_mat.py).

Builds `Data/modelnet10_{max_out_num*10}instances{npoint}_{arch}.mat` from a
ModelNet40 test split (or the synthetic shape generator) keeping only
instances the victim classifies correctly.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.io as sio

from geoa3_tpu.data.gen_data_mat import distill_attack_set
from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES
from geoa3_tpu.models.registry import build_model, make_eval_fn
from geoa3_tpu.utils.checkpoint import load_victim_variables


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Attack-set distillation")
    parser.add_argument(
        "--datadir", default="/data/modelnet40_normal_resampled/", type=str
    )
    parser.add_argument("--arch", default="PointNet", type=str)
    parser.add_argument("-c", "--classes", default=40, type=int)
    parser.add_argument("--npoint", default=1024, type=int)
    parser.add_argument("--max_out_num", default=25, type=int)
    parser.add_argument("--outdir", default="Data", type=str)
    parser.add_argument("--checkpoint", default=None, type=str)
    parser.add_argument(
        "--no_axis_swap", action="store_true", default=False,
        help="skip the reference's [0,2,1] y/z swap",
    )
    parser.add_argument("--random_seed", default=0, type=int)
    # ---- virtual-scan path (reference gen_data_mat.py:186-226) ----
    parser.add_argument(
        "--is_using_virscan", action="store_true", default=False,
        help="assemble from ascii-PLY virtual scans instead of a test split",
    )
    parser.add_argument(
        "--virscan_dir", default="Data/Ten_class_pc_normal", type=str,
        help="directory of *_<label>.ply scans (reference hardcodes "
        "Data/Ten_class_pc_normal)",
    )
    parser.add_argument(
        "--dense_npoints", default=10000, type=int,
        help="paired dense variant size; 0 disables (reference default 10000)",
    )
    return parser


def main(cfg) -> str:
    model = build_model(cfg.arch, cfg.classes, cfg.npoint)
    ckpt = cfg.checkpoint or os.path.join("Pretrained", cfg.arch, str(cfg.npoint))
    variables = load_victim_variables(ckpt, arch=cfg.arch)
    # pinned: the distillation filter is a selection decision — the attack
    # set must not shift with the round's fused-kernel defaults
    jitted = jax.jit(make_eval_fn(model, variables, pinned=True))

    def logits_fn(pc):
        return np.asarray(jitted(jnp.asarray(pc)))

    if cfg.is_using_virscan:
        from geoa3_tpu.data.gen_data_mat import distill_virscan_set

        out, dense_out = distill_virscan_set(
            cfg.virscan_dir,
            logits_fn,
            npoint=cfg.npoint,
            dense_npoints=cfg.dense_npoints,
            max_out_num=cfg.max_out_num,
            seed=cfg.random_seed,
        )
        os.makedirs(cfg.outdir, exist_ok=True)
        n_inst = out["data"].shape[0]
        path = os.path.join(
            cfg.outdir,
            f"modelnet10_{n_inst}instances{cfg.npoint}_{cfg.arch}.mat",
        )
        sio.savemat(path, out)
        print(f"saved {n_inst} instances -> {path}")
        if dense_out is not None:
            dense_path = os.path.join(
                cfg.outdir,
                f"modelnet10_{n_inst}instances{cfg.dense_npoints}_{cfg.arch}.mat",
            )
            sio.savemat(dense_path, dense_out)
            print(f"saved dense variant -> {dense_path}")
        return path

    if cfg.datadir.startswith("synthetic"):
        from geoa3_tpu.data.synthetic import sample_shape

        rng = np.random.RandomState(cfg.random_seed)

        def instances():
            for c, lab in enumerate(TEN_LABEL_INDEXES):
                for _ in range(cfg.max_out_num * 2):
                    p, m = sample_shape(c, cfg.npoint, rng)
                    yield p, m, lab

        axis_swap = False  # synthetic shapes carry no ModelNet axis convention
    else:
        from geoa3_tpu.data.modelnet_train import ModelNetTrainDataset

        ds = ModelNetTrainDataset(
            root=cfg.datadir,
            batch_size=1,
            npoints=cfg.npoint,
            split="test",
            normal_channel=True,
            shuffle=False,
        )

        def instances():
            for i in range(len(ds)):
                ps, lab = ds[i]
                yield ps[:, 0:3], ps[:, 3:6], int(lab)

        axis_swap = not cfg.no_axis_swap

    out = distill_attack_set(
        instances(),
        logits_fn,
        max_out_num=cfg.max_out_num,
        axis_swap=axis_swap,
        seed=cfg.random_seed,
    )
    os.makedirs(cfg.outdir, exist_ok=True)
    n_inst = out["data"].shape[0]
    path = os.path.join(
        cfg.outdir,
        f"modelnet10_{n_inst}instances{cfg.npoint}_{cfg.arch}.mat",
    )
    sio.savemat(path, out)
    print(f"saved {n_inst} instances -> {path}")
    return path


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args)
    main(args)
