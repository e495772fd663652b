"""Smoothness-metric CLI (rebuild of reference
Measurement/compute_data_smoothness.py:10-86).

Reads a Mat dir of adversarial outputs (or a dir of .xyz files with
--is_not_mat), computes the smoothness metric per cloud, and writes
metric/k{k}.mat + metric/result.txt in the reference formats.
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
import scipy.io as sio

from geoa3_tpu.data.io import read_xyz
from geoa3_tpu.measurement import smoothness


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Smoothness Computing")
    parser.add_argument(
        "--datadir", default="Data/modelnet40_1024_processed", type=str,
        metavar="DIR",
    )
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--k2", type=int, default=16)
    parser.add_argument("--print_freq", default=50, type=int)
    parser.add_argument("--is_not_mat", action="store_true", default=False)
    return parser


def main(cfg) -> float:
    if cfg.is_not_mat:
        src_dir = cfg.datadir
    else:
        src_dir = os.path.join(cfg.datadir, "Mat")
    filenames = sorted(os.listdir(src_dir))

    # load all clouds, then batch fixed-shape groups through one program
    clouds = []
    for filename in filenames:
        if cfg.is_not_mat:
            pc = read_xyz(os.path.join(src_dir, filename))
        else:
            pc = np.asarray(
                sio.loadmat(os.path.join(src_dir, filename))[
                    "adversary_point_clouds"
                ],
                np.float32,
            )
            if pc.shape[0] == 3:
                pc = pc.T
        clouds.append(pc)

    values = [0.0] * len(clouds)
    by_n: dict = {}
    for i, pc in enumerate(clouds):
        by_n.setdefault(pc.shape[0], []).append(i)
    BS = 32
    for n_pts, idxs in sorted(by_n.items()):
        for start in range(0, len(idxs), BS):
            chunk = idxs[start : start + BS]
            pcs = np.stack([clouds[i] for i in chunk])
            pad = BS - len(chunk)
            if pad:
                pcs = np.concatenate([pcs, np.repeat(pcs[:1], pad, 0)], 0)
            s_batch = np.asarray(
                smoothness(jnp.asarray(pcs), k=cfg.k, k2=cfg.k2)
            )
            for j, i in enumerate(chunk):
                values[i] = float(s_batch[j])
    for i in range(0, len(values), cfg.print_freq):
        print(
            "[{0}/{1}]: {2:.4f}({3:.4f})".format(
                i + 1, len(values), values[i], float(np.mean(values[: i + 1]))
            )
        )

    values = np.asarray(values, np.float32)
    metric_dir = os.path.join(cfg.datadir, "metric")
    os.makedirs(metric_dir, exist_ok=True)
    sio.savemat(
        os.path.join(metric_dir, f"k{cfg.k}.mat"), {"smoothness": values}
    )
    info = "k: {0}, avg: {1:.4f}, min: {2:.4f}, max: {3:.4f}\n".format(
        cfg.k, values.mean(), values.min(), values.max()
    )
    with open(os.path.join(metric_dir, "result.txt"), "at") as f:
        print(info)
        f.write(info)
    return float(values.mean())


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args)
    main(args)
