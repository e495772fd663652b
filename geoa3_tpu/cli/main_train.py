"""Victim training CLI (TPU-native rebuild of reference main_train.py:33-57).

`--datadir synthetic[:per_class[:classes]]` trains on the built-in synthetic
shape dataset; otherwise expects a ModelNet40_normal_resampled directory.
"""

from __future__ import annotations

import argparse
import os

from geoa3_tpu.train import TrainConfig, train


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Point Cloud Training")
    # ========================= Random seed ==========================
    parser.add_argument("--id", default=0, type=int)
    parser.add_argument("--random_seed", default=0, type=int)
    # ========================= Data loader ==========================
    parser.add_argument(
        "--datadir", default="/data/modelnet40_normal_resampled/", type=str,
        metavar="DIR",
    )
    parser.add_argument("-c", "--classes", default=40, type=int, metavar="N")
    parser.add_argument("--npoint", default=1024, type=int)
    parser.add_argument("--is_aug_data", action="store_true", default=False)
    # ========================= Model ==========================
    parser.add_argument("--arch", default="PointNet", type=str, metavar="ARCH")
    # ========================= Training ==========================
    parser.add_argument("-g", "--mGPU", default=1, type=int, metavar="N",
                        help="kept for flag parity; use --mesh_data_parallel")
    parser.add_argument("-j", "--num_workers", default=8, type=int, metavar="N")
    parser.add_argument("-b", "--batch_size", default=32, type=int, metavar="N")
    parser.add_argument("--epochs", default=250, type=int, metavar="N")
    parser.add_argument("--lr", default=0.001, type=float, metavar="LR")
    parser.add_argument("--decay-epochs", dest="decay_epochs", default=20,
                        type=int, metavar="N")
    parser.add_argument("--bn_momentum", default=0.5, type=float, metavar="BN")
    parser.add_argument("--wd", default=0.0001, type=float, metavar="W")
    # ========================= Runtime ==========================
    parser.add_argument("--resume", default="", type=str, metavar="PATH")
    # ========================= Monitor ==========================
    parser.add_argument("--is_use_tb", action="store_true", default=False)
    parser.add_argument("--modeldir", default=None, type=str,
                        help="override Pretrained/{arch}/{npoint}")
    return parser


def main(cfg_args) -> dict:
    modeldir = cfg_args.modeldir or os.path.join(
        "Pretrained", cfg_args.arch, str(cfg_args.npoint)
    )
    os.makedirs(modeldir, exist_ok=True)

    tcfg = TrainConfig(
        arch=cfg_args.arch,
        classes=cfg_args.classes,
        npoint=cfg_args.npoint,
        batch_size=cfg_args.batch_size,
        epochs=cfg_args.epochs,
        lr=cfg_args.lr,
        decay_epochs=cfg_args.decay_epochs,
        bn_momentum=cfg_args.bn_momentum,
        wd=cfg_args.wd,
        is_aug_data=cfg_args.is_aug_data,
        seed=cfg_args.random_seed,
        use_tensorboard=cfg_args.is_use_tb,
        # the [0,2,1] swap is a ModelNet convention (reference :211); synthetic
        # shapes carry none, and gen_data_mat's synthetic mode skips it too
        axis_swap=not cfg_args.datadir.startswith("synthetic"),
    )

    if cfg_args.datadir.startswith("synthetic"):
        from geoa3_tpu.data.modelnet_train import SyntheticTrainDataset

        # synthetic:per_class:shape_classes — shape_classes is how many of the
        # 10 generators to use; the model head keeps -c classes
        parts = cfg_args.datadir.split(":")
        per_class = int(parts[1]) if len(parts) > 1 else 64
        shape_classes = int(parts[2]) if len(parts) > 2 else min(tcfg.classes, 10)
        use_mn_labels = tcfg.classes >= 40 and shape_classes <= 10
        train_ds = SyntheticTrainDataset(
            num_per_class=per_class, classes=shape_classes,
            batch_size=tcfg.batch_size, npoints=tcfg.npoint, split="train",
            seed=tcfg.seed, modelnet_labels=use_mn_labels,
        )
        test_ds = SyntheticTrainDataset(
            num_per_class=max(per_class // 4, 4), classes=shape_classes,
            batch_size=tcfg.batch_size, npoints=tcfg.npoint, split="test",
            seed=tcfg.seed, modelnet_labels=use_mn_labels,
        )
    else:
        from geoa3_tpu.data.modelnet_train import ModelNetTrainDataset

        train_ds = ModelNetTrainDataset(
            root=cfg_args.datadir, batch_size=tcfg.batch_size,
            npoints=tcfg.npoint, split="train", normal_channel=False,
        )
        test_ds = ModelNetTrainDataset(
            root=cfg_args.datadir, batch_size=tcfg.batch_size,
            npoints=tcfg.npoint, split="test", normal_channel=False,
        )

    _, result = train(
        tcfg, train_ds, test_ds, modeldir=modeldir,
        resume=cfg_args.resume or None,
    )
    return result


if __name__ == "__main__":
    args = build_parser().parse_args()
    print(args)
    main(args)
