"""Real-data readiness drill: one command that proves (or cleanly skips)
everything needed to run the framework on REAL ModelNet40 assets.

The repo's parity tests run against random-weight reference models and
synthetic data because the upstream repo ships neither pretrained
`.pth.tar` checkpoints nor `.mat` attack sets (reference
Pretrained/PointNet/1024/ contains only result.txt). The day real assets
appear, this drill is the TODO.md "Data" section as one runnable command:

    python -m geoa3_tpu.cli.readiness \
        --checkpoint /path/to/model_best.pth.tar \
        --modelnet_root /data/modelnet40_normal_resampled \
        [--data_dir_file /path/to/attack_set.mat]

Steps (each prints PASS / FAIL / SKIP-with-reason; exit 0 iff no FAIL):
  1. convert     — load + auto-convert the checkpoint
                   (utils/checkpoint.py::load_victim_variables)
  2. torch_parity— logits parity of the converted weights vs the REFERENCE
                   torch model loaded from the same state dict
                   (needs torch + the reference sources)
  3. clean_acc   — distill the attack set from the ModelNet40 test split
                   (reference gen_data_mat.py:230-306 semantics) and report
                   victim accuracy on the split + per-class distilled counts
  4. attack_smoke— 1 padded batch, tiny budget, through the real attack
                   engine on the distilled (or provided) .mat
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REFERENCE_MODEL_DIR = "/root/reference/Model"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Real-data readiness drill")
    p.add_argument("--checkpoint", default=None, type=str,
                   help=".pth.tar / msgpack checkpoint (file or dir)")
    p.add_argument("--modelnet_root", default=None, type=str,
                   help="modelnet40_normal_resampled root (txt split format)")
    p.add_argument("--data_dir_file", default=None, type=str,
                   help="existing .mat attack set (skips distillation input)")
    p.add_argument("--arch", default="PointNet", type=str)
    p.add_argument("--npoint", default=1024, type=int)
    p.add_argument("--classes", default=40, type=int)
    p.add_argument("--max_out_num", default=25, type=int)
    p.add_argument("--parity_atol", default=5e-4, type=float)
    p.add_argument("--out", default=None, type=str,
                   help="write the JSON report here as well")
    return p


def _status(report, step, status, detail):
    report[step] = {"status": status, "detail": detail}
    print(f"[{status}] {step}: {detail}", flush=True)


def main(args) -> int:
    import jax
    import jax.numpy as jnp

    from geoa3_tpu.models.registry import build_model, make_eval_fn

    report: dict = {}
    variables = None
    model = build_model(args.arch, args.classes, args.npoint)

    # ---- 1. convert ----
    if not args.checkpoint:
        _status(report, "convert", "SKIP", "--checkpoint not given")
    elif not os.path.exists(args.checkpoint):
        _status(report, "convert", "SKIP",
                f"checkpoint path absent: {args.checkpoint}")
    else:
        from geoa3_tpu.utils.checkpoint import load_victim_variables

        try:
            variables = load_victim_variables(args.checkpoint, arch=args.arch)
            n_params = sum(
                int(np.prod(x.shape)) for x in jax.tree.leaves(variables)
            )
            _status(report, "convert", "PASS",
                    f"loaded + converted ({n_params} scalars)")
        except Exception as e:  # conversion failures must be loud
            _status(report, "convert", "FAIL", f"{type(e).__name__}: {e}")

    # ---- 2. torch parity ----
    if variables is None:
        _status(report, "torch_parity", "SKIP", "no converted checkpoint")
    elif args.arch != "PointNet":
        # PN++ parity needs the CPU _ext stub; covered by
        # tests/test_models.py::TestPNPPTorchParity with random weights
        _status(report, "torch_parity", "SKIP",
                "drill implements PointNet only; run the PN++ parity tests")
    elif not os.path.isdir(REFERENCE_MODEL_DIR):
        _status(report, "torch_parity", "SKIP",
                f"reference sources absent: {REFERENCE_MODEL_DIR}")
    else:
        try:
            import types

            import torch

            if "torchvision" not in sys.modules:
                tv = types.ModuleType("torchvision")
                tv.models = types.ModuleType("torchvision.models")
                sys.modules["torchvision"] = tv
                sys.modules["torchvision.models"] = tv.models
            sys.path.insert(0, REFERENCE_MODEL_DIR)
            from PointNet import PointNet as TorchPointNet

            from geoa3_tpu.models.convert import load_torch_checkpoint

            sd = load_torch_checkpoint(args.checkpoint)
            tm = TorchPointNet(args.classes, npoint=args.npoint)
            tm.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
            tm.eval()
            rng = np.random.RandomState(0)
            pc = rng.randn(4, args.npoint, 3).astype(np.float32)
            with torch.no_grad():
                want = tm(torch.from_numpy(pc.transpose(0, 2, 1))).numpy()
            got = np.asarray(
                model.apply(variables, jnp.asarray(pc), train=False)
            )
            err = float(np.abs(got - want).max())
            ok = err <= args.parity_atol or np.allclose(
                got, want, atol=args.parity_atol, rtol=1e-3
            )
            _status(report, "torch_parity", "PASS" if ok else "FAIL",
                    f"max logits err {err:.2e} (atol {args.parity_atol})")
        except Exception as e:
            _status(report, "torch_parity", "FAIL",
                    f"{type(e).__name__}: {e}")

    # ---- 3. clean-acc distillation ----
    mat_path = args.data_dir_file
    if variables is None:
        _status(report, "clean_acc", "SKIP", "no converted checkpoint")
    elif not args.modelnet_root:
        _status(report, "clean_acc", "SKIP", "--modelnet_root not given")
    elif not os.path.isdir(args.modelnet_root):
        _status(report, "clean_acc", "SKIP",
                f"root absent: {args.modelnet_root}")
    else:
        try:
            import scipy.io as sio

            from geoa3_tpu.data.gen_data_mat import distill_attack_set
            from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES
            from geoa3_tpu.data.modelnet_train import ModelNetTrainDataset

            jitted = jax.jit(make_eval_fn(model, variables))

            def logits_fn(pc):
                return np.asarray(jitted(jnp.asarray(pc)))

            ds = ModelNetTrainDataset(
                root=args.modelnet_root, batch_size=1, npoints=args.npoint,
                split="test", normal_channel=True, shuffle=False,
            )

            def instances():
                for i in range(len(ds)):
                    ps, lab = ds[i]
                    yield ps[:, 0:3], ps[:, 3:6], int(lab)

            out = distill_attack_set(
                instances(), logits_fn, max_out_num=args.max_out_num,
                axis_swap=True,
            )
            labels = out["label"].reshape(-1)
            counts = {int(c): int((labels == c).sum())
                      for c in TEN_LABEL_INDEXES}
            n = len(labels)
            full = args.max_out_num * len(TEN_LABEL_INDEXES)
            # every distilled instance is victim-correct by construction;
            # readiness requires the set to be FULL (the reference's 250)
            ok = n == full
            mat_path = mat_path or os.path.join(
                tempfile.gettempdir(),
                f"readiness_{n}instances{args.npoint}_{args.arch}.mat",
            )
            sio.savemat(mat_path, out)
            _status(report, "clean_acc", "PASS" if ok else "FAIL",
                    f"distilled {n}/{full} instances, per-class {counts}; "
                    f"saved {mat_path}")
        except Exception as e:
            _status(report, "clean_acc", "FAIL", f"{type(e).__name__}: {e}")

    # ---- 4. attack smoke ----
    if variables is None:
        _status(report, "attack_smoke", "SKIP", "no converted checkpoint")
    elif not mat_path or not os.path.isfile(mat_path):
        _status(report, "attack_smoke", "SKIP",
                "no attack set (.mat) available")
    else:
        try:
            import scipy.io as sio

            from geoa3_tpu.attack import AttackConfig
            from geoa3_tpu.attack.engine import make_attack_fn

            d = sio.loadmat(mat_path)
            pc = d["data"].transpose(0, 2, 1).astype(np.float32)[:4]
            nrm = d["normal"].transpose(0, 2, 1).astype(np.float32)[:4]
            gt = d["label"].reshape(-1).astype(np.int64)[:4]
            tgt = np.asarray(
                [np.int64((g + 1) % args.classes) for g in gt]
            )
            cfg = AttackConfig(
                attack_label="All", classes=args.classes,
                npoint=pc.shape[1], binary_max_steps=1, iter_max_steps=5,
                curv_loss_knn=min(16, pc.shape[1] - 1),
            )
            logits_eval = make_eval_fn(model, variables)
            fn = make_attack_fn(logits_eval, cfg, host_binary_loop=True)
            res = fn(jnp.asarray(pc), jnp.asarray(nrm), jnp.asarray(gt),
                     jnp.asarray(tgt), jax.random.PRNGKey(0))
            adv = np.asarray(res.best_attack)
            assert adv.shape == pc.shape and np.isfinite(adv).all()
            _status(report, "attack_smoke", "PASS",
                    f"1 batch of {pc.shape[0]} through the engine "
                    f"(success flags {np.asarray(res.success).tolist()})")
        except Exception as e:
            _status(report, "attack_smoke", "FAIL", f"{type(e).__name__}: {e}")

    failed = [k for k, v in report.items() if v["status"] == "FAIL"]
    skipped = [k for k, v in report.items() if v["status"] == "SKIP"]
    verdict = "NOT READY" if failed else (
        "READY" if not skipped else "PARTIAL (skips above)"
    )
    print(f"readiness: {verdict}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"verdict": verdict, "steps": report}, f, indent=2)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(build_parser().parse_args()))
