"""Tests for the auxiliary CLIs: resample_mat and save_ori_obj."""

import os

import numpy as np
import scipy.io as sio

from geoa3_tpu.cli.resample_mat import build_parser as rp, main as resample_main
from geoa3_tpu.cli.save_ori_obj import build_parser as sp, main as save_main
from geoa3_tpu.data import io as gio
from geoa3_tpu.data.modelnet import TEN_LABEL_NAMES
from geoa3_tpu.data.synthetic import make_synthetic_attack_set


def test_resample_mat(tmp_path, rng):
    d = make_synthetic_attack_set(num_per_class=2, npoint=128, classes=3)
    src = str(tmp_path / "dense.mat")
    sio.savemat(src, d)
    out = str(tmp_path / "resampled.mat")
    args = rp().parse_args(
        ["--input", src, "--output", out, "--npoint", "32"]
    )
    resample_main(args)
    back = sio.loadmat(out)
    assert back["data"].shape == (6, 3, 32)
    assert back["normal"].shape == (6, 3, 32)
    # renormalised to the unit sphere
    norms = np.linalg.norm(back["data"][0].T, axis=1)
    assert norms.max() <= 1.0 + 1e-5


def test_save_ori_obj_from_mat(tmp_path):
    d = make_synthetic_attack_set(num_per_class=1, npoint=16, classes=2)
    src = str(tmp_path / "set.mat")
    sio.savemat(src, d)
    args = sp().parse_args(
        ["--is_save_from_mat", "--mat_path", src, "--outdir", str(tmp_path)]
    )
    out = save_main(args)
    files = sorted(os.listdir(out))
    assert files == ["0.xyz", "1.xyz"]
    pts = gio.read_xyz(os.path.join(out, "0.xyz"))
    np.testing.assert_allclose(pts, d["data"][0].T, atol=1e-5)


def test_save_ori_obj_mesh_mode(tmp_path):
    mesh_root = tmp_path / "meshes" / TEN_LABEL_NAMES[0]
    mesh_root.mkdir(parents=True)
    verts = [[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 2.0, 0.0]]
    gio.write_obj(str(mesh_root / "a.obj"), verts, [[0, 1, 2]])
    args = sp().parse_args(
        ["--mesh_dir", str(tmp_path / "meshes"), "--outdir", str(tmp_path)]
    )
    out = save_main(args)
    files = os.listdir(out)
    assert len(files) == 1 and files[0].endswith("_17.obj")  # airplane id
    v, f = gio.read_obj(os.path.join(out, files[0]))
    assert np.linalg.norm(np.asarray(v), axis=1).max() <= 1.0 + 1e-5


class TestReadinessDrill:
    """Real-data readiness drill (TODO.md 'Data' as one command)."""

    def _run(self, argv):
        from geoa3_tpu.cli.readiness import build_parser, main

        return main(build_parser().parse_args(argv))

    def test_all_skip_when_no_assets(self, tmp_path, capsys):
        out = str(tmp_path / "r.json")
        rc = self._run(["--out", out])
        assert rc == 0
        import json

        rep = json.load(open(out))
        assert rep["verdict"].startswith("PARTIAL")
        assert all(s["status"] == "SKIP" for s in rep["steps"].values())

    def test_convert_parity_and_smoke(self, tmp_path):
        import json
        import sys
        import types

        import pytest

        torch = pytest.importorskip("torch")
        if not os.path.isdir("/root/reference/Model"):
            pytest.skip("reference repo not available")
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models
        sys.path.insert(0, "/root/reference/Model")
        from PointNet import PointNet as TorchPointNet

        npoint = 64
        tm = TorchPointNet(40, npoint=npoint)
        tm.eval()
        # warm the BN running stats so eval mode is non-trivial
        with torch.no_grad():
            tm.train()
            tm(torch.randn(8, 3, npoint))
            tm.eval()
        ckpt = str(tmp_path / "model_best.pth.tar")
        torch.save({"state_dict": tm.state_dict()}, ckpt)

        mat = str(tmp_path / "set.mat")
        d = make_synthetic_attack_set(num_per_class=1, npoint=npoint,
                                      classes=2, seed=3)
        sio.savemat(mat, d)

        out = str(tmp_path / "r.json")
        rc = self._run([
            "--checkpoint", ckpt, "--npoint", str(npoint),
            "--data_dir_file", mat, "--out", out,
        ])
        rep = json.load(open(out))
        assert rep["steps"]["convert"]["status"] == "PASS"
        assert rep["steps"]["torch_parity"]["status"] == "PASS", rep
        assert rep["steps"]["clean_acc"]["status"] == "SKIP"
        assert rep["steps"]["attack_smoke"]["status"] == "PASS", rep
        assert rc == 0


class TestRefreshDivisorFallback:
    """--curv_knn_refresh_every defaults to 10 (engine deviation #7); values
    not dividing --iter_max_steps must fall back to the largest divisor so
    the lazy-refresh nested scan tiles the inner loop exactly."""

    def _cfg(self, extra):
        from geoa3_tpu.cli.main_attack import _attack_config, build_parser

        args = build_parser().parse_args(
            ["--data_dir_file", "x.mat", "--checkpoint", "c"] + extra
        )
        return _attack_config(args)

    def test_default_divides(self):
        cfg = self._cfg(["--iter_max_steps", "500"])
        assert cfg.curv_knn_refresh_every == 10

    def test_non_divisor_falls_back(self):
        cfg = self._cfg(["--iter_max_steps", "37"])
        assert cfg.curv_knn_refresh_every == 1
        cfg = self._cfg(["--iter_max_steps", "24", "--curv_knn_refresh_every", "9"])
        assert cfg.curv_knn_refresh_every == 8

    def test_exact_mode_untouched(self):
        cfg = self._cfg(["--iter_max_steps", "500", "--curv_knn_refresh_every", "1"])
        assert cfg.curv_knn_refresh_every == 1

    def test_config_asserts_non_divisor(self):
        import jax.numpy as jnp
        import pytest as _pytest

        from geoa3_tpu.attack import AttackConfig
        from geoa3_tpu.attack.engine import make_attack_fn

        cfg = AttackConfig(
            attack_label="Untarget", classes=4, npoint=8,
            binary_max_steps=1, iter_max_steps=7, curv_loss_weight=1.0,
            curv_knn_refresh_every=3,
        )
        with _pytest.raises(AssertionError, match="multiple of"):
            # make_attack_fn validates the config (engine.py cfg.validate())
            make_attack_fn(lambda pc: jnp.zeros((pc.shape[0], 4)), cfg)
