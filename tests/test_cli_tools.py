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
