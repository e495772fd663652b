"""Tests for data providers, synthetic shapes, augmentations and IO."""

import os

import numpy as np
import pytest
import scipy.io as sio

from geoa3_tpu import data
from geoa3_tpu.data import augment, io
from geoa3_tpu.data.modelnet_train import SyntheticTrainDataset


@pytest.fixture(scope="module")
def mat_file(tmp_path_factory):
    d = data.make_synthetic_attack_set(num_per_class=3, npoint=64, classes=10)
    path = tmp_path_factory.mktemp("data") / "synthetic64.mat"
    sio.savemat(str(path), d)
    return str(path)


class TestSynthetic:
    def test_attack_set_structure(self):
        d = data.make_synthetic_attack_set(num_per_class=2, npoint=32, classes=4)
        assert d["data"].shape == (8, 3, 32)
        assert d["normal"].shape == (8, 3, 32)
        assert d["label"].shape == (8, 1)

    def test_shapes_normalised_and_normals_unit(self, rng):
        for c in range(10):
            p, m = data.sample_shape(c, 128, rng)
            assert np.linalg.norm(p, axis=1).max() <= 1.0 + 1e-5
            np.testing.assert_allclose(
                np.linalg.norm(m, axis=1), 1.0, atol=1e-4
            )

    def test_no_class_is_a_perfect_primitive(self):
        """Per-instance deformation (round-4): the sphere class must no
        longer be a perfect shell — a perfect-primitive class let the victim
        learn a globally-robust feature no pointwise C&W gradient can crack
        (round-3 MSG recert failures)."""
        def bestfit_sphere_resid(p):
            # least-squares sphere fit (linear in center and r^2 - |c|^2)
            A = np.concatenate([2 * p, np.ones((len(p), 1))], 1)
            b = (p**2).sum(1)
            x, *_ = np.linalg.lstsq(A, b, rcond=None)
            c = x[:3]
            r = np.sqrt(x[3] + c @ c)
            return np.abs(np.linalg.norm(p - c, axis=1) - r).std()

        p, _ = data.sample_shape(0, 2048, np.random.RandomState(3))  # sphere
        assert bestfit_sphere_resid(p) > 0.01, "sphere still a perfect shell"
        # undeformed escape hatch stays a perfect primitive
        p0, _ = data.sample_shape(0, 2048, np.random.RandomState(3), deform=False)
        assert bestfit_sphere_resid(p0) < 1e-6

    def test_instances_of_a_class_differ(self):
        rng = np.random.RandomState(0)
        a, _ = data.sample_shape(4, 512, rng)
        b, _ = data.sample_shape(4, 512, rng)
        # same class, different draws -> different shapes (not just resampled)
        from scipy.spatial import cKDTree

        d, _ = cKDTree(b).query(a)
        assert d.mean() > 0.02, "instances are near-identical shapes"

    def test_deformed_normals_are_exact(self):
        """Jacobian normal transport: a surface tangent t at p maps to J t at
        p', which must stay orthogonal to the transported normal n'."""
        from geoa3_tpu.data.synthetic import _deform_instance, _sphere, _unit

        pts, nrm = _sphere(np.random.RandomState(1), 256)
        # two tangent directions per point (complete the frame from n)
        helper = np.where(
            np.abs(nrm[:, :1]) < 0.9, [[1.0, 0, 0]], [[0, 1.0, 0]]
        )
        t1 = _unit(np.cross(nrm, helper))
        t2 = _unit(np.cross(nrm, t1))
        eps = 1e-5
        out, new_nrm = _deform_instance(pts, nrm, np.random.RandomState(7))
        for t in (t1, t2):
            # same seed -> identical field; finite-difference the tangent map
            out_eps, _ = _deform_instance(
                pts + eps * t, nrm, np.random.RandomState(7)
            )
            jt = (out_eps - out) / eps  # ~ J t (plus scale/rot, also linear)
            dots = np.abs(np.einsum("nd,nd->n", _unit(jt), new_nrm))
            assert dots.max() < 5e-4, f"normal not orthogonal: {dots.max()}"


class TestAttackSetDataset:
    def test_all_mode_gives_9_targets(self, mat_file):
        ds = data.AttackSetDataset(mat_file, attack_label="All")
        item = ds[0]
        assert item.pc.shape == (9, 64, 3)
        assert item.target_label.shape == (9,)
        # targets drawn from the 10 attacked classes, excluding gt
        assert all(t in data.TEN_LABEL_INDEXES for t in item.target_label)
        assert all(t != item.gt_label[0] for t in item.target_label)
        assert ds.num_attack_classes == 9

    def test_untarget_mode(self, mat_file):
        ds = data.AttackSetDataset(mat_file, attack_label="Untarget")
        item = ds[3]
        assert item.pc.shape == (1, 64, 3)
        assert item.target_label is None
        assert ds.num_attack_classes == 1

    def test_random_mode(self, mat_file):
        ds = data.AttackSetDataset(mat_file, attack_label="Random")
        item = ds[3]
        assert item.target_label.shape == (1,)
        assert item.target_label[0] != item.gt_label[0]

    def test_class_slice_mode(self, mat_file):
        ds = data.AttackSetDataset(mat_file, attack_label="bed")
        # slice [25:50) of a 30-item set clips to 5 items
        assert ds.start_index == 25

    def test_resample(self, mat_file):
        ds = data.AttackSetDataset(mat_file, attack_label="All", resample_num=32)
        assert ds.data.shape[1] == 32
        # resampled clouds re-normalised to unit sphere
        assert np.linalg.norm(ds.data[0], axis=1).max() <= 1.0 + 1e-4

    def test_batched_flattens(self, mat_file):
        ds = data.AttackSetDataset(mat_file, attack_label="All")
        pc, normal, gt, target = next(iter(data.batched(ds, batch_size=2)))
        assert pc.shape == (18, 64, 3)
        assert gt.shape == (18,) and target.shape == (18,)

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            data.AttackSetDataset("/nonexistent.mat")


class TestDefenseDataset:
    def test_roundtrip(self, tmp_path, rng):
        pc = rng.randn(64, 3).astype(np.float32)
        io.save_adversarial_mat(
            str(tmp_path / "adv_0_gt1_attack2_expect2.mat"), pc, 1, 2
        )
        ds = data.DefenseMatDataset(str(tmp_path))
        got_pc, gt, atk = ds[0]
        np.testing.assert_allclose(got_pc, pc, atol=1e-6)
        assert (gt, atk) == (1, 2)


class TestAugment:
    def test_rotations_preserve_norms(self, rng):
        pc = rng.randn(4, 32, 3).astype(np.float32)
        for fn in (
            augment.rotate_point_cloud,
            augment.rotate_point_cloud_z,
            augment.rotate_perturbation_point_cloud,
        ):
            out = fn(pc, rng=np.random.RandomState(0))
            np.testing.assert_allclose(
                np.linalg.norm(out, axis=-1),
                np.linalg.norm(pc, axis=-1),
                atol=1e-4,
            )

    def test_rotation_with_normal_keeps_alignment(self, rng):
        pc = rng.randn(2, 16, 3).astype(np.float32)
        nrm = rng.randn(2, 16, 3).astype(np.float32)
        batch = np.concatenate([pc, nrm], -1)
        out = augment.rotate_point_cloud_with_normal(
            batch, rng=np.random.RandomState(0)
        )
        # dot products between point and its normal are rotation-invariant
        np.testing.assert_allclose(
            (out[..., :3] * out[..., 3:]).sum(-1),
            (pc * nrm).sum(-1),
            atol=1e-4,
        )

    def test_jitter_clip(self, rng):
        pc = np.zeros((2, 100, 3), np.float32)
        out = augment.jitter_point_cloud(
            pc, sigma=1.0, clip=0.05, rng=np.random.RandomState(0)
        )
        assert np.abs(out).max() <= 0.05

    def test_scale_shift_dropout(self, rng):
        pc = rng.randn(2, 64, 3).astype(np.float32)
        s = augment.random_scale_point_cloud(pc, rng=np.random.RandomState(0))
        assert s.shape == pc.shape
        sh = augment.shift_point_cloud(pc, rng=np.random.RandomState(0))
        assert np.abs(sh - pc).max() <= 0.1 + 1e-6
        dp = augment.random_point_dropout(pc, rng=np.random.RandomState(0))
        assert dp.shape == pc.shape

    def test_normalize_data(self, rng):
        pc = 5 * rng.randn(3, 32, 3).astype(np.float32) + 2
        out = augment.normalize_data(pc)
        assert np.abs(out.mean(1)).max() < 1e-5
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1).max(1), 1.0, atol=1e-5
        )


class TestIO:
    def test_obj_roundtrip(self, tmp_path):
        verts = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        faces = [[0, 1, 2]]
        path = str(tmp_path / "mesh.obj")
        io.write_obj(path, verts, faces)
        v, f = io.read_obj(path)
        np.testing.assert_allclose(v, verts)
        assert f == faces

    def test_off_roundtrip(self, tmp_path):
        verts = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        faces = [[0, 1, 2]]
        path = str(tmp_path / "mesh.off")
        io.write_off(path, verts, faces)
        v, f = io.read_off(path)
        np.testing.assert_allclose(v, verts)
        assert f == [[3, 0, 1, 2]]

    def test_off_buggy_header(self, tmp_path):
        # ModelNet bug: "OFF" glued to the counts line
        path = str(tmp_path / "bug.off")
        with open(path, "w") as f:
            f.write("OFF3 1 0\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
        v, fc = io.read_off(path)
        assert len(v) == 3 and len(fc) == 1

    def test_xyz_roundtrip(self, tmp_path, rng):
        pc = rng.randn(16, 3).astype(np.float32)
        path = str(tmp_path / "points.xyz")
        io.save_xyz(path, pc)
        got = io.read_xyz(path)
        np.testing.assert_allclose(got, pc, atol=1e-5)

    def test_point_obj_format(self, tmp_path):
        path = str(tmp_path / "pc.obj")
        io.save_point_obj(path, np.asarray([[1.0, 2.0, 3.0]]))
        line = open(path).read().strip()
        assert line == "v 1.000000 2.000000 3.000000 0 0 0"

    def test_pc_normalize(self, rng):
        pc = 3 * rng.randn(50, 3).astype(np.float32) + 1
        out = io.pc_normalize(pc)
        assert np.abs(out.mean(0)).max() < 1e-6
        assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-6


class TestTrainDataset:
    def test_synthetic_batch_protocol(self):
        ds = SyntheticTrainDataset(
            num_per_class=4, classes=3, batch_size=5, npoints=32
        )
        assert len(ds) == 12
        seen = 0
        while ds.has_next_batch():
            pts, lbl = ds.next_batch(False)
            assert pts.shape[1:] == (32, 3)
            seen += len(lbl)
        assert seen == 12
        ds.reset()
        assert ds.has_next_batch()

    def test_augmented_batch(self):
        ds = SyntheticTrainDataset(
            num_per_class=2, classes=2, batch_size=4, npoints=32
        )
        pts, _ = ds.next_batch(True)
        assert pts.shape == (4, 32, 3)
        assert np.isfinite(pts).all()

    def test_modelnet_txt_loader(self, tmp_path, rng):
        # build a miniature ModelNet40_normal_resampled layout
        root = tmp_path / "mn"
        (root / "airplane").mkdir(parents=True)
        (root / "bed").mkdir()
        names = ["airplane", "bed"]
        (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
        ids = []
        for name in names:
            for i in range(2):
                sid = f"{name}_{i:04d}"
                ids.append(sid)
                pts = rng.randn(40, 6)
                np.savetxt(str(root / name / f"{sid}.txt"), pts, delimiter=",")
        (root / "modelnet40_train.txt").write_text("\n".join(ids) + "\n")
        (root / "modelnet40_test.txt").write_text("\n".join(ids) + "\n")

        from geoa3_tpu.data.modelnet_train import ModelNetTrainDataset

        ds = ModelNetTrainDataset(str(root), batch_size=3, npoints=32, split="train")
        assert len(ds) == 4
        pts, lbl = ds.next_batch(False)
        assert pts.shape == (3, 32, 3)
        assert set(np.unique(lbl)) <= {0, 1}
        # normalised
        assert np.linalg.norm(pts, axis=-1).max() <= 1.0 + 1e-5


class TestPLY:
    def test_read_ply_ascii_roundtrip(self, tmp_path, rng):
        pts = rng.randn(12, 3).astype(np.float32)
        nrm = rng.randn(12, 3).astype(np.float32)
        path = tmp_path / "scan.ply"
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\ncomment virtual scan\n")
            f.write("element vertex 12\n")
            for p in ("x", "y", "z", "nx", "ny", "nz"):
                f.write(f"property float {p}\n")
            f.write("element face 0\nproperty list uchar int vertex_indices\n")
            f.write("end_header\n")
            for p, m in zip(pts, nrm):
                f.write(" ".join(f"{v:.6f}" for v in list(p) + list(m)) + "\n")
        got_p, got_n = io.read_ply_ascii(str(path))
        np.testing.assert_allclose(got_p, pts, atol=1e-5)
        np.testing.assert_allclose(got_n, nrm, atol=1e-5)


class TestVirscanAssembly:
    """Fixture test for the virtual-scan distillation path
    (reference gen_data_mat.py:186-226)."""

    @staticmethod
    def _write_ply(path, pts, nrm):
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            for prop in ("x", "y", "z", "nx", "ny", "nz"):
                f.write(f"property float {prop}\n")
            f.write("end_header\n")
            for p, n in zip(pts, nrm):
                f.write(
                    f"{p[0]} {p[1]} {p[2]} {n[0]} {n[1]} {n[2]}\n"
                )

    def _make_scandir(self, tmp_path, rng):
        from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES

        d = tmp_path / "scans"
        d.mkdir()
        labels = []
        # 3 scans for each of the first 2 attacked classes + 1 non-whitelisted
        for j, lab in enumerate(TEN_LABEL_INDEXES[:2]):
            for k in range(3):
                pts = rng.randn(200, 3).astype(np.float32) + 5 * j
                nrm = rng.randn(200, 3).astype(np.float32)
                self._write_ply(d / f"scan{j}{k}_{lab}.ply", pts, nrm)
                labels.append(lab)
        self._write_ply(
            d / "scanx_0.ply",
            rng.randn(200, 3).astype(np.float32),
            rng.randn(200, 3).astype(np.float32),
        )  # label 0 is not in the ten attacked classes -> skipped
        (d / "ignored_3.obj").write_text("o mesh\n")  # .obj files skipped
        return str(d)

    def test_assembly_pairing_and_caps(self, tmp_path, rng):
        from geoa3_tpu.data.gen_data_mat import distill_virscan_set
        from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES

        scan_dir = self._make_scandir(tmp_path, rng)

        # stub victim that always classifies correctly: files are visited in
        # sorted order, so pop the expected labels in that same order
        import os

        expected = []
        for fn in sorted(os.listdir(scan_dir)):
            if ".obj" in fn:
                continue
            lab = int(fn.split("_")[1].split(".")[0])
            if lab in TEN_LABEL_INDEXES:
                expected.append(lab)
        seq = list(expected)

        def logits_fn(pc):
            lab = seq.pop(0)
            out = np.zeros((1, 40), np.float32)
            out[0, lab] = 1.0
            return out

        out, dense = distill_virscan_set(
            scan_dir, logits_fn, npoint=64, dense_npoints=96,
            max_out_num=2, seed=0, log=lambda s: None,
        )
        # 2 classes x cap 2 (3 available each); non-whitelisted label skipped
        assert out["data"].shape == (4, 3, 64)
        assert dense["data"].shape == (4, 3, 96)
        np.testing.assert_array_equal(out["label"], dense["label"])
        labs = out["label"].reshape(-1)
        assert sorted(set(labs)) == sorted(TEN_LABEL_INDEXES[:2])

        # pairing: each dense cloud must come from the SAME source scan as
        # its sparse sibling — chamfer to the sibling is far smaller than to
        # any other instance of the same class
        for i in range(4):
            a = out["data"][i].T
            dists = []
            for j in range(4):
                b = dense["data"][j].T
                d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
                dists.append(d2.min(axis=1).mean())
            assert int(np.argmin(dists)) == i

    def test_misclassified_scans_are_dropped(self, tmp_path, rng):
        from geoa3_tpu.data.gen_data_mat import distill_virscan_set
        from geoa3_tpu.data.modelnet import TEN_LABEL_INDEXES

        scan_dir = self._make_scandir(tmp_path, rng)
        c0 = TEN_LABEL_INDEXES[0]

        def logits_fn(pc):  # always predicts c0: only class-c0 scans kept
            out = np.zeros((1, 40), np.float32)
            out[0, c0] = 1.0
            return out

        out, dense = distill_virscan_set(
            scan_dir, logits_fn, npoint=64, dense_npoints=0,
            max_out_num=5, seed=0, log=lambda s: None,
        )
        assert dense is None
        assert (out["label"].reshape(-1) == c0).all()
        assert out["data"].shape[0] == 3


class TestReconstruct:
    """Alpha-shape reconstruction + resampling (equivalent of the reference's
    open3d helper, geoA3_attack.py:28-57)."""

    def _sphere(self, n=400, seed=0):
        rng = np.random.RandomState(seed)
        v = rng.normal(size=(n, 3))
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
            np.float32
        )

    def test_alpha_shape_sphere(self):
        from geoa3_tpu.attack import alpha_shape_mesh

        pc = self._sphere()
        verts, faces = alpha_shape_mesh(pc)
        assert len(faces) > 100
        # surface triangles index real vertices
        assert faces.min() >= 0 and faces.max() < len(verts)
        # outward orientation: face normal roughly along the centroid ray
        a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        nrm = np.cross(b - a, c - a)
        center = (a + b + c) / 3
        frac_out = (np.sum(nrm * center, axis=1) > 0).mean()
        assert frac_out > 0.95

    def test_resample_reconstruct_roundtrip(self, tmp_path):
        from geoa3_tpu.attack import resample_reconstruct_from_pc
        from geoa3_tpu.data.io import read_ply_ascii

        pc = self._sphere()
        pts, nrm = resample_reconstruct_from_pc(
            str(tmp_path), "sphere", pc, normal=pc, npoint=256,
            rng=np.random.RandomState(1),
        )
        assert pts.shape == (256, 3) and nrm.shape == (256, 3)
        # resampled points lie near the unit sphere surface
        r = np.linalg.norm(pts, axis=1)
        assert abs(float(r.mean()) - 1.0) < 0.05
        assert float(np.abs(r - 1).max()) < 0.25
        # the saved PLY is readable by our own reader
        verts, _ = read_ply_ascii(str(tmp_path / "sphere.ply"))
        assert verts.shape == (len(pc), 3)

    def test_inner_skin_dropped_with_normals(self):
        from geoa3_tpu.attack import alpha_shape_mesh

        pc = self._sphere(600, seed=1)
        _, faces_both = alpha_shape_mesh(pc)           # both skins kept
        verts, faces_outer = alpha_shape_mesh(pc, normal=pc)
        # the thin shell has ~2 skins; the normal-guided filter keeps ~1
        assert 0 < len(faces_outer) < 0.75 * len(faces_both)
        # every kept face is genuinely outward (sphere: along the centroid ray)
        a = verts[faces_outer[:, 0]]
        b = verts[faces_outer[:, 1]]
        c = verts[faces_outer[:, 2]]
        nrm = np.cross(b - a, c - a)
        ctr = (a + b + c) / 3
        assert (np.sum(nrm * ctr, axis=1) > 0).all()
