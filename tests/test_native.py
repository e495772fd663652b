"""Native host-runtime tests: build the C++ library and compare against the
numpy reference implementations."""

import numpy as np
import pytest

from geoa3_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        from geoa3_tpu.native.build import build

        try:
            build(verbose=False)
        except Exception as e:  # no toolchain -> skip module
            pytest.skip(f"cannot build native library: {e}")
    assert native.available()


def test_parse_points(tmp_path, rng):
    data = rng.randn(100, 6).astype(np.float32)
    path = tmp_path / "cloud.txt"
    np.savetxt(str(path), data, delimiter=",", fmt="%.6f")
    got = native.parse_points(str(path), max_rows=64, cols=6)
    np.testing.assert_allclose(got, data[:64], atol=1e-5)


def test_parse_points_whitespace(tmp_path, rng):
    data = rng.randn(20, 3).astype(np.float32)
    path = tmp_path / "cloud_ws.txt"
    np.savetxt(str(path), data, delimiter=" ", fmt="%.6f")
    got = native.parse_points(str(path), max_rows=20, cols=3)
    np.testing.assert_allclose(got, data, atol=1e-5)


def test_fps_cuda_semantics(rng):
    from tests.test_ops import np_fps_cuda

    pts = rng.randn(80, 3).astype(np.float32)
    got = native.fps(pts, 16)
    want = np_fps_cuda(pts[None], 16)[0]
    np.testing.assert_array_equal(got, want)


def test_fps_random_start(rng):
    pts = rng.randn(60, 3).astype(np.float32)
    got = native.fps(pts, 10, start=5)
    assert got[0] == 5
    assert len(set(got.tolist())) == 10  # distinct picks


def test_sample_mesh_on_unit_square(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    pts, nrm = native.sample_mesh(verts, faces, 500, seed=1)
    assert pts.shape == (500, 3)
    # all samples on the square, z = 0
    assert (pts[:, :2] >= -1e-6).all() and (pts[:, :2] <= 1 + 1e-6).all()
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)
    # face normal +-z, unit length
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0, atol=1e-6)
    # area-uniformity: both halves (above/below diagonal) roughly equal
    upper = (pts[:, 1] > pts[:, 0]).mean()
    assert 0.35 < upper < 0.65


def test_sample_mesh_deterministic(rng):
    verts = rng.randn(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    a1, n1 = native.sample_mesh(verts, faces, 64, seed=42)
    a2, n2 = native.sample_mesh(verts, faces, 64, seed=42)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(n1, n2)


def test_normalize(rng):
    pts = (rng.randn(50, 3) * 3 + 1).astype(np.float32)
    out = native.normalize(pts)
    assert np.abs(out.mean(0)).max() < 1e-4
    assert abs(np.linalg.norm(out, axis=1).max() - 1.0) < 1e-5
