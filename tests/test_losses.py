"""Golden tests for the geometric losses against dense numpy oracles.

Oracles implement the O(n^2) formulas the reference keeps as comments
(Lib/loss_utils.py:30-31,39-40,46-47,54-56,67-69,74-76,87-90) — an
independent derivation path from the kNN-based implementation under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoa3_tpu import losses


def dense_sqdist(a, b):
    # a [b,n,3], b [b,m,3] -> [b,n,m]
    return ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)


def np_normalize(v, eps=1e-12):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, eps)


def np_kappa(pc, normal, k):
    d = dense_sqdist(pc, pc)
    idx = np.argsort(d, axis=-1, kind="stable")[..., 1 : k + 1]
    nn = np.stack([pc[i][idx[i]] for i in range(pc.shape[0])])  # [b,n,k,3]
    vec = np_normalize(nn - pc[:, :, None, :])
    return np.abs((vec * normal[:, :, None, :]).sum(-1)).mean(-1)


@pytest.fixture
def clouds(rng):
    adv = rng.randn(2, 48, 3).astype(np.float32)
    ori = adv + 0.05 * rng.randn(2, 48, 3).astype(np.float32)
    nrm = np_normalize(rng.randn(2, 48, 3).astype(np.float32))
    return adv, ori, nrm


def test_norm_l2(clouds):
    adv, ori, _ = clouds
    want = ((adv - ori) ** 2).sum((1, 2))
    np.testing.assert_allclose(
        np.asarray(losses.norm_l2_loss(adv, ori)), want, rtol=1e-5
    )


def test_chamfer(clouds):
    adv, ori, _ = clouds
    d = dense_sqdist(adv, ori)
    want = d.min(2).mean(1) + d.min(1).mean(1)
    np.testing.assert_allclose(
        np.asarray(losses.chamfer_loss(adv, ori)), want, rtol=1e-4
    )


def test_pseudo_chamfer(clouds):
    adv, ori, _ = clouds
    d = dense_sqdist(adv, ori)
    np.testing.assert_allclose(
        np.asarray(losses.pseudo_chamfer_loss(adv, ori)), d.min(2).mean(1), rtol=1e-4
    )


def test_hausdorff_one_sided(clouds):
    adv, ori, _ = clouds
    d = dense_sqdist(adv, ori)
    np.testing.assert_allclose(
        np.asarray(losses.hausdorff_loss(adv, ori)), d.min(2).max(1), rtol=1e-4
    )


def test_kappa_ori(clouds):
    adv, _, nrm = clouds
    got = np.asarray(losses.get_kappa_ori(adv, nrm, k=4))
    np.testing.assert_allclose(got, np_kappa(adv, nrm, 4), atol=1e-4)


def test_kappa_adv_uses_nearest_ori_normal(clouds):
    adv, ori, nrm = clouds
    kappa, used_normal = losses.get_kappa_adv(adv, ori, nrm, k=4)
    d = dense_sqdist(adv, ori)
    one_nn = d.argmin(-1)
    want_normal = np.stack([nrm[i][one_nn[i]] for i in range(2)])
    np.testing.assert_allclose(np.asarray(used_normal), want_normal, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(kappa), np_kappa(adv, want_normal, 4), atol=1e-4
    )


def test_curvature_loss(clouds):
    adv, ori, nrm = clouds
    ori_kappa = np.asarray(losses.get_kappa_ori(ori, nrm, k=4))
    adv_kappa, _ = losses.get_kappa_adv(adv, ori, nrm, k=4)
    got = np.asarray(losses.curvature_loss(adv, ori, adv_kappa, ori_kappa))
    one_nn = dense_sqdist(adv, ori).argmin(-1)
    nn_kappa = np.take_along_axis(ori_kappa, one_nn, axis=1)
    want = ((np.asarray(adv_kappa) - nn_kappa) ** 2).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_displacement_loss(clouds):
    adv, ori, _ = clouds
    k = 5
    got = np.asarray(losses.displacement_loss(adv, ori, k=k))
    d = dense_sqdist(ori, ori)
    idx = np.argsort(d, axis=-1, kind="stable")[..., 1 : k + 1]
    theta = ((adv - ori) ** 2).sum(-1)
    nn_theta = np.take_along_axis(theta[:, None, :].repeat(48, 1), idx, axis=2)
    want = ((nn_theta - theta[..., None]) ** 2).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_repulsion_loss(clouds):
    adv, _, _ = clouds
    k, h = 4, 0.03
    got = np.asarray(losses.repulsion_loss(adv, k=k, h=h))
    d = dense_sqdist(adv, adv)
    dis = np.sort(d, axis=-1)[..., 1 : k + 1]
    want = -(dis * np.exp(-(dis**2) / h**2)).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_knn_smoothing_loss(clouds):
    adv, _, _ = clouds
    k = 4
    got = np.asarray(losses.knn_smoothing_loss(adv, k=k, threshold_coef=1.05))
    d = dense_sqdist(adv, adv)
    knn_dis = np.sort(d, axis=-1)[..., 1 : k + 1].mean(-1)
    mean = knn_dis.mean(-1, keepdims=True)
    std = knn_dis.std(-1, ddof=1, keepdims=True)
    cond = knn_dis > (mean + 1.05 * std)
    want = (knn_dis * cond).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_distance_kmean_loss(clouds):
    adv, _, _ = clouds
    k = 4
    got = np.asarray(losses.distance_kmean_loss(adv, k=k))
    d = np.sqrt(dense_sqdist(adv, adv) + 1e-12)
    order = np.argsort(d, axis=-1, kind="stable")[..., : k + 1]
    dis = np.take_along_axis(d, order, axis=-1)
    dis_mean = dis[..., 1:].mean(-1)
    idx = order[..., 1:]
    dmk = np.take_along_axis(dis_mean[:, None, :].repeat(48, 1), idx, axis=2)
    want = np.abs(dis_mean[..., None] - dmk).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_uniform_loss_matches_numpy_transcription(rng):
    """Arithmetic parity with a dense numpy transcription of reference :151-190."""
    import math

    from tests.test_ops import np_ball_query, np_fps_cuda

    pc = rng.randn(1, 512, 3).astype(np.float32)
    pc /= np.linalg.norm(pc, axis=-1, keepdims=True).max()  # unit-sphere-ish

    def np_uniform(adv_pc, percentages=(0.004, 0.006, 0.008, 0.010, 0.012)):
        b, n, _ = adv_pc.shape
        npoint = int(n * 0.05)
        seed_idx = np_fps_cuda(adv_pc, npoint)
        new_xyz = np.stack([adv_pc[i][seed_idx[i]] for i in range(b)])
        loss = 0.0
        for p in percentages:
            p = p * 4
            nsample = int(n * p)
            r = math.sqrt(p * 1.0)
            disk_area = math.pi * p / nsample
            expect_len = math.sqrt(disk_area)
            idx = np_ball_query(r, nsample, adv_pc, new_xyz)
            grouped = np.stack(
                [adv_pc[i].reshape(n, 3)[idx[i].reshape(-1)] for i in range(b)]
            ).reshape(b * npoint, nsample, 3)
            d = dense_sqdist(grouped, grouped)
            dd = np.sort(d, axis=-1)[..., 1 : 3]
            u = np.sqrt(np.abs(dd) + 1e-12).mean(-1)
            u = (u - expect_len) ** 2 / (expect_len + 1e-12)
            loss += u.reshape(-1).mean() * (p * 100) ** 2
        return loss / len(percentages)

    got = float(losses.uniform_loss(jnp.asarray(pc)))
    want = float(np_uniform(pc))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_losses_differentiable(clouds):
    adv, ori, nrm = clouds
    ori_kappa = losses.get_kappa_ori(ori, nrm, k=4)

    def total(adv):
        adv_kappa, _ = losses.get_kappa_adv(adv, ori, nrm, k=4)
        return (
            losses.chamfer_loss(adv, ori).sum()
            + losses.hausdorff_loss(adv, ori).sum()
            + losses.curvature_loss(adv, ori, adv_kappa, ori_kappa).sum()
        )

    g = jax.grad(total)(jnp.asarray(adv))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
