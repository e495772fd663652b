"""Tests for the point-removal defenses + masked-classification path and the
smoothness measurement."""

import jax
import jax.numpy as jnp
import numpy as np

from geoa3_tpu import defense, measurement, models


def np_mean_knn_dist(pc, k):
    d = np.sqrt(((pc[:, :, None, :] - pc[:, None, :, :]) ** 2).sum(-1) + 1e-20)
    s = np.sort(d, axis=-1)[..., 1 : k + 1]
    return s.mean(-1)


class TestDefenses:
    def test_random_drop_shapes_and_subset(self, rng):
        pc = rng.randn(2, 64, 3).astype(np.float32)
        res = defense.random_drop(jnp.asarray(pc), 16, jax.random.PRNGKey(0))
        assert res.pc.shape == (2, 48, 3)
        assert (np.asarray(res.num_dropped) == 16).all()
        # kept points are a subset of the originals
        for b in range(2):
            out = np.asarray(res.pc[b])
            dd = ((out[:, None, :] - pc[b][None, :, :]) ** 2).sum(-1)
            assert (dd.min(1) < 1e-12).all()

    def test_outliers_fix_num_removes_farthest(self, rng):
        pc = rng.randn(1, 60, 3).astype(np.float32) * 0.1
        pc[0, :4] += 5.0  # 4 blatant outliers
        res = defense.outliers_fix_num(jnp.asarray(pc), drop_num=4, outlier_knn=2)
        assert res.pc.shape == (1, 56, 3)
        out = np.asarray(res.pc[0])
        assert np.abs(out).max() < 3.0  # outliers gone
        # matches the numpy oracle of kept indices
        dis = np_mean_knn_dist(pc, 2)[0]
        keep = np.sort(np.argsort(dis)[:56])
        np.testing.assert_allclose(out, pc[0][keep], atol=1e-6)

    def test_outliers_variance_compacts_kept_points(self, rng):
        pc = rng.randn(1, 60, 3).astype(np.float32) * 0.1
        pc[0, :3] += 5.0  # 3 blatant outliers at the FRONT
        res = defense.outliers_variance(jnp.asarray(pc), alpha=1.1, outlier_knn=2)
        mask = np.asarray(res.keep_mask[0])
        n_drop = int(res.num_dropped[0])
        assert n_drop >= 3
        assert mask.sum() == 60 - n_drop
        # suffix mask: kept slots first
        assert mask[: 60 - n_drop].all() and not mask[60 - n_drop :].any()
        # compaction equals the reference's masked_select: kept points in
        # original index order
        dis = np_mean_knn_dist(pc, 2)[0]
        thr = dis.mean() + 1.1 * dis.std(ddof=1)
        want = pc[0][dis < thr]
        out = np.asarray(res.pc[0])
        np.testing.assert_allclose(out[: len(want)], want, atol=1e-6)
        # padded tail is copies of the first kept point
        np.testing.assert_allclose(
            out[len(want) :], want[0][None].repeat(60 - len(want), 0)
        )

    def test_point_removal_dispatch(self, rng):
        pc = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        r1 = defense.point_removal(pc, "rand_drop", 4, 1.1, 2, jax.random.PRNGKey(0))
        r2 = defense.point_removal(pc, "outliers_fixNum", 4, 1.1, 2)
        r3 = defense.point_removal(pc, "outliers_variance", 4, 1.1, 2)
        assert r1.pc.shape == (1, 28, 3)
        assert r2.pc.shape == (1, 28, 3)
        assert r3.pc.shape == (1, 32, 3)


class TestMaskedClassification:
    def test_point_mask_matches_physical_removal(self, rng):
        """PointNet(point_mask) == PointNet on the physically shrunken cloud
        when the removed points sit at the END (conv5 locality caveat)."""
        model = models.PointNet(classes=10)
        pc_small = rng.randn(1, 48, 3).astype(np.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(pc_small), train=False
        )
        want = np.asarray(model.apply(variables, jnp.asarray(pc_small), train=False))

        # pad with copies of the first point at the end + mask them out
        pad = np.repeat(pc_small[:, :1, :], 16, axis=1)
        pc_padded = np.concatenate([pc_small, pad], axis=1)
        mask = np.zeros((1, 64), bool)
        mask[:, :48] = True
        got = np.asarray(
            model.apply(
                variables,
                jnp.asarray(pc_padded),
                train=False,
                point_mask=jnp.asarray(mask),
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


    def test_pnpp_padded_variance_matches_shrunk(self, rng):
        """PN++ on the variance-defense PADDED cloud (no mask) must equal PN++
        on the physically shrunken cloud, the reference semantics
        (defense.py:30-35 materialises the shrunk cloud).

        Why this holds: padding = copies of the FIRST kept point in the
        SUFFIX. CUDA-FPS starts at index 0, so the duplicates carry running
        min-dist 0 and are never selected while any real point is farther;
        ball query pads empty slots with the FIRST in-radius hit, whose
        coords equal the duplicates' coords, so grouped values match slot
        for slot. Hence logits are identical — the padding is neutral for
        FPS/ball-query models, not just max-pool ones.
        """
        model = models.PointNet2ClassificationSSG(classes=10)
        n = 600  # > SA1's 512 FPS samples so selection is non-degenerate
        pc = rng.randn(2, n, 3).astype(np.float32) * 0.3
        pc[:, :4] += 4.0  # clear outliers at the front
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.asarray(pc), train=False
        )

        res = defense.outliers_variance(jnp.asarray(pc), alpha=1.1, outlier_knn=2)
        got = np.asarray(model.apply(variables, res.pc, train=False))

        for b in range(2):
            kept = int(np.asarray(res.keep_mask[b]).sum())
            shrunk = np.asarray(res.pc[b, :kept])[None]
            want = np.asarray(
                model.apply(variables, jnp.asarray(shrunk), train=False)
            )[0]
            np.testing.assert_allclose(got[b], want, atol=1e-4, rtol=1e-4)


class TestSmoothness:
    def test_smoothness_plane_vs_noise(self, rng):
        # gently curved sheet is smoother than a gaussian blob
        sheet = np.zeros((1, 128, 3), np.float32)
        sheet[0, :, :2] = rng.randn(128, 2)
        sheet[0, :, 2] = 0.05 * sheet[0, :, 0] ** 2
        blob = rng.randn(1, 128, 3).astype(np.float32)
        s_sheet = float(measurement.smoothness(jnp.asarray(sheet), k=8, k2=8)[0])
        s_blob = float(measurement.smoothness(jnp.asarray(blob), k=8, k2=8)[0])
        assert s_sheet < s_blob

    def test_smoothness_batched(self, rng):
        pc = rng.randn(3, 64, 3).astype(np.float32)
        s = measurement.smoothness(jnp.asarray(pc), k=8, k2=8)
        assert s.shape == (3,)
        assert np.isfinite(np.asarray(s)).all()
