"""Pallas kernel tests (interpreter mode, so they run in the CPU test suite).

On real TPU hardware the same kernels are exercised through ops.knn_points /
ops.furthest_point_sampling via the auto backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from geoa3_tpu.ops.pallas.fps_kernel import fps_pallas
from geoa3_tpu.ops.pallas.knn_kernel import knn_pallas, knn_pallas_planes
from tests.test_ops import np_fps_cuda, np_knn


@pytest.fixture
def clouds(rng):
    q = rng.randn(2, 96, 3).astype(np.float32)
    p = rng.randn(2, 128, 3).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(p)


class TestKnnKernel:
    def test_matches_bruteforce(self, clouds):
        q, p = clouds
        with pltpu.force_tpu_interpret_mode():
            out = knn_pallas(q, p, 5, row_block=32)
        nd, ni = np_knn(np.asarray(q), np.asarray(p), 5)
        np.testing.assert_array_equal(np.asarray(out.idx), ni)
        np.testing.assert_allclose(np.asarray(out.dists), nd, atol=1e-3)
        # neighbour coords are exact row copies
        want = np.stack(
            [np.asarray(p)[b][ni[b]] for b in range(2)]
        )
        np.testing.assert_array_equal(np.asarray(out.nbrs), want)

    def test_planes_match_stacked(self, clouds):
        q, p = clouds
        with pltpu.force_tpu_interpret_mode():
            out = knn_pallas(q, p, 4, row_block=32)
            idx, x, y, z = knn_pallas_planes(q, p, 4, row_block=32)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(out.idx))
        np.testing.assert_array_equal(np.asarray(x), np.asarray(out.nbrs[..., 0]))
        np.testing.assert_array_equal(np.asarray(z), np.asarray(out.nbrs[..., 2]))

    def test_row_padding(self, rng):
        # n not divisible by row_block
        q = jnp.asarray(rng.randn(1, 50, 3).astype(np.float32))
        p = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            out = knn_pallas(q, p, 3, row_block=32)
        nd, ni = np_knn(np.asarray(q), np.asarray(p), 3)
        np.testing.assert_array_equal(np.asarray(out.idx), ni)


class TestFpsKernel:
    def test_matches_cuda_semantics(self, rng):
        xyz = jnp.asarray(rng.randn(3, 64, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            idx = fps_pallas(xyz, 16)
        np.testing.assert_array_equal(
            np.asarray(idx), np_fps_cuda(np.asarray(xyz), 16)
        )

    def test_mag_skip_and_no_skip(self, rng):
        xyz = np.zeros((1, 16, 3), np.float32)
        xyz[0, 0] = [0.01, 0, 0]
        xyz[0, 1] = [0, 0.01, 0]
        xyz[0, 2:] = rng.randn(14, 3) + 2.0
        with pltpu.force_tpu_interpret_mode():
            idx = np.asarray(fps_pallas(jnp.asarray(xyz), 6))
            idx_noskip = np.asarray(
                fps_pallas(jnp.asarray(xyz), 6, skip_near_origin=False)
            )
        assert 1 not in idx[0].tolist()  # near-origin point skipped
        # without the skip, the near-origin point IS reachable (it is far
        # from the +2 cluster)
        assert 1 in idx_noskip[0].tolist() or 0 in idx_noskip[0].tolist()

    def test_random_start(self, rng):
        xyz = jnp.asarray(rng.randn(2, 48, 3).astype(np.float32))
        start = jnp.asarray([7, 13], jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            idx = np.asarray(fps_pallas(xyz, 8, start=start, skip_near_origin=False))
        assert idx[0, 0] == 7 and idx[1, 0] == 13

    def test_single_batch_padding(self, rng):
        xyz = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            idx = np.asarray(fps_pallas(xyz, 8))
        np.testing.assert_array_equal(idx, np_fps_cuda(np.asarray(xyz), 8))


class TestScatterKernel:
    def test_scatter_matches_xla(self, rng):
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_pallas

        b, n, k, m = 2, 64, 5, 256
        idx = jnp.asarray(rng.randint(0, m, (b, n, k)), jnp.int32)
        ct = jnp.asarray(rng.randn(b, n, k, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = scatter_add_pallas(idx, ct, m)
        want = (
            jnp.zeros((b, m, 3))
            .at[jnp.arange(b)[:, None, None], idx]
            .add(ct)
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_gather_grad_uses_scatter_consistently(self, rng):
        """knn_points nbr gradients equal the take_along_axis formulation."""
        from geoa3_tpu import ops

        q = jnp.asarray(rng.randn(1, 48, 3).astype(np.float32))

        def f(p):
            return ops.knn_points(q, p, k=4).nbrs.sum()

        p = jnp.asarray(rng.randn(1, 64, 3).astype(np.float32))
        g = jax.grad(f)(p)
        # reference: gather counts per index
        idx = np.asarray(ops.knn_points(q, p, k=4).idx)
        counts = np.zeros((1, 64))
        for i in idx.reshape(-1):
            counts[0, i] += 1
        np.testing.assert_allclose(
            np.asarray(g), counts[..., None].repeat(3, -1), atol=1e-5
        )


class TestNN1DualKernel:
    def test_matches_argmin(self, rng):
        from geoa3_tpu.ops.pallas.nn1_kernel import nn1_dual_pallas

        adv = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        ori = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            a2o, o2a = nn1_dual_pallas(adv, ori, row_block=32)
        d = ((np.asarray(adv)[:, :, None] - np.asarray(ori)[:, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(a2o), d.argmin(-1))
        np.testing.assert_array_equal(np.asarray(o2a), d.argmin(-2))

    def test_packed_select_matches_argmin(self, rng):
        """GEOA3_NN1_SELECT=packed: single-reduction argmins over quantised
        bits — on random (tie-free at 2^-13) data the indices must match the
        exact argmin."""
        from geoa3_tpu.ops.pallas.nn1_kernel import nn1_dual_pallas

        adv = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        ori = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            a2o, o2a = nn1_dual_pallas(adv, ori, row_block=32, select="packed")
        d = ((np.asarray(adv)[:, :, None] - np.asarray(ori)[:, None]) ** 2).sum(-1)
        assert (np.asarray(a2o) == d.argmin(-1)).mean() > 0.999
        assert (np.asarray(o2a) == d.argmin(-2)).mean() > 0.999

    def test_packed_payload_matches(self, rng):
        from geoa3_tpu.ops.pallas.nn1_kernel import nn1_dual_payload_pallas

        adv = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        ori = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
        pay = jnp.asarray(rng.randn(2, 8, 96).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            a2o, o2a, gp, op = nn1_dual_payload_pallas(
                adv, ori, pay, row_block=32, select="packed"
            )
        d = ((np.asarray(adv)[:, :, None] - np.asarray(ori)[:, None]) ** 2).sum(-1)
        assert (np.asarray(a2o) == d.argmin(-1)).mean() > 0.999
        # payload copies are exact at whatever index the select picked
        want = np.take_along_axis(
            np.asarray(pay), np.asarray(a2o)[:, None, :], axis=-1
        )
        np.testing.assert_array_equal(np.asarray(gp), want)
        # o2a-side adv-coordinate planes: exact copies at the o2a pick,
        # rows 3..7 zero
        sel = np.asarray(adv)[
            np.arange(2)[:, None], np.asarray(o2a)
        ].transpose(0, 2, 1)  # [b, 3, m]
        np.testing.assert_array_equal(np.asarray(op)[:, :3], sel)
        np.testing.assert_array_equal(np.asarray(op)[:, 3:], 0.0)


class TestScatterNC:
    def test_nc_scatter_matches_xla(self, rng):
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_nc_pallas

        b, S, C, m = 2, 200, 7, 256
        idx = jnp.asarray(rng.randint(0, m, (b, S)), jnp.int32)
        ct = jnp.asarray(rng.randn(b, S, C).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = scatter_add_nc_pallas(idx, ct, m, src_chunk=64)
        want = (
            jnp.zeros((b, m, C)).at[jnp.arange(b)[:, None], idx].add(ct)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-2
        )

    def test_group_points_grad_matches_reference_counts(self, rng):
        from geoa3_tpu import ops

        feats = jnp.asarray(rng.randn(1, 16, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 16, (1, 5, 3)), jnp.int32)
        g = jax.grad(lambda f: ops.group_points(f, idx).sum())(feats)
        counts = np.zeros((1, 16))
        for i in np.asarray(idx).reshape(-1):
            counts[0, i] += 1
        np.testing.assert_allclose(
            np.asarray(g), counts[..., None].repeat(4, -1), atol=1e-5
        )


class TestScatter3T:
    def test_3t_scatter_matches_xla(self, rng):
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_3t_pallas

        b, S, m = 2, 200, 256
        idx = jnp.asarray(rng.randint(0, m, (b, S)), jnp.int32)
        ct = jnp.asarray(rng.randn(b, S, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = scatter_add_3t_pallas(idx, ct, m, src_chunk=64)
        want = (
            jnp.zeros((b, m, 3)).at[jnp.arange(b)[:, None], idx].add(ct)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-2
        )

    def test_3t_scatter_multi_mblock_and_pad(self, rng):
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_3t_pallas

        b, S, m = 1, 130, 512  # S not divisible by chunk; m needs 2 blocks
        idx = jnp.asarray(rng.randint(0, m, (b, S)), jnp.int32)
        ct = jnp.asarray(rng.randn(b, S, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = scatter_add_3t_pallas(idx, ct, m, src_chunk=64)
        want = (
            jnp.zeros((b, m, 3)).at[jnp.arange(b)[:, None], idx].add(ct)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=1e-2
        )


class TestGroupMLPKernel:
    """Fused SA MLP+maxpool vs the unfused composition (interpret mode)."""

    def _unfused(self, gx4, gf4, ws_and_bs):
        # gx4 [b,m,ns,3], gf4 [b,m,ns,cf]|None; same folded affine+relu stack
        x = gx4 if gf4 is None else jnp.concatenate([gx4, gf4], axis=-1)
        for i in range(3):
            w, bias = ws_and_bs[2 * i], ws_and_bs[2 * i + 1]
            x = jax.nn.relu(x @ w + bias[0])
        return jnp.max(x, axis=2)

    def _planes(self, gx4):
        b, m, ns, _ = gx4.shape
        gxp = gx4.transpose(0, 3, 1, 2).reshape(b, 3, m * ns)
        return jnp.concatenate(
            [gxp, jnp.zeros((b, 5, m * ns), gxp.dtype)], axis=1
        )

    def _make(self, rng, b, m, ns, cf, widths):
        gx = jnp.asarray(rng.randn(b, m, ns, 3).astype(np.float32))
        gf = (
            jnp.asarray(rng.randn(b, m, ns, cf).astype(np.float32))
            if cf
            else None
        )
        ws = []
        cin = 3 + cf
        for w_ in widths:
            ws.append(jnp.asarray(rng.randn(cin, w_).astype(np.float32) * 0.3))
            ws.append(jnp.asarray(rng.randn(1, w_).astype(np.float32) * 0.1))
            cin = w_
        return gx, gf, tuple(ws)

    @pytest.mark.parametrize(
        "m,ns,cf,widths",
        [
            (16, 8, 0, (16, 16, 32)),       # SA1-like, xyz only
            (8, 8, 128, (32, 32, 64)),      # SA2-like, tuple input
            (1, 16, 128, (32, 64, 128)),    # GroupAll-like (m=1)
        ],
    )
    def test_forward_matches_unfused(self, rng, m, ns, cf, widths):
        from geoa3_tpu.ops.pallas.group_mlp_kernel import group_mlp_maxpool

        gx, gf, ws = self._make(rng, 2, m, ns, cf, widths)
        ref = self._unfused(gx, gf, ws)
        out = group_mlp_maxpool(self._planes(gx), gf, ns, True, ws)
        # split-bf16 3-pass contract: ~2^-18 per-product error accumulating
        # over the contraction dim (see kernel docstring)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_grad_matches_unfused(self, rng):
        from geoa3_tpu.ops.pallas.group_mlp_kernel import group_mlp_maxpool

        m, ns, cf, widths = 8, 8, 128, (32, 32, 64)
        gx, gf, ws = self._make(rng, 2, m, ns, cf, widths)
        tgt = jnp.asarray(rng.randn(2, m, widths[-1]).astype(np.float32))

        def loss_ref(gx4, gf4):
            return jnp.sum((self._unfused(gx4, gf4, ws) - tgt) ** 2)

        def loss_fused(gx4, gf4):
            out = group_mlp_maxpool(self._planes(gx4), gf4, ns, True, ws)
            return jnp.sum((out - tgt) ** 2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(gx, gf)
        gk = jax.grad(loss_fused, argnums=(0, 1))(gx, gf)
        np.testing.assert_allclose(
            np.asarray(gk[0]), np.asarray(gr[0]), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(gk[1]), np.asarray(gr[1]), rtol=2e-3, atol=2e-3
        )

    def test_grad_with_maxpool_ties(self, rng):
        """Duplicate neighbours (ball-query padding) create exact max-pool
        ties; the kernel must split gradients evenly like jnp.max's VJP."""
        from geoa3_tpu.ops.pallas.group_mlp_kernel import group_mlp_maxpool

        m, ns, widths = 8, 8, (16, 16, 32)
        gx, _, ws = self._make(rng, 2, m, ns, 0, widths)
        gx = gx.at[:, :, 1::2].set(gx[:, :, ::2])  # every row duplicated

        def loss_ref(gx4):
            return jnp.sum(self._unfused(gx4, None, ws) ** 2)

        def loss_fused(gx4):
            return jnp.sum(
                group_mlp_maxpool(self._planes(gx4), None, ns, True, ws) ** 2
            )

        gr = jax.grad(loss_ref)(gx)
        gk = jax.grad(loss_fused)(gx)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=3e-4, atol=3e-4
        )

    def test_model_forced_fusion_matches_unfused(self, rng, monkeypatch):
        """PN++ SSG logits with the fused SA path forced on (interpret mode)
        must match the unfused eval forward."""
        import geoa3_tpu.ops.pallas.group_mlp_kernel as gmk
        from geoa3_tpu.models.pointnetpp import PointNet2ClassificationSSG

        model = PointNet2ClassificationSSG(classes=40)
        pc = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
        variables = model.init({"params": jax.random.PRNGKey(0)}, pc, train=False)
        ref = model.apply(variables, pc, train=False)
        monkeypatch.setenv("GEOA3_ENABLE_GROUPMLP", "1")
        monkeypatch.setattr(gmk, "pallas_available", lambda: True)
        fused = model.apply(variables, pc, train=False)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=5e-4, atol=5e-4
        )


class TestPoolMatmulKernel:
    """Fused affine+maxpool kernel vs unfused XLA (interpret mode)."""

    def _make(self, rng, b, n, cin, cout, taps=1):
        x = jnp.asarray(rng.randn(b, n, cin).astype(np.float32))
        shape = (taps, cin, cout)
        w = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.2)
        bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
        return x, w, bias

    @staticmethod
    def _oracle_global(x, w, bias):
        z = jnp.einsum("bnc,cd->bnd", x, w[0]) + bias
        return jnp.max(z, axis=1, keepdims=True)

    @staticmethod
    def _oracle_conv3(x, w, bias):
        xm1 = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        xp1 = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:]
        z = (
            jnp.einsum("bnc,cd->bnd", xm1, w[0])
            + jnp.einsum("bnc,cd->bnd", x, w[1])
            + jnp.einsum("bnc,cd->bnd", xp1, w[2])
            + bias
        )
        return jnp.max(z, axis=1, keepdims=True)

    @staticmethod
    def _oracle_seg(x, w, bias, seg):
        b, r, cin = x.shape
        z = jnp.einsum("bnc,cd->bnd", x, w[0]) + bias
        return jnp.max(z.reshape(b, r // seg, seg, -1), axis=2)

    def test_global_pool_matches_oracle(self, rng):
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import pool_affine_max

        x, w, bias = self._make(rng, 2, 64, 128, 256)
        ref = self._oracle_global(x, w, bias)
        out = pool_affine_max(x, w, bias, 0, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
        gr = jax.grad(lambda x: jnp.sum(self._oracle_global(x, w, bias) ** 2))(x)
        gk = jax.grad(lambda x: jnp.sum(pool_affine_max(x, w, bias, 0, True) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=2e-3
        )

    def test_conv3_pool_matches_oracle(self, rng):
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import pool_affine_max

        x, w, bias = self._make(rng, 2, 64, 128, 256, taps=3)
        ref = self._oracle_conv3(x, w, bias)
        out = pool_affine_max(x, w, bias, 0, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
        gr = jax.grad(lambda x: jnp.sum(self._oracle_conv3(x, w, bias) ** 2))(x)
        gk = jax.grad(lambda x: jnp.sum(pool_affine_max(x, w, bias, 0, True) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=2e-3
        )

    def test_conv3_matches_flax_conv(self, rng):
        """Tap orientation against the real nn.Conv SAME-padding semantics."""
        import flax.linen as fnn
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import pool_affine_max

        x, w, bias = self._make(rng, 2, 32, 128, 128, taps=3)
        conv = fnn.Conv(128, kernel_size=(3,), padding=[(1, 1)])
        ref = jnp.max(
            conv.apply({"params": {"kernel": w, "bias": bias}}, x), axis=1
        )
        out = pool_affine_max(x, w, bias, 0, True)[:, 0]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )

    def test_segmented_pool_with_ties(self, rng):
        """Duplicate rows inside segments (ball-query first-hit padding)
        create exact ties; gradients must split like jnp.max's VJP."""
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import pool_affine_max

        g, s = 16, 8
        x, w, bias = self._make(rng, 2, g * s, 64, 128)
        x4 = x.reshape(2, g, s, 64)
        x4 = x4.at[:, :, 1::2].set(x4[:, :, ::2])  # every row duplicated
        x = x4.reshape(2, g * s, 64)
        ref = self._oracle_seg(x, w, bias, s)
        out = pool_affine_max(x, w, bias, s, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
        gr = jax.grad(lambda x: jnp.sum(self._oracle_seg(x, w, bias, s) ** 2))(x)
        gk = jax.grad(lambda x: jnp.sum(pool_affine_max(x, w, bias, s, True) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=2e-3, atol=2e-3
        )

    def test_pointnet_forced_fusion_matches_unfused(self, rng, monkeypatch):
        """PointNet logits with the fused pools forced on (interpret mode)
        must match the unfused eval forward."""
        import geoa3_tpu.ops.pallas.pool_matmul_kernel as pmk
        from geoa3_tpu.models.pointnet import PointNet

        model = PointNet(classes=40, npoint=256)
        pc = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, pc, train=False
        )
        ref = model.apply(variables, pc, train=False)
        monkeypatch.setattr(pmk, "pallas_available", lambda: True)
        fused = model.apply(variables, pc, train=False)
        assert not np.allclose(0, np.asarray(ref))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=5e-4, atol=5e-4
        )
        # input gradients through all three fused pools
        gr = jax.grad(
            lambda p: jnp.sum(model.apply(variables, p, train=False) ** 2)
        )(pc)
        monkeypatch.undo()
        gk_ref = jax.grad(
            lambda p: jnp.sum(model.apply(variables, p, train=False) ** 2)
        )(pc)
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gk_ref), rtol=5e-3, atol=5e-3
        )

    def test_pnpp_last_pool_forced_matches_unfused(self, rng, monkeypatch):
        """PN++ SSG with the fused last-layer pool forced on must match."""
        import geoa3_tpu.ops.pallas.pool_matmul_kernel as pmk
        from geoa3_tpu.models.pointnetpp import PointNet2ClassificationSSG

        model = PointNet2ClassificationSSG(classes=40)
        pc = jnp.asarray(rng.randn(2, 256, 3).astype(np.float32))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, pc, train=False
        )
        ref = model.apply(variables, pc, train=False)
        monkeypatch.setattr(pmk, "pallas_available", lambda: True)
        fused = model.apply(variables, pc, train=False)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=5e-4, atol=5e-4
        )


class TestAmbientPrecisionPinned:
    """The kernels' engineered bf16 dot passes must be invariant under
    ambient jax.default_matmul_precision — HIGHEST on bf16 operands is
    rejected outright by Mosaic on real TPU (observed: 'Bad lhs type' when
    differentiating PN++ under a default_matmul_precision('highest')
    context), and any silent override would change the kernels' accuracy
    contract. All kernel dots pin precision explicitly (_PDEF)."""

    def test_scatter_invariant_under_highest(self, rng):
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_pallas

        b, n, k, m = 2, 64, 5, 256
        idx = jnp.asarray(rng.randint(0, m, (b, n, k)), jnp.int32)
        ct = jnp.asarray(rng.randn(b, n, k, 3).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            base = scatter_add_pallas(idx, ct, m)
            with jax.default_matmul_precision("highest"):
                amb = scatter_add_pallas(idx, ct, m)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(amb))

    def test_pool_kernel_invariant_under_highest(self, rng):
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import pool_affine_max

        x = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 128, 128).astype(np.float32))
        b = jnp.asarray(rng.randn(128).astype(np.float32))

        def f(x):
            return jnp.sum(pool_affine_max(x, w, b, 8, True) ** 2)

        base, gbase = jax.value_and_grad(f)(x)
        with jax.default_matmul_precision("highest"):
            amb, gamb = jax.value_and_grad(f)(x)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(amb))
        np.testing.assert_array_equal(np.asarray(gbase), np.asarray(gamb))


class TestBallQueryGroupKernel:
    """Fused ball-query+group kernel vs the ball_query/group_points oracle
    (interpret mode). Semantics under test: first-nsample hits in index
    order, first-hit padding, empty-ball -> index 0, center-subtract,
    feature grouping, and the matmul-scatter VJP."""

    def _oracle(self, radius, ns, xyz, new_xyz, feats):
        from geoa3_tpu import ops

        idx = ops.ball_query(radius, ns, xyz, new_xyz)
        gx = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        gf = ops.group_points(feats, idx) if feats is not None else None
        return gx, gf

    def _planes_to_4d(self, gxp, m, ns):
        b = gxp.shape[0]
        return jnp.transpose(
            gxp[:, :3, :].reshape(b, 3, m, ns), (0, 2, 3, 1)
        )

    @pytest.mark.parametrize(
        "n,m,ns,cf,radius",
        [(256, 64, 32, 0, 0.4), (256, 32, 16, 128, 0.5)],
    )
    def test_matches_oracle(self, rng, n, m, ns, cf, radius):
        from geoa3_tpu.ops.pallas.ballquery_group_kernel import (
            ball_query_group_planes,
        )

        xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 0.5)
        # centers are members of xyz (the FPS contract)
        new_xyz = xyz[:, :m]
        feats = (
            jnp.asarray(rng.randn(2, n, cf).astype(np.float32))
            if cf else None
        )
        gxp, gf = ball_query_group_planes(radius, ns, True, xyz, new_xyz, feats)
        want_gx, want_gf = self._oracle(radius, ns, xyz, new_xyz, feats)
        got_gx = self._planes_to_4d(gxp, m, ns)
        np.testing.assert_array_equal(np.asarray(got_gx), np.asarray(want_gx))
        assert not np.asarray(gxp[:, 3:]).any()
        if cf:
            np.testing.assert_array_equal(np.asarray(gf), np.asarray(want_gf))

    def test_empty_and_overfull_balls(self, rng):
        from geoa3_tpu.ops.pallas.ballquery_group_kernel import (
            ball_query_group_planes,
        )

        n, m, ns = 256, 32, 16
        xyz = np.zeros((1, n, 3), np.float32)
        xyz[0, :, 0] = np.linspace(0.0, 10.0, n)  # a line: sparse far end
        xyz[0, :64] = rng.randn(64, 3) * 0.01  # dense cluster: overfull
        xyz = jnp.asarray(xyz)
        new_xyz = jnp.asarray(
            np.concatenate(
                [np.asarray(xyz[:, :16]),
                 np.full((1, 16, 3), 100.0, np.float32)],  # empty balls
                axis=1,
            )
        )
        gxp, _ = ball_query_group_planes(0.3, ns, True, xyz, new_xyz, None)
        want_gx, _ = self._oracle(0.3, ns, xyz, new_xyz, None)
        got_gx = self._planes_to_4d(gxp, m, ns)
        np.testing.assert_array_equal(np.asarray(got_gx), np.asarray(want_gx))

    def test_grad_matches_oracle(self, rng):
        from geoa3_tpu.ops.pallas.ballquery_group_kernel import (
            ball_query_group_planes,
        )

        n, m, ns, cf = 256, 32, 16, 128
        xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 0.5)
        new_xyz = xyz[:, :m]
        feats = jnp.asarray(rng.randn(2, n, cf).astype(np.float32))
        wx = jnp.asarray(rng.randn(2, 8, m * ns).astype(np.float32))
        wf = jnp.asarray(rng.randn(2, m, ns, cf).astype(np.float32))

        def loss_kernel(xyz, new_xyz, feats):
            gxp, gf = ball_query_group_planes(0.5, ns, True, xyz, new_xyz, feats)
            return jnp.sum(gxp * wx) + jnp.sum(gf * wf)

        def loss_oracle(xyz, new_xyz, feats):
            gx, gf = self._oracle(0.5, ns, xyz, new_xyz, feats)
            gxp = jnp.concatenate(
                [
                    jnp.transpose(gx, (0, 3, 1, 2)).reshape(2, 3, m * ns),
                    jnp.zeros((2, 5, m * ns)),
                ],
                axis=1,
            )
            return jnp.sum(gxp * wx) + jnp.sum(gf * wf)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(xyz, new_xyz, feats)
        go = jax.grad(loss_oracle, argnums=(0, 1, 2))(xyz, new_xyz, feats)
        # scatter runs 2-split bf16 passes (~2^-16 relative, the
        # scatter_kernel contract) — not bitwise
        for a, b, tag in zip(gk, go, ("xyz", "new_xyz", "feats")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                err_msg=tag,
            )


class TestFusedQueryGroupPipeline:
    """Full fused pipeline (ball-query+group kernel -> fused SA MLP) forced
    on in interpret mode: PN++ SSG logits AND input grads must match the
    unfused eval path."""

    @pytest.mark.slow  # interpret-mode whole-model fwd+grad at the
    # production n=1024 shapes: ~2 min; the kernel-level oracle tests keep
    # the fast-path coverage
    def test_ssg_logits_and_grads_match(self, rng, monkeypatch):
        import geoa3_tpu.ops.pallas.ballquery_group_kernel as bqk
        import geoa3_tpu.ops.pallas.group_mlp_kernel as gmk
        from geoa3_tpu.models.pointnetpp import PointNet2ClassificationSSG

        model = PointNet2ClassificationSSG(classes=40)
        # n=1024 so every SA shape matches the production attack shapes
        # (and the bqgroup n % 128 gate)
        pc = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32) * 0.5)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, pc, train=False
        )

        def f(p):
            return model.apply(variables, p, train=False)

        ref = f(pc)
        gref = jax.grad(lambda p: jnp.sum(f(p) ** 2))(pc)
        monkeypatch.setattr(gmk, "pallas_available", lambda: True)
        monkeypatch.setattr(bqk, "pallas_available", lambda: True)
        fused = f(pc)
        gfused = jax.grad(lambda p: jnp.sum(f(p) ** 2))(pc)
        assert not np.allclose(0, np.asarray(gref))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=5e-4, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(gfused), np.asarray(gref), rtol=5e-3, atol=5e-3
        )


class TestSAFusedKernel:
    """Fully-fused SA kernel (ball-query + projected grouping + MLP + pool)
    vs the unfused oracle (interpret mode)."""

    def _make_params(self, rng, cf, widths):
        ws = []
        cin = 3 + cf
        for w_ in widths:
            ws.append(jnp.asarray(rng.randn(cin, w_).astype(np.float32) * 0.3))
            ws.append(jnp.asarray(rng.randn(1, w_).astype(np.float32) * 0.1))
            cin = w_
        return tuple(ws)

    def _oracle(self, radius, ns, xyz, new_xyz, feats, ws):
        from geoa3_tpu import ops

        idx = ops.ball_query(radius, ns, xyz, new_xyz)
        gx = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        h = gx
        if feats is not None:
            h = jnp.concatenate([gx, ops.group_points(feats, idx)], axis=-1)
        for i in range(0, len(ws), 2):
            h = jnp.maximum(h @ ws[i] + ws[i + 1][0], 0.0)
        return jnp.max(h, axis=2)

    @pytest.mark.parametrize(
        "n,m,ns,cf,widths,radius",
        [
            (256, 64, 32, 0, (16, 16, 32), 0.4),    # SSG SA1-like
            (256, 32, 16, 128, (32, 32, 64), 0.5),  # SSG SA2-like
            (256, 32, 16, 320, (32, 32, 64), 0.5),  # MSG SA2-like (cf!%128)
        ],
    )
    def test_matches_oracle(self, rng, n, m, ns, cf, widths, radius):
        from geoa3_tpu.ops.pallas.sa_fused_kernel import sa_query_group_mlp

        xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 0.5)
        new_xyz = xyz[:, :m]  # centers are members of xyz (FPS contract)
        feats = (
            jnp.asarray(rng.randn(2, n, cf).astype(np.float32))
            if cf else None
        )
        ws = self._make_params(rng, cf, widths)
        out = sa_query_group_mlp(radius, ns, True, xyz, new_xyz, feats, ws)
        want = self._oracle(radius, ns, xyz, new_xyz, feats, ws)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_empty_and_overfull_balls(self, rng):
        from geoa3_tpu.ops.pallas.sa_fused_kernel import sa_query_group_mlp

        n, m, ns = 256, 32, 16
        xyz = np.zeros((1, n, 3), np.float32)
        xyz[0, :, 0] = np.linspace(0.0, 10.0, n)  # sparse far end
        xyz[0, :64] = rng.randn(64, 3) * 0.01  # dense cluster: overfull
        xyz = jnp.asarray(xyz)
        new_xyz = jnp.asarray(
            np.concatenate(
                [np.asarray(xyz[:, :16]),
                 np.full((1, 16, 3), 100.0, np.float32)],  # empty balls
                axis=1,
            )
        )
        ws = self._make_params(rng, 0, (16, 16, 32))
        out = sa_query_group_mlp(0.3, ns, True, xyz, new_xyz, None, ws)
        want = self._oracle(0.3, ns, xyz, new_xyz, None, ws)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_grad_matches_oracle(self, rng):
        from geoa3_tpu.ops.pallas.sa_fused_kernel import sa_query_group_mlp

        n, m, ns, cf = 256, 32, 16, 128
        widths = (32, 32, 64)
        xyz = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 0.5)
        new_xyz = xyz[:, :m]
        feats = jnp.asarray(rng.randn(2, n, cf).astype(np.float32))
        ws = self._make_params(rng, cf, widths)
        tgt = jnp.asarray(rng.randn(2, m, widths[-1]).astype(np.float32))

        def loss_kernel(xyz, new_xyz, feats):
            out = sa_query_group_mlp(0.5, ns, True, xyz, new_xyz, feats, ws)
            return jnp.sum((out - tgt) ** 2)

        def loss_oracle(xyz, new_xyz, feats):
            out = self._oracle(0.5, ns, xyz, new_xyz, feats, ws)
            return jnp.sum((out - tgt) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(xyz, new_xyz, feats)
        go = jax.grad(loss_oracle, argnums=(0, 1, 2))(xyz, new_xyz, feats)
        for a, b, tag in zip(gk, go, ("xyz", "new_xyz", "feats")):
            # grads run to ~150 in magnitude; atol must absorb rounding on
            # near-cancelled small elements (seen: 2.3e-3 on a 0.03 element)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-3,
                err_msg=tag,
            )

    def test_grad_with_duplicate_rows(self, rng):
        """Ball-query padding duplicates the first hit across slots; the
        pool's tie-split gradients must still match jnp.max semantics
        (duplicate-row shares scatter back to one source point)."""
        from geoa3_tpu.ops.pallas.sa_fused_kernel import sa_query_group_mlp

        n, m, ns = 256, 16, 16
        # tight radius around isolated points -> most balls hold only the
        # center: every slot past the first is a padded duplicate
        xyz = jnp.asarray(rng.randn(1, n, 3).astype(np.float32) * 5.0)
        new_xyz = xyz[:, :m]
        ws = self._make_params(rng, 0, (16, 16, 32))

        def loss_kernel(xyz, new_xyz):
            return jnp.sum(
                sa_query_group_mlp(0.1, ns, True, xyz, new_xyz, None, ws)
                ** 2
            )

        def loss_oracle(xyz, new_xyz):
            return jnp.sum(
                self._oracle(0.1, ns, xyz, new_xyz, None, ws) ** 2
            )

        gk = jax.grad(loss_kernel, argnums=(0, 1))(xyz, new_xyz)
        go = jax.grad(loss_oracle, argnums=(0, 1))(xyz, new_xyz)
        for a, b, tag in zip(gk, go, ("xyz", "new_xyz")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
                err_msg=tag,
            )


class TestSAFusedPipeline:
    """Whole-model forced fusion through the fully-fused SA kernel:
    logits AND input grads must match the unfused eval path."""

    @pytest.mark.slow  # interpret-mode whole-model grads: 67 s (ssg) /
    # 103 s (msg); the TestSAFusedKernel oracle tests stay in the fast path
    @pytest.mark.parametrize("arch", ["ssg", "msg"])
    def test_logits_and_grads_match(self, rng, monkeypatch, arch):
        import geoa3_tpu.ops.pallas.sa_fused_kernel as sak
        from geoa3_tpu.models.pointnetpp import (
            PointNet2ClassificationMSG,
            PointNet2ClassificationSSG,
        )

        cls = (
            PointNet2ClassificationSSG
            if arch == "ssg"
            else PointNet2ClassificationMSG
        )
        model = cls(classes=40)
        # n=1024 so every SA shape matches the production attack shapes
        pc = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32) * 0.5)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, pc, train=False
        )

        def f(p):
            return model.apply(variables, p, train=False)

        ref = f(pc)
        gref = jax.grad(lambda p: jnp.sum(f(p) ** 2))(pc)
        monkeypatch.setattr(sak, "pallas_available", lambda: True)
        fused = f(pc)
        gfused = jax.grad(lambda p: jnp.sum(f(p) ** 2))(pc)
        assert not np.allclose(0, np.asarray(gref))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=5e-4, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(gfused), np.asarray(gref), rtol=5e-3, atol=5e-3
        )


class TestNN1PayloadKernel:
    def test_matches_argmin_and_gather(self, rng):
        from geoa3_tpu.ops.pallas.nn1_kernel import nn1_dual_payload_pallas

        adv = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        ori = jnp.asarray(rng.randn(2, 96, 3).astype(np.float32))
        pay = jnp.asarray(rng.randn(2, 8, 96).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            a2o, o2a, gp, op = nn1_dual_payload_pallas(
                adv, ori, pay, row_block=32
            )
        d = ((np.asarray(adv)[:, :, None] - np.asarray(ori)[:, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(a2o), d.argmin(-1))
        np.testing.assert_array_equal(np.asarray(o2a), d.argmin(-2))
        want = np.take_along_axis(
            np.asarray(pay), d.argmin(-1)[:, None, :], axis=-1
        )
        # payload copies are EXACT (3-split one-hot dots)
        np.testing.assert_array_equal(np.asarray(gp), want)
        # o2a-side adv-coordinate planes: exact copies, rows 3..7 zero —
        # the multi-row-block fold (64/32 = 2 blocks) must pick the same
        # winner as the argmin
        sel = np.asarray(adv)[
            np.arange(2)[:, None], d.argmin(-2)
        ].transpose(0, 2, 1)
        np.testing.assert_array_equal(np.asarray(op)[:, :3], sel)
        np.testing.assert_array_equal(np.asarray(op)[:, 3:], 0.0)


class TestKappaKernel:
    """Fused self-kNN curvature kernel vs the composed path (which is what
    ops.knn_kappa runs on CPU, bit-equal to the engine's pre-fusion math)."""

    def _data(self, rng, b=2, n=256):
        cloud = rng.randn(b, n, 3).astype(np.float32)
        cloud /= np.linalg.norm(cloud, axis=-1, keepdims=True).max()
        nrm = rng.randn(b, n, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        return jnp.asarray(cloud), jnp.asarray(nrm)

    def test_forward_matches_composed(self, rng):
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng)
        with pltpu.force_tpu_interpret_mode():
            got = kappa_pallas(cloud, nrm, 16, 128)
        want = ops.knn_kappa(cloud, nrm, 16)  # composed path on CPU
        # expansion-vs-direct norm + lane-order mean: ~1e-3 relative bound
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5
        )

    def test_grad_matches_composed(self, rng):
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng)
        w = jnp.asarray(rng.randn(2, 256).astype(np.float32))

        def loss_kernel(c):
            return jnp.sum(kappa_pallas(c, nrm, 16, 128) * w)

        def loss_composed(c):
            return jnp.sum(ops.knn_kappa(c, nrm, 16) * w)

        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(loss_kernel)(cloud)
        go = jax.grad(loss_composed)(cloud)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=5e-3, atol=5e-4
        )

    def test_coincident_points(self, rng):
        """Exact duplicates: the dropped zero-distance slot contributes 0 in
        both formulations, and the self column's numerator is exactly 0."""
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng, b=1, n=128)
        cloud = np.array(cloud)
        cloud[0, 64] = cloud[0, 10]  # duplicate pair (indices 10 < 64)
        cloud[0, 65] = cloud[0, 10]
        cloud = jnp.asarray(cloud)
        with pltpu.force_tpu_interpret_mode():
            got = kappa_pallas(cloud, nrm, 8, 64)
        want = ops.knn_kappa(cloud, nrm, 8)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5
        )
        assert np.isfinite(np.asarray(got)).all()

    def test_padded_dense_matches_unpadded(self, rng):
        """Sentinel-padded dense path (ops.kappa_pallas_padded, the
        BASELINE-config-3 n=10000 prologue route): a lane-UNALIGNED cloud
        padded to the next 128-multiple must produce BITWISE the kappa and
        gradient of the composed path restricted to the real rows — real
        rows never select a far sentinel, and sentinel rows' cotangents
        are zero after the slice."""
        from geoa3_tpu.ops.knn import kappa_pallas_padded

        # n=200 pads to 256 (pad=56 < k+1=9: sentinel rows select real
        # points — the grad must STILL be unaffected because their
        # cotangents are zero)
        cloud, nrm = self._data(rng, b=2, n=200)
        w = jnp.asarray(rng.randn(2, 200).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = kappa_pallas_padded(cloud, nrm, 8, select="exact")
            gk = jax.grad(
                lambda c: jnp.sum(
                    kappa_pallas_padded(c, nrm, 8, select="exact") * w
                )
            )(cloud)
            # unpadded-kernel oracle at an aligned shape is impossible for
            # n=200; the composed path is the semantic oracle
        from geoa3_tpu import ops

        want = ops.knn_kappa(cloud, nrm, 8)
        gw = jax.grad(lambda c: jnp.sum(ops.knn_kappa(c, nrm, 8) * w))(cloud)
        assert got.shape == (2, 200)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gw), rtol=5e-3, atol=5e-4
        )

    def test_packed_select_forward(self, rng):
        """Packed single-reduction knockout (GEOA3_KAPPA_SELECT=packed):
        quantised-bit tie-breaks may swap near-tied neighbours, but kappa
        must stay inside the kernel's documented ~1e-3 tolerance."""
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng)
        with pltpu.force_tpu_interpret_mode():
            got = kappa_pallas(cloud, nrm, 16, 128, "packed")
        want = ops.knn_kappa(cloud, nrm, 16)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-5
        )

    def test_packed_select_grad(self, rng):
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng, b=1, n=128)
        w = jnp.asarray(rng.randn(1, 128).astype(np.float32))

        def loss_kernel(c):
            return jnp.sum(kappa_pallas(c, nrm, 8, 64, "packed") * w)

        def loss_composed(c):
            return jnp.sum(ops.knn_kappa(c, nrm, 8) * w)

        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(loss_kernel)(cloud)
        go = jax.grad(loss_composed)(cloud)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=5e-3, atol=5e-4
        )

    def test_packed_select_duplicates_finite(self, rng):
        """Exact duplicates: packed forward matches composed, and the
        kernel's analytic grad stays finite (the composed oracle itself
        NaNs here — 0-norm backward — so only the kernel is asserted)."""
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng, b=1, n=128)
        cloud = np.array(cloud)
        cloud[0, 64] = cloud[0, 10]
        cloud = jnp.asarray(cloud)
        w = jnp.asarray(rng.randn(1, 128).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = kappa_pallas(cloud, nrm, 8, 64, "packed")
            gk = jax.grad(
                lambda c: jnp.sum(kappa_pallas(c, nrm, 8, 64, "packed") * w)
            )(cloud)
        want = ops.knn_kappa(cloud, nrm, 8)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-5
        )
        assert np.isfinite(np.asarray(gk)).all()

    def test_packed_select_set_matches_exact_on_separated_data(self, rng):
        """With distances separated by more than the 2^-13 quantisation,
        packed and exact must select the IDENTICAL neighbour set (the mask
        output drives the backward)."""
        from geoa3_tpu.ops.pallas.kappa_kernel import _kappa_fwd_call

        cloud, nrm = self._data(rng, b=2, n=128)
        with pltpu.force_tpu_interpret_mode():
            _, m_exact = _kappa_fwd_call(cloud, nrm, 8, 64, "exact")
            _, m_packed = _kappa_fwd_call(cloud, nrm, 8, 64, "packed")
        me, mp = np.asarray(m_exact), np.asarray(m_packed)
        # random clouds: allow at most a few near-tie swaps
        assert (me != mp).mean() < 1e-3
        assert (mp.sum(-1) == 9).all()  # k+1 selected per row, always

    def test_multi_block_grad_accumulation(self, rng):
        """Neighbour gradient contributions must accumulate across query
        row blocks (revisited-output pattern)."""
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas

        cloud, nrm = self._data(rng, b=1, n=384)  # 3 blocks of 128

        def loss_kernel(c):
            return jnp.sum(kappa_pallas(c, nrm, 12, 128) ** 2)

        def loss_composed(c):
            return jnp.sum(ops.knn_kappa(c, nrm, 12) ** 2)

        with pltpu.force_tpu_interpret_mode():
            gk = jax.grad(loss_kernel)(cloud)
        go = jax.grad(loss_composed)(cloud)
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(go), rtol=5e-3, atol=5e-4
        )

    def test_selmask_matches_fused_forward_mask(self, rng):
        """The selection-only kernel must produce the BIT-IDENTICAL mask as
        the fused forward (shared _select_maskf), for both select modes."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _kappa_fwd_call,
            kappa_selmask_call,
        )

        cloud, nrm = self._data(rng, b=2, n=256)
        for select in ("exact", "packed"):
            with pltpu.force_tpu_interpret_mode():
                _, want = _kappa_fwd_call(cloud, nrm, 16, 128, select)
                got = kappa_selmask_call(cloud, 16, 128, select)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_frommask_matches_fused_forward_bitwise(self, rng):
        """Given the fused forward's own mask, the mask-consuming forward
        must reproduce kappa BIT-identically (same A math, same reduce)."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _kappa_fwd_call,
            kappa_frommask_pallas,
        )

        cloud, nrm = self._data(rng, b=2, n=256)
        with pltpu.force_tpu_interpret_mode():
            want, mask = _kappa_fwd_call(cloud, nrm, 16, 128, "exact")
            got = kappa_frommask_pallas(cloud, nrm, mask, 16, 128)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_frommask_grad_matches_fused(self, rng):
        """With a fresh mask, the from-mask VJP must equal the fused
        kernel's VJP bitwise (identical backward kernel + residuals)."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _kappa_fwd_call,
            kappa_frommask_pallas,
            kappa_pallas,
        )

        cloud, nrm = self._data(rng, b=1, n=128)
        w = jnp.asarray(rng.randn(1, 128).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            _, mask = _kappa_fwd_call(cloud, nrm, 8, 64, "exact")
            gm = jax.grad(
                lambda c: jnp.sum(
                    kappa_frommask_pallas(c, nrm, mask, 8, 64) * w
                )
            )(cloud)
            gf = jax.grad(
                lambda c: jnp.sum(kappa_pallas(c, nrm, 8, 64) * w)
            )(cloud)
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(gf))

    def test_frommask_stale_mask_tracks_composed(self, rng):
        """A slightly STALE mask (the refresh-block scenario): kappa from
        the old mask on moved points must track the direct-difference
        oracle computed with the same membership mask."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            kappa_frommask_pallas,
            kappa_selmask_call,
        )

        cloud, nrm = self._data(rng, b=1, n=128)
        with pltpu.force_tpu_interpret_mode():
            mask = kappa_selmask_call(cloud, 8, 64, "exact")
        moved = cloud + 1e-3 * jnp.asarray(
            rng.randn(1, 128, 3).astype(np.float32)
        )
        with pltpu.force_tpu_interpret_mode():
            got = kappa_frommask_pallas(moved, nrm, mask, 8, 64)
        c = np.asarray(moved)[0]
        nv = np.asarray(nrm)[0]
        mk = np.asarray(mask)[0].astype(np.float64)
        diff = c[None, :, :] - c[:, None, :]  # [i, j, 3]: p_j - p_i
        r = np.linalg.norm(diff, axis=-1)
        unit = diff / np.maximum(r, 1e-12)[..., None]
        a = np.abs(np.einsum("ijc,ic->ij", unit, nv))
        want = (mk * a).sum(-1) / 8
        np.testing.assert_allclose(
            np.asarray(got)[0], want, rtol=1e-3, atol=1e-5
        )

    def test_curv_term_value_matches_frommask(self, rng):
        """The fused curvature TERM kernel's value must equal
        mean((kappa_frommask - ref)^2) built from the same mask (identical
        A math; only the mean's reduce is in-kernel)."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            curv_term_frommask_pallas,
            kappa_frommask_pallas,
            kappa_selmask_call,
        )

        cloud, nrm = self._data(rng, b=2, n=256)
        ref = jnp.asarray(np.abs(rng.randn(2, 256)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            mask = kappa_selmask_call(cloud, 16, 128, "exact")
            kap = kappa_frommask_pallas(cloud, nrm, mask, 16, 128)
            got = curv_term_frommask_pallas(cloud, nrm, ref, mask, 16, 128)
        want = jnp.mean((kap - ref) ** 2, axis=-1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9
        )

    def test_curv_term_grad_matches_composed_vjp(self, rng):
        """The planes-in-forward VJP (scalar-cotangent scaling) must match
        autodiff through kappa_frommask + mean((.-ref)^2), including a
        per-instance weight like the engine's const. The cotangent product
        ORDER differs (g_loc = 2*diff/n in-kernel vs XLA's fused mean-grad),
        a ~2^-23 relative input perturbation that the partially-cancelling
        center-vs-neighbour plane sums amplify to ~1e-3 relative on
        near-zero entries — bound it absolutely (grads are O(1e-2))."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            curv_term_frommask_pallas,
            kappa_frommask_pallas,
            kappa_selmask_call,
        )

        cloud, nrm = self._data(rng, b=2, n=128)
        ref = jnp.asarray(np.abs(rng.randn(2, 128)).astype(np.float32))
        cw = jnp.asarray(np.abs(rng.randn(2)).astype(np.float32) + 0.5)
        with pltpu.force_tpu_interpret_mode():
            mask = kappa_selmask_call(cloud, 8, 64, "exact")

            def loss_term(c):
                return jnp.mean(
                    cw * curv_term_frommask_pallas(c, nrm, ref, mask, 8, 64)
                )

            def loss_composed(c):
                kap = kappa_frommask_pallas(c, nrm, mask, 8, 64)
                return jnp.mean(cw * jnp.mean((kap - ref) ** 2, axis=-1))

            gt_ = jax.grad(loss_term)(cloud)
            gc_ = jax.grad(loss_composed)(cloud)
        np.testing.assert_allclose(
            np.asarray(gt_), np.asarray(gc_), rtol=5e-3, atol=2e-5
        )

    def test_curv_term_duplicate_points_finite(self, rng):
        """Round-5b removed the dead eps clamps from the curv_term kernel
        (the 1/eps min on rsqrt and the w2 eps^2 gate) on the argument that
        only d0 == 0 is reachable on an f32 coordinate grid and the d0 == 0
        gate alone covers it. Pin that: a cloud with EXACT duplicate points
        (d0 == 0 off the diagonal too) must yield finite value and finite
        gradient planes, with the duplicate column contributing zero."""
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            curv_term_frommask_pallas,
            kappa_selmask_call,
        )

        cloud, nrm = self._data(rng, b=1, n=128)
        cloud = np.array(cloud, copy=True)
        cloud[0, 17] = cloud[0, 3]  # exact duplicate pair
        cloud[0, 64] = cloud[0, 3]  # triple
        cloud = jnp.asarray(cloud)
        ref = jnp.asarray(np.abs(rng.randn(1, 128)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            mask = kappa_selmask_call(cloud, 8, 64, "exact")

            def loss(c):
                return jnp.sum(
                    curv_term_frommask_pallas(c, nrm, ref, mask, 8, 64)
                )

            val, grad = jax.value_and_grad(loss)(cloud)
        assert np.isfinite(np.asarray(val)).all()
        assert np.isfinite(np.asarray(grad)).all()

    def test_curv_term_ops_fallback_parity(self, rng):
        """ops.curv_term_from_mask's composed fallback (what CPU runs) must
        match the interpret-mode kernel within the documented kappa
        tolerance."""
        from geoa3_tpu import ops
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            curv_term_frommask_pallas,
            kappa_selmask_call,
        )

        cloud, nrm = self._data(rng, b=1, n=128)
        ref = jnp.asarray(np.abs(rng.randn(1, 128)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            mask = kappa_selmask_call(cloud, 8, 64, "exact")
            got = curv_term_frommask_pallas(cloud, nrm, ref, mask, 8, 64)
        want = ops.curv_term_from_mask(cloud, nrm, ref, mask, 8)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-7
        )
