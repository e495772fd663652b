"""Victim-model tests.

The PointNet parity test instantiates the REFERENCE torch model (read-only,
from /root/reference) on CPU with random weights + warmed BN stats, converts
the state_dict, and requires logits agreement — the strongest possible parity
anchor given the repo ships no pretrained checkpoints.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoa3_tpu import models

REFERENCE = "/root/reference"


def _load_reference_pointnet():
    """Import the reference torch PointNet with a torchvision stub."""
    if not os.path.isdir(os.path.join(REFERENCE, "Model")):
        pytest.skip("reference repo not available")
    torch = pytest.importorskip("torch")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, os.path.join(REFERENCE, "Model"))
    from PointNet import PointNet as TorchPointNet  # noqa: N814

    return torch, TorchPointNet


class TestPointNet:
    def test_shapes_and_train_mode(self):
        model = models.PointNet(classes=40)
        key = jax.random.PRNGKey(0)
        variables = model.init({"params": key}, jnp.zeros((2, 64, 3)), train=False)
        logits = model.apply(variables, jnp.ones((2, 64, 3)), train=False)
        assert logits.shape == (2, 40)
        out, new_state = model.apply(
            variables,
            jnp.ones((2, 64, 3)),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        logits_t, transform = out
        assert logits_t.shape == (2, 40)
        assert transform.shape == (2, 64, 64)

    def test_tnet_initialises_to_identity(self):
        model = models.TransformNet(K=3)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 3)))
        # freshly initialised net with zero fc3 kernel must output ~identity
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 3), jnp.float32)
        t = model.apply(variables, x, train=False)
        assert np.asarray(t).shape == (1, 3, 3)

    def test_logits_parity_vs_reference_torch(self, rng):
        torch, TorchPointNet = _load_reference_pointnet()
        net = TorchPointNet(40, npoint=1024)
        # warm BN running stats so the parity test exercises them
        net.train()
        with torch.no_grad():
            for _ in range(3):
                net(torch.randn(8, 3, 256))
        net.eval()

        variables = models.convert_pointnet_state_dict(net.state_dict())
        model = models.PointNet(classes=40)

        pc = rng.randn(4, 3, 256).astype(np.float32)
        with torch.no_grad():
            want = net(torch.from_numpy(pc)).numpy()
        got = np.asarray(
            model.apply(variables, jnp.asarray(pc.transpose(0, 2, 1)), train=False)
        )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_converted_tree_structure_matches_init(self, rng):
        torch, TorchPointNet = _load_reference_pointnet()
        net = TorchPointNet(40, npoint=1024)
        converted = models.convert_pointnet_state_dict(net.state_dict())
        model = models.PointNet(classes=40)
        init_vars = model.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 3)), train=False
        )
        conv_shapes = jax.tree.map(jnp.shape, converted)
        init_shapes = jax.tree.map(jnp.shape, init_vars)
        assert conv_shapes == init_shapes


class TestPointNetPP:
    @pytest.mark.parametrize("cls", ["ssg", "msg"])
    def test_forward_shapes(self, cls):
        model = (
            models.PointNet2ClassificationSSG()
            if cls == "ssg"
            else models.PointNet2ClassificationMSG()
        )
        key = jax.random.PRNGKey(0)
        pc = jax.random.normal(key, (2, 1024, 3))
        variables = model.init({"params": key}, pc, train=False)
        logits = model.apply(variables, pc, train=False)
        assert logits.shape == (2, 40)

    def test_ssg_converted_tree_structure(self):
        """Build a synthetic torch-style state_dict and check tree parity."""
        # shapes follow reference PointNetPP_ssg.py:64-98 with use_xyz=True
        sd = {}

        def add_conv(prefix, cin, cout):
            sd[f"{prefix}.weight"] = np.zeros((cout, cin, 1, 1), np.float32)

        def add_bn(prefix, c):
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

        specs = [
            [(3, 64), (64, 64), (64, 128)],
            [(131, 128), (128, 128), (128, 256)],
            [(259, 256), (256, 512), (512, 1024)],
        ]
        for i, spec in enumerate(specs):
            for k, (cin, cout) in enumerate(spec):
                add_conv(f"SA_modules.{i}.mlps.0.{3 * k}", cin, cout)
                add_bn(f"SA_modules.{i}.mlps.0.{3 * k + 1}", cout)
        sd["fc_layer.0.weight"] = np.zeros((512, 1024), np.float32)
        add_bn("fc_layer.1", 512)
        sd["fc_layer.3.weight"] = np.zeros((256, 512), np.float32)
        add_bn("fc_layer.4", 256)
        sd["fc_layer.7.weight"] = np.zeros((40, 256), np.float32)
        sd["fc_layer.7.bias"] = np.zeros(40, np.float32)

        converted = models.convert_pointnetpp_state_dict(sd)
        model = models.PointNet2ClassificationSSG()
        init_vars = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 1024, 3)),
            train=False,
        )
        conv_shapes = jax.tree.map(jnp.shape, converted)
        init_shapes = jax.tree.map(jnp.shape, init_vars)
        assert conv_shapes == init_shapes

    def test_msg_converted_tree_structure(self):
        """MSG multi-scale converter tree: mlps.{0,1,2} per SA level
        (reference PointNetPP_msg.py:17-46)."""
        sd = {}

        def add_conv(prefix, cin, cout):
            sd[f"{prefix}.weight"] = np.zeros((cout, cin, 1, 1), np.float32)

        def add_bn(prefix, c):
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

        # per-SA-level, per-scale mlp widths with use_xyz=True
        specs = [
            [  # SA1: radii [.1,.2,.4]
                [(3, 32), (32, 32), (32, 64)],
                [(3, 64), (64, 64), (64, 128)],
                [(3, 64), (64, 96), (96, 128)],
            ],
            [  # SA2: input 64+128+128=320 (+3)
                [(323, 64), (64, 64), (64, 128)],
                [(323, 128), (128, 128), (128, 256)],
                [(323, 128), (128, 128), (128, 256)],
            ],
            [[(643, 256), (256, 512), (512, 1024)]],  # GroupAll: 128+256+256+3
        ]
        for i, scales in enumerate(specs):
            for s, spec in enumerate(scales):
                for k, (cin, cout) in enumerate(spec):
                    add_conv(f"SA_modules.{i}.mlps.{s}.{3 * k}", cin, cout)
                    add_bn(f"SA_modules.{i}.mlps.{s}.{3 * k + 1}", cout)
        sd["fc_layer.0.weight"] = np.zeros((512, 1024), np.float32)
        add_bn("fc_layer.1", 512)
        sd["fc_layer.3.weight"] = np.zeros((256, 512), np.float32)
        add_bn("fc_layer.4", 256)
        sd["fc_layer.7.weight"] = np.zeros((40, 256), np.float32)
        sd["fc_layer.7.bias"] = np.zeros(40, np.float32)

        converted = models.convert_pointnetpp_state_dict(sd)
        model = models.PointNet2ClassificationMSG()
        init_vars = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 1024, 3)),
            train=False,
        )
        conv_shapes = jax.tree.map(jnp.shape, converted)
        init_shapes = jax.tree.map(jnp.shape, init_vars)
        assert conv_shapes == init_shapes

    def test_grad_flows_through_ssg(self):
        model = models.PointNet2ClassificationSSG()
        key = jax.random.PRNGKey(0)
        pc = jax.random.normal(key, (1, 256, 3))
        variables = model.init({"params": key}, pc, train=False)

        def loss(pc):
            return model.apply(variables, pc, train=False).sum()

        g = jax.grad(loss)(pc)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def _np_ball_query_fast(radius, nsample, xyz, new_xyz):
    """Vectorised CUDA ball-query semantics (ball_query_gpu.cu:9-54).

    First `nsample` in-radius hits in index order; all slots pre-filled with
    the first hit; all-miss rows stay 0. Equivalent to test_ops.np_ball_query
    (checked by test_fast_ball_query_oracle_matches_slow).
    """
    b, m, _ = new_xyz.shape
    n = xyz.shape[1]
    d2 = ((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2).sum(-1)
    hit = d2 < radius * radius
    rank = np.cumsum(hit, axis=-1) - 1
    first = np.argmax(hit, axis=-1)
    out = np.broadcast_to(first[..., None], (b, m, nsample)).copy()
    for s in range(nsample):
        sel = hit & (rank == s)
        has = sel.any(-1)
        out[..., s] = np.where(has, np.argmax(sel, axis=-1), out[..., s])
    return out.astype(np.int64)


def _install_ext_stub(torch):
    """Pre-register a CPU `pointnet2_ops._ext` built on the numpy oracles.

    The reference JIT-compiles a CUDA extension (pointnet2_utils.py:7-31);
    stubbing `_ext` with exact-semantics CPU ops lets the real reference
    PN++ torch model run here as a logits-parity oracle.
    """
    import test_ops as oracles

    ext = types.ModuleType("pointnet2_ops._ext")

    def furthest_point_sampling(xyz, npoint):
        idx = oracles.np_fps_cuda(xyz.detach().cpu().numpy(), npoint)
        return torch.from_numpy(idx.astype(np.int32))

    def gather_points(features, idx):
        f = features.detach().cpu().numpy()
        i = idx.detach().cpu().numpy().astype(np.int64)
        b, c, _ = f.shape
        out = np.take_along_axis(f, i[:, None, :], axis=2)
        return torch.from_numpy(np.ascontiguousarray(out))

    def ball_query(new_xyz, xyz, radius, nsample):
        out = _np_ball_query_fast(
            radius,
            nsample,
            xyz.detach().cpu().numpy(),
            new_xyz.detach().cpu().numpy(),
        )
        return torch.from_numpy(out.astype(np.int32))

    def group_points(features, idx):
        f = features.detach().cpu().numpy()
        i = idx.detach().cpu().numpy().astype(np.int64)
        b, c, _ = f.shape
        _, npt, ns = i.shape
        out = np.take_along_axis(f, i.reshape(b, 1, npt * ns), axis=2)
        return torch.from_numpy(
            np.ascontiguousarray(out.reshape(b, c, npt, ns))
        )

    def three_nn(unknown, known):
        d2, i = oracles.np_knn(
            unknown.detach().cpu().numpy(), known.detach().cpu().numpy(), 3
        )
        return (
            torch.from_numpy(d2.astype(np.float32)),
            torch.from_numpy(i.astype(np.int32)),
        )

    def three_interpolate(features, idx, weight):
        f = features.detach().cpu().numpy()
        i = idx.detach().cpu().numpy().astype(np.int64)
        w = weight.detach().cpu().numpy()
        b, c, _ = f.shape
        _, n, _ = i.shape
        g = np.take_along_axis(f, i.reshape(b, 1, n * 3), axis=2)
        g = g.reshape(b, c, n, 3)
        out = (g * w[:, None, :, :]).sum(-1)
        return torch.from_numpy(np.ascontiguousarray(out.astype(np.float32)))

    ext.furthest_point_sampling = furthest_point_sampling
    ext.gather_points = gather_points
    ext.ball_query = ball_query
    ext.group_points = group_points
    ext.three_nn = three_nn
    ext.three_interpolate = three_interpolate
    sys.modules["pointnet2_ops._ext"] = ext


def _load_reference_pnpp():
    """Import the reference torch PN++ SSG/MSG with a CPU `_ext` stub."""
    if not os.path.isdir(os.path.join(REFERENCE, "Model")):
        pytest.skip("reference repo not available")
    torch = pytest.importorskip("torch")
    tv = sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    for sub in ("models", "transforms"):
        if not hasattr(tv, sub):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
    _install_ext_stub(torch)
    for p in (
        os.path.join(REFERENCE, "Model", "pointnet2_ops_lib"),
        os.path.join(REFERENCE, "Model"),
    ):
        if p not in sys.path:
            sys.path.insert(0, p)
    from PointNetPP_msg import PointNet2ClassificationMSG as TorchMSG
    from PointNetPP_ssg import PointNet2ClassificationSSG as TorchSSG

    return torch, TorchSSG, TorchMSG


class TestPNPPTorchParity:
    """Logits parity vs the REAL reference torch PN++ (CPU `_ext` stub).

    This retroactively validates ball-query first-hit padding, CUDA FPS
    tie-breaks, grouping, and the SA max-pool through a full model
    (reference PointNetPP_ssg.py:51-132, PointNetPP_msg.py:9-47).
    """

    def test_fast_ball_query_oracle_matches_slow(self, rng):
        import test_ops as oracles

        xyz = rng.randn(2, 60, 3).astype(np.float32) * 0.5
        new_xyz = xyz[:, :10]
        slow = oracles.np_ball_query(0.4, 8, xyz, new_xyz)
        fast = _np_ball_query_fast(0.4, 8, xyz, new_xyz)
        np.testing.assert_array_equal(slow, fast.astype(np.int32))

    @pytest.mark.parametrize("arch", ["ssg", "msg"])
    def test_logits_parity_vs_reference_torch(self, arch, rng):
        torch, TorchSSG, TorchMSG = _load_reference_pnpp()
        cls = TorchSSG if arch == "ssg" else TorchMSG
        net = cls(use_xyz=True, use_normal=False)
        net.train()
        with torch.no_grad():
            for i in range(2):
                net(torch.from_numpy(rng.randn(4, 3, 600).astype(np.float32)))
        net.eval()

        variables = models.convert_pointnetpp_state_dict(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )
        model = (
            models.PointNet2ClassificationSSG()
            if arch == "ssg"
            else models.PointNet2ClassificationMSG()
        )

        pc = rng.randn(3, 3, 600).astype(np.float32)
        with torch.no_grad():
            want = net(torch.from_numpy(pc)).numpy()
        got = np.asarray(
            model.apply(
                variables, jnp.asarray(pc.transpose(0, 2, 1)), train=False
            )
        )
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


class TestFPModule:
    def test_fp_interpolation_shapes(self):
        fp = models.PointnetFPModule(mlp=(64, 64))
        key = jax.random.PRNGKey(0)
        unknown = jax.random.normal(key, (2, 128, 3))
        known = jax.random.normal(key, (2, 32, 3))
        known_feats = jax.random.normal(key, (2, 32, 16))
        variables = fp.init(
            {"params": key}, unknown, known, None, known_feats, train=False
        )
        out = fp.apply(variables, unknown, known, None, known_feats, train=False)
        assert out.shape == (2, 128, 64)


class TestBf16GradHealthcheck:
    """Guard for the XLA:TPU bf16 zero-gradient bug (RESULTS.md post-mortem;
    standalone reproducer in runs/bf16_zero_grad_repro.py). On CPU the bug
    never fires, so the healthy path must return True; a logits_fn whose
    input gradient is identically zero must be detected as unhealthy."""

    def test_healthy_victim_passes(self):
        from geoa3_tpu.models.registry import (
            bf16_grad_healthcheck, build_model, init_variables, make_eval_fn,
        )

        model = build_model("PointNet", classes=10, npoint=64)
        variables = init_variables(model, jax.random.PRNGKey(0), n=64)
        fn = make_eval_fn(model, variables, dtype=jnp.bfloat16)
        assert bf16_grad_healthcheck(fn, b=4, n=64)

    def test_zero_grad_victim_refused(self):
        from geoa3_tpu.models.registry import bf16_grad_healthcheck

        def dead_fn(pc):
            # mimics the mislowered backward: logits fine, d/dx == 0
            return jnp.sum(jax.lax.stop_gradient(pc), axis=1)

        assert not bf16_grad_healthcheck(dead_fn, b=4, n=64)
