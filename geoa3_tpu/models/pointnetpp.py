"""PointNet++ SSG/MSG victims (TPU-native rebuild of reference Model/PointNetPP_*.py
and pointnet2_ops/pointnet2_modules.py).

Set-abstraction layout: the per-group shared MLP operates on [b, npoint,
nsample, c] with channels last, so each "Conv2d 1x1" is one big Dense matmul
on the MXU; FPS / ball-query / grouping come from geoa3_tpu.ops (the Pallas/
XLA replacements for the CUDA pointnet2_ops kernels).

Parity notes:
  * SSG config: SA(512, r=0.2, ns=64, mlp[.,64,64,128]) -> SA(128, r=0.4,
    ns=64, mlp[128,128,128,256]) -> GroupAll mlp[256,256,512,1024] -> FC head
    512/256/40 (reference PointNetPP_ssg.py:64-98);
  * MSG config: SA1 radii [.1,.2,.4] ns [16,32,128], SA2 radii [.2,.4,.8]
    ns [32,64,128] (reference PointNetPP_msg.py:17-46);
  * with use_xyz the grouped relative xyz is concatenated BEFORE features
    (mlp_spec[0] += 3, reference pointnet2_modules.py:112-113; concat order
    pointnet2_utils.py:322-324);
  * shared-MLP convs carry no bias when followed by BN (reference
    pointnet2_modules.py:13) and FC-head Linears are bias-free before BN
    (reference PointNetPP_ssg.py:89-97); all BNs use torch defaults
    (eps 1e-5).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from geoa3_tpu import ops

BN_EPS = 1e-5


class _SplitDense(nn.Module):
    """Dense over a conceptually-concatenated input, without the concat.

    `concat([a, b], -1) @ W` computed as `a @ W[:wa] + b @ W[wa:]`. The
    param tree/shape is identical to nn.Dense on the concatenated width
    (kernel [wa+wb, features]), so checkpoints/converters are unaffected.
    TPU motivation: the concatenated width (e.g. 3+128=131) pads the MXU
    contraction dim to the next 128 multiple (~2x waste) and the backward
    materialises a slice+relayout of the concat cotangent (split+copy in
    the profile); the split form avoids both. Summation order differs from
    the fused contraction by one final add (parity tolerances absorb it).
    """

    features: int

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        wa, wb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (wa + wb, self.features),
            jnp.float32,
        )
        return a @ kernel[:wa] + b @ kernel[wa:]


class _RawGroupSpec(NamedTuple):
    """Ungrouped SA input for the fully-fused SA kernel
    (ops/pallas/sa_fused_kernel.py): ball-query + layer-1-projected
    grouping + MLP + pool all happen inside one Pallas call, so the SA
    module hands SharedMLP the raw tensors plus the query geometry and
    no grouped tensor ever exists outside VMEM."""

    xyz: jax.Array  # [b, n, 3]
    new_xyz: jax.Array  # [b, m, 3]
    features: Optional[jax.Array]  # [b, n, cf] | None
    radius: float
    nsample: int


class _PlanesGroup(NamedTuple):
    """Pre-grouped SA input from the fused ball-query+group kernel
    (ops/pallas/ballquery_group_kernel.py): center-subtracted xyz planes
    and grouped features, already in the fused SA MLP kernel's layout —
    SharedMLP routes this straight into the fused path (no XLA-side
    grouped tensors, no layout copies)."""

    gxp: jax.Array  # [b, 8, m*ns] f32, rows 3..7 zero
    gf: Optional[jax.Array]  # [b, m, ns, cf] | None
    ns: int


class _DenseParam(nn.Module):
    """Declares (or reads) a Dense kernel at the same tree path nn.Dense
    would, without computing — lets the fused SA kernel consume the params
    directly while keeping checkpoints/converters unchanged."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _BNParam(nn.Module):
    """Declares (or reads) BatchNorm params/stats at nn.BatchNorm's paths."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


class SharedMLP(nn.Module):
    """Conv2d-1x1 + BN + ReLU stack over channel-last group tensors.

    Accepts either a single tensor or an (xyz_part, features_part) tuple;
    the tuple form feeds the first conv through _SplitDense (same params,
    no concat).

    Eval mode on TPU routes grouped 3-layer stacks through the fused Pallas
    SA kernel (ops/pallas/group_mlp_kernel.py): BN folded into each affine,
    all three layers + the max-pool over nsample computed in VMEM — the
    unfused path writes ~0.5 GB of interlayer activations to HBM per attack
    step on SSG SA1. The caller pools via `maxpool_hint`; when the fused
    path runs, the returned tensor is ALREADY pooled ([b, m, c]) and the
    caller's jnp.max over nsample is skipped (see PointnetSAModuleMSG)."""

    features: Sequence[int]
    bn_momentum: float = 0.9

    def _can_fuse(self, x, maxpool_hint: bool) -> bool:
        from geoa3_tpu.ops.pallas.group_mlp_kernel import (
            group_mlp_available,
            pallas_available,
        )

        if not (maxpool_hint and pallas_available()):
            return False
        if isinstance(x, tuple):
            gx, gf = x
            cf = gf.shape[-1]
        else:
            gx, cf = x, 0
            if gx.shape[-1] != 3:
                return False  # features-only grouping (use_xyz=False)
        if gx.ndim != 4 or gx.shape[2] <= 1:
            return False  # degenerate single-sample groups
        # (GroupAll [b, 1, n, c] also fuses: m=1, R=n is one small tile)
        return group_mlp_available(
            gx.shape[2], gx.shape[1], tuple(self.features), cf
        )

    def _folded_params(self, cf: int, dtype):
        """(w_i * bn_scale, bn_shift) per layer at nn.Dense/BatchNorm's
        param-tree paths (checkpoints/converters unchanged)."""
        ws_and_bs = []
        cin = 3 + cf
        for i, f in enumerate(self.features):
            k = _DenseParam((cin, f), name=f"conv{i}")()
            scale, bias, mean, var = _BNParam(f, name=f"bn{i}")()
            s = scale / jnp.sqrt(var + BN_EPS)
            ws_and_bs.append((k * s[None, :]).astype(dtype))
            ws_and_bs.append(((bias - mean * s)[None, :]).astype(dtype))
            cin = f
        return ws_and_bs

    def _fused_sa(self, x: "_RawGroupSpec") -> jax.Array:
        """Whole-scale fusion: ball-query + group + MLP + pool in one
        Pallas kernel (ops/pallas/sa_fused_kernel.py)."""
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import (
            platform_f32_exact,
        )
        from geoa3_tpu.ops.pallas.sa_fused_kernel import sa_query_group_mlp

        cf = x.features.shape[-1] if x.features is not None else 0
        dtype = x.xyz.dtype
        ws_and_bs = self._folded_params(cf, dtype)
        ws_and_bs = jax.tree.map(jax.lax.stop_gradient, tuple(ws_and_bs))
        out = sa_query_group_mlp(
            x.radius, x.nsample,
            dtype == jnp.float32 and platform_f32_exact(),
            x.xyz, x.new_xyz, x.features, ws_and_bs,
        )
        return out.astype(dtype)

    def _fused(self, x) -> jax.Array:
        from geoa3_tpu.ops.pallas.group_mlp_kernel import group_mlp_maxpool

        if isinstance(x, _PlanesGroup):
            gxp, gf, ns = x.gxp, x.gf, x.ns
            cf = gf.shape[-1] if gf is not None else 0
            b = gxp.shape[0]
            dtype = gxp.dtype
        else:
            if isinstance(x, tuple):
                gx, gf = x
                cf = gf.shape[-1]
            else:
                gx, gf, cf = x, None, 0
            b, m, ns, _ = gx.shape
            dtype = gx.dtype
        ws_and_bs = self._folded_params(cf, dtype)
        if not isinstance(x, _PlanesGroup):
            # planes layout [b, 8, m*ns] (a [..., 3]-minor tensor pads 3
            # lanes to 128 on TPU)
            gxp = gx.transpose(0, 3, 1, 2).reshape(b, 3, m * ns)
            gxp = jnp.concatenate(
                [gxp, jnp.zeros((b, 5, m * ns), gxp.dtype)], axis=1
            )
        # the fused kernel's VJP only differentiates the INPUTS (the attack
        # path); make the non-differentiability of the folded params explicit
        # at the call site instead of relying on zero cotangents in the VJP
        ws_and_bs = jax.tree.map(jax.lax.stop_gradient, tuple(ws_and_bs))
        # dot precision matches the platform's default lowering of the
        # unfused victim (see pool_matmul_kernel.platform_f32_exact)
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import platform_f32_exact

        out = group_mlp_maxpool(
            gxp, gf, ns,
            dtype == jnp.float32 and platform_f32_exact(), ws_and_bs,
        )
        return out.astype(dtype)

    def _can_fuse_pool(self, x, cout: int) -> bool:
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import (
            pool_matmul_available,
        )

        if isinstance(x, tuple) or x.ndim != 4:
            return False
        b, m, ns, cin = x.shape
        # m > 1 measured SLOWER than unfused (SSG 10.90 vs 9.35 ms/step):
        # the kernel's standard-layout x/dx blocks force XLA to insert
        # ~0.4-0.6 ms layout copies around the [b, m, ns, c] activations,
        # eating more than the pool fusion saves. GroupAll (m == 1) is
        # layout-trivial and keeps the win; grouped SAs go through the
        # whole-MLP fused kernel (group_mlp_available) instead.
        if m != 1:
            return False
        return ns > 1 and pool_matmul_available(m * ns, cin, cout, seg=ns)

    def _fused_last_pool(self, x, i: int, f: int) -> jax.Array:
        from geoa3_tpu.ops.pallas.pool_matmul_kernel import (
            platform_f32_exact,
            pool_affine_max,
        )

        b, m, ns, cin = x.shape
        k = _DenseParam((cin, f), name=f"conv{i}")()
        scale, bias, mean, var = _BNParam(f, name=f"bn{i}")()
        s = scale * jax.lax.rsqrt(var + BN_EPS)
        w = (k * s[None, :])[None]  # [1 tap, cin, f]
        bb = bias - mean * s
        w, bb = jax.lax.stop_gradient((w, bb))
        # dot precision matches the platform's default lowering of the
        # unfused victim (platform_f32_exact); bf16 victims single-pass
        pooled = pool_affine_max(
            x.reshape(b, m * ns, cin), w, bb, ns,
            x.dtype == jnp.float32 and platform_f32_exact(),
        )
        return nn.relu(pooled).astype(x.dtype)

    @nn.compact
    def __call__(
        self, x, train: bool = False, maxpool_hint: bool = False
    ) -> jax.Array:
        if isinstance(x, _RawGroupSpec):
            # whole-scale fusion (the SA module gates on sa_fused_available
            # before handing over the raw tensors)
            return self._fused_sa(x)
        if isinstance(x, _PlanesGroup):
            # pre-grouped planes from the fused ball-query+group kernel:
            # only the fused SA path can consume them (the SA module gates
            # on the same availability checks before producing them)
            return self._fused(x)
        if not train and self._can_fuse(x, maxpool_hint):
            return self._fused(x)
        last = len(self.features) - 1
        for i, f in enumerate(self.features):
            if (
                i == last
                and i > 0
                and maxpool_hint
                and not train
                and self._can_fuse_pool(x, f)
            ):
                # fuse ONLY the last affine with the max-over-nsample
                # (ops/pallas/pool_matmul_kernel.py): the pre-pool
                # [b, m, ns, c_out] tensor and its backward eq-mask/dX
                # re-reads never touch HBM. Whole-chain fusion measured
                # slower (see group_mlp_available); this slice is where
                # the HBM traffic multiplies.
                return self._fused_last_pool(x, i, f)
            if i == 0 and isinstance(x, tuple):
                x = _SplitDense(f, name="conv0")(*x)
            else:
                x = nn.Dense(f, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                epsilon=BN_EPS,
                momentum=self.bn_momentum,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        if maxpool_hint:
            x = jnp.max(x, axis=2)  # max over nsample -> [b, m, c_out]
        return x


def _sa_fused_ok(
    xyz, new_xyz, ns: int, widths, features, use_xyz: bool
) -> bool:
    """Gate for the fully-fused SA kernel (query+group+MLP+pool in one
    Pallas call), eval-mode f32 only."""
    from geoa3_tpu.ops.pallas.sa_fused_kernel import (
        pallas_available,
        sa_fused_available,
    )

    if not (use_xyz and pallas_available() and xyz.dtype == jnp.float32):
        return False
    n, m = xyz.shape[1], new_xyz.shape[1]
    cf = features.shape[-1] if features is not None else 0
    return sa_fused_available(n, m, ns, widths, cf)


def _fused_query_group_ok(
    xyz, new_xyz, ns: int, widths, features, use_xyz: bool
) -> bool:
    """Gate for the fused ball-query+group -> fused SA MLP pipeline: both
    kernels must accept the shapes (they are a matched pair — the planes
    output only feeds group_mlp_maxpool), eval-mode f32 only."""
    from geoa3_tpu.ops.pallas.ballquery_group_kernel import (
        ball_query_group_available,
    )
    from geoa3_tpu.ops.pallas.group_mlp_kernel import (
        group_mlp_available,
        pallas_available,
    )

    if not (use_xyz and pallas_available() and xyz.dtype == jnp.float32):
        return False
    n, m = xyz.shape[1], new_xyz.shape[1]
    cf = features.shape[-1] if features is not None else 0
    # lane-unaligned feature widths (MSG SA2: cf=320) were tried here
    # zero-padded to 384 — measured SLOWER (11.15 vs 10.13 ms/step MSG
    # b=10) than the whole-scale sa_fused fallback, which never
    # materialises grouped features in HBM; unaligned widths route there
    return group_mlp_available(ns, m, widths, cf) and (
        ball_query_group_available(n, m, ns, cf)
    )


def _query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array],
    use_xyz: bool,
) -> jax.Array:
    """Ball-query grouping (reference pointnet2_utils.py:279-333).

    xyz [b,n,3], new_xyz [b,m,3], features [b,n,c] -> [b, m, nsample, 3+c]
    (as an (xyz, feats) tuple when both parts exist; see SharedMLP).
    """
    idx = ops.ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped_feats = ops.group_points(features, idx)
        if use_xyz:
            # tuple, not concat: SharedMLP splits the first conv instead
            return (grouped_xyz, grouped_feats)
        return grouped_feats
    assert use_xyz, "cannot have no features and not use xyz"
    return grouped_xyz


def _group_all(
    xyz: jax.Array, features: Optional[jax.Array], use_xyz: bool
) -> jax.Array:
    """GroupAll (reference pointnet2_utils.py:336-379) -> [b, 1, n, 3+c]."""
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_feats = features[:, None, :, :]
        if use_xyz:
            return (grouped_xyz, grouped_feats)
        return grouped_feats
    return grouped_xyz


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference pointnet2_modules.py:77-115)."""

    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # hidden widths only (input dim is inferred)
    use_xyz: bool = True
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        train: bool = False,
    ):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)
        if self.npoint is not None:
            fps_idx = ops.furthest_point_sampling(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, fps_idx)
        else:
            new_xyz = None

        outs = []
        for i in range(len(self.radii)):
            if self.npoint is not None:
                # kernel preference (measured, SSG b=16 trace): the split
                # ballquery_group -> group_mlp pipeline first — its planes
                # gathers stream only 8 MXU rows and beat the whole-scale
                # kernel's c1-wide gathers (7.76 vs 10.37 ms/step); the
                # whole-scale kernel is the fallback for shapes the split
                # pair cannot take (MSG SA2's cf=320 feature width), where
                # it replaces the UNFUSED path instead
                split_ok = not train and _fused_query_group_ok(
                    xyz, new_xyz, self.nsamples[i],
                    tuple(self.mlps[i]), features, self.use_xyz,
                )
                if split_ok:
                    from geoa3_tpu.ops.pallas.ballquery_group_kernel import (
                        ball_query_group_planes,
                    )
                    from geoa3_tpu.ops.pallas.pool_matmul_kernel import (
                        platform_f32_exact,
                    )

                    gxp, gf = ball_query_group_planes(
                        self.radii[i], self.nsamples[i],
                        platform_f32_exact(), xyz, new_xyz, features,
                    )
                    grouped = _PlanesGroup(gxp, gf, self.nsamples[i])
                elif not train and _sa_fused_ok(
                    xyz, new_xyz, self.nsamples[i],
                    tuple(self.mlps[i]), features, self.use_xyz,
                ):
                    grouped = _RawGroupSpec(
                        xyz, new_xyz, features,
                        self.radii[i], self.nsamples[i],
                    )
                else:
                    grouped = _query_and_group(
                        self.radii[i],
                        self.nsamples[i],
                        xyz,
                        new_xyz,
                        features,
                        self.use_xyz,
                    )
            else:
                grouped = _group_all(xyz, features, self.use_xyz)
            h = SharedMLP(
                tuple(self.mlps[i]),
                bn_momentum=self.bn_momentum,
                name=f"mlp{i}",
            )(grouped, train=train, maxpool_hint=True)  # pooled [b, m, c]
            outs.append(h)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale SA module (reference pointnet2_modules.py:118-146)."""

    @classmethod
    def make(
        cls,
        mlp: Sequence[int],
        npoint: Optional[int] = None,
        radius: Optional[float] = None,
        nsample: Optional[int] = None,
        use_xyz: bool = True,
        name: Optional[str] = None,
    ) -> "PointnetSAModule":
        return cls(
            npoint=npoint,
            radii=[radius],
            nsamples=[nsample],
            mlps=[mlp],
            use_xyz=use_xyz,
            name=name,
        )


class PointnetFPModule(nn.Module):
    """Feature propagation via 3-NN interpolation (reference pointnet2_modules.py:149-209).

    Not used by the shipped classifiers but part of the library surface.
    """

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        unknown: Optional[jax.Array],
        known: Optional[jax.Array],
        unknow_feats: Optional[jax.Array],
        known_feats: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        # unknown [b,n,3], known [b,m,3], unknow_feats [b,n,c1], known_feats [b,m,c2]
        if known is not None:
            dist, idx = ops.three_nn(unknown, known)
            dist_recip = 1.0 / (dist + 1e-8)
            norm = jnp.sum(dist_recip, axis=2, keepdims=True)
            weight = dist_recip / norm
            interpolated = ops.three_interpolate(known_feats, idx, weight)
        else:
            interpolated = jnp.broadcast_to(
                known_feats,
                (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1]),
            )
        if unknow_feats is not None:
            new_features = jnp.concatenate([interpolated, unknow_feats], axis=-1)
        else:
            new_features = interpolated
        return SharedMLP(tuple(self.mlp), name="mlp")(new_features, train=train)


class _ClsHead(nn.Module):
    """FC head 1024->512->256->classes (reference PointNetPP_ssg.py:89-98)."""

    classes: int = 40
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(512, use_bias=False, name="fc0")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            epsilon=BN_EPS,
            momentum=self.bn_momentum,
            name="bn0",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(256, use_bias=False, name="fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            epsilon=BN_EPS,
            momentum=self.bn_momentum,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.classes, name="fc2")(x)


class PointNet2ClassificationSSG(nn.Module):
    """PN++ SSG classifier. Input [b, n, 3] (or [b, n, 6] with use_normal)."""

    use_xyz: bool = True
    use_normal: bool = False
    classes: int = 40
    bn_momentum: float = 0.9

    def _sa_configs(self):
        return [
            dict(npoint=512, radii=[0.2], nsamples=[64], mlps=[[64, 64, 128]]),
            dict(npoint=128, radii=[0.4], nsamples=[64], mlps=[[128, 128, 256]]),
            dict(npoint=None, radii=[None], nsamples=[None], mlps=[[256, 512, 1024]]),
        ]

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool = False) -> jax.Array:
        xyz = pc[..., 0:3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        for i, cfg in enumerate(self._sa_configs()):
            xyz, features = PointnetSAModuleMSG(
                npoint=cfg["npoint"],
                radii=cfg["radii"],
                nsamples=cfg["nsamples"],
                mlps=cfg["mlps"],
                use_xyz=self.use_xyz,
                bn_momentum=self.bn_momentum,
                name=f"SA{i}",
            )(xyz, features, train=train)

        return _ClsHead(
            self.classes, bn_momentum=self.bn_momentum, name="head"
        )(features[:, 0, :], train=train)


class PointNet2ClassificationMSG(PointNet2ClassificationSSG):
    """PN++ MSG classifier (reference PointNetPP_msg.py:9-47)."""

    def _sa_configs(self):
        return [
            dict(
                npoint=512,
                radii=[0.1, 0.2, 0.4],
                nsamples=[16, 32, 128],
                mlps=[[32, 32, 64], [64, 64, 128], [64, 96, 128]],
            ),
            dict(
                npoint=128,
                radii=[0.2, 0.4, 0.8],
                nsamples=[32, 64, 128],
                mlps=[[64, 64, 128], [128, 128, 256], [128, 128, 256]],
            ),
            dict(
                npoint=None,
                radii=[None],
                nsamples=[None],
                mlps=[[256, 512, 1024]],
            ),
        ]
