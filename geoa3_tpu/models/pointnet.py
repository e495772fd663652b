"""PointNet victim classifier (TPU-native rebuild of reference Model/PointNet.py).

Channel-last layout throughout: the model takes [b, n, 3] clouds, so every
1x1 "conv" is a Dense over the 128-lane channel axis and the whole network is
a chain of MXU matmuls + fused BN/ReLU epilogues — no layout transposes on
device.

Architecture parity notes (reference: Model/PointNet.py):
  * 3x3 input T-Net -> conv1/2 -> 64x64 feature T-Net -> conv3/4/5 ->
    global max-pool -> FC 512/256/classes with dropout 0.3 (:96-160);
  * conv5 is a REAL kernel-3 convolution over the point axis with padding 1
    (:110) — kept even though points are unordered, for checkpoint parity;
  * conv-side BatchNorms use eps=1e-3 (:100,112-116); the two FC-side
    BatchNorms use torch's default eps=1e-5 (:119,122);
  * T-Net final layer initialised to the identity transform (:93-94);
  * train mode returns (logits, feature_transform) for the orthogonality
    regulariser (:154-155).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

CONV_BN_EPS = 1e-3  # reference Model/PointNet.py:59,100
FC_BN_EPS = 1e-5  # torch default, used by bn6/bn7 (reference :119,122)


def _identity_bias(K: int):
    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (K * K,)
        return jnp.eye(K, dtype=dtype).reshape(-1)

    return init


class _DenseP(nn.Module):
    """Declares (or reads) nn.Dense/nn.Conv params at their exact tree
    paths without computing — lets the fused pool kernel consume them
    directly while keeping checkpoints/converters unchanged."""

    shape: tuple  # Dense: (cin, cout); Conv k3: (3, cin, cout)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32
        )
        return kernel, bias


class _BNP(nn.Module):
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


def _fused_pool(parent, x, conv_name, bn_name, cout, taps, eps):
    """relu(max_n(bn(conv(x)))) via the fused Pallas pool kernel.

    Declares the conv/BN params at the standard nn.Dense / nn.Conv /
    nn.BatchNorm tree paths, folds the eval-mode BN affine into the conv
    weights, max-pools in VMEM (ops/pallas/pool_matmul_kernel.py), and
    applies the ReLU after the pool (max and ReLU commute; tie/clamp
    gradients agree — see the kernel docstring). Attack path only: the
    folded params pass through stop_gradient, matching the frozen-victim
    contract (weight grads come from the unfused train path). Dot
    precision matches the platform's default lowering of the unfused
    victim (see platform_f32_exact)."""
    from geoa3_tpu.ops.pallas.pool_matmul_kernel import (
        platform_f32_exact,
        pool_affine_max,
    )

    cin = x.shape[-1]
    shape = (cin, cout) if taps == 1 else (taps, cin, cout)
    kernel, cbias = _DenseP(shape, name=conv_name, parent=parent)()
    scale, bbias, mean, var = _BNP(cout, name=bn_name, parent=parent)()
    s = scale * jax.lax.rsqrt(var + eps)
    w3 = (kernel if taps == 3 else kernel[None]) * s
    b = (cbias - mean) * s + bbias
    w3, b = jax.lax.stop_gradient((w3, b))
    return nn.relu(pool_affine_max(x, w3, b, 0, platform_f32_exact())[:, 0])


def _pool_fusable(x, train: bool, point_mask, cout: int) -> bool:
    from geoa3_tpu.ops.pallas.pool_matmul_kernel import pool_matmul_available

    if train or point_mask is not None or x.ndim != 3:
        return False
    return pool_matmul_available(x.shape[1], x.shape[-1], cout)


def _masked_max(h: jax.Array, point_mask, axis: int = 1) -> jax.Array:
    """Max over the point axis, excluding masked-out (padded) points.

    Padding support for static-shape defense eval: clouds shrunk by outlier
    removal are padded back to n and excluded from every global max. With
    `point_mask=None` this is a plain max (the reference semantics).
    """
    if point_mask is None:
        return jnp.max(h, axis=axis)
    neg = jnp.finfo(h.dtype).min
    return jnp.max(jnp.where(point_mask[..., None], h, neg), axis=axis)


class TransformNet(nn.Module):
    """KxK spatial/feature transform net (reference Model/PointNet.py:56-94)."""

    K: int = 3
    bn_momentum: float = 0.9  # flax convention: new = m*old + (1-m)*batch

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, point_mask=None
    ) -> jax.Array:
        # x: [b, n, K] -> [b, K, K]
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            epsilon=CONV_BN_EPS,
            momentum=self.bn_momentum,
            name=name,
        )
        h = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        h = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(h)))
        if _pool_fusable(h, train, point_mask, 1024):
            h = _fused_pool(self, h, "conv3", "bn3", 1024, 1, CONV_BN_EPS)
        else:
            h = nn.relu(bn("bn3")(nn.Dense(1024, name="conv3")(h)))
            h = _masked_max(h, point_mask)  # [b, 1024]
        h = nn.relu(bn("bn4")(nn.Dense(512, name="fc1")(h)))
        h = nn.relu(bn("bn5")(nn.Dense(256, name="fc2")(h)))
        h = nn.Dense(
            self.K * self.K,
            kernel_init=nn.initializers.zeros,
            bias_init=_identity_bias(self.K),
            name="fc3",
        )(h)
        return h.reshape(h.shape[0], self.K, self.K)


class PointNet(nn.Module):
    """PointNet classifier. Input [b, n, 3]; returns logits [b, classes].

    With train=True returns (logits, feature_transform [b, 64, 64]).
    """

    classes: int = 40
    npoint: int = 1024  # informational only, matches the reference ctor arg
    bn_momentum: float = 0.9  # flax convention (torch momentum = 1 - this)
    return_idx: bool = False  # eval mode also returns the max-pool argmax
    # (the critical-point indices; reference PointNet.py:97,147,156-160)

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool = False, point_mask=None):
        assert pc.shape[-1] == 3, "expected channel-last [b, n, 3]"
        bn = lambda name, eps: nn.BatchNorm(
            use_running_average=not train,
            epsilon=eps,
            momentum=self.bn_momentum,
            name=name,
        )

        t_in = TransformNet(
            K=3, bn_momentum=self.bn_momentum, name="input_transform"
        )(
            pc, train=train, point_mask=point_mask
        )
        feat = jnp.einsum("bnk,bkj->bnj", pc, t_in)
        feat = nn.relu(bn("bn1", CONV_BN_EPS)(nn.Dense(64, name="conv1")(feat)))
        feat = nn.relu(bn("bn2", CONV_BN_EPS)(nn.Dense(64, name="conv2")(feat)))

        t_feat = TransformNet(
            K=64, bn_momentum=self.bn_momentum, name="feature_transform"
        )(
            feat, train=train, point_mask=point_mask
        )
        feat = jnp.einsum("bnk,bkj->bnj", feat, t_feat)
        feat = nn.relu(bn("bn3", CONV_BN_EPS)(nn.Dense(64, name="conv3")(feat)))
        feat = nn.relu(bn("bn4", CONV_BN_EPS)(nn.Dense(128, name="conv4")(feat)))
        # conv5: kernel-3 conv over the (padded) point axis (reference :110).
        # Masked (padded) positions are zeroed first so the kernel sees the
        # same zero-boundary a physically shrunken cloud would.
        if point_mask is not None:
            feat = jnp.where(point_mask[..., None], feat, 0.0)
        if not self.return_idx and _pool_fusable(feat, train, point_mask, 1024):
            feat = _fused_pool(self, feat, "conv5", "bn5", 1024, 3, CONV_BN_EPS)
        else:
            feat = nn.Conv(
                1024, kernel_size=(3,), padding=[(1, 1)], name="conv5"
            )(feat)
            feat = nn.relu(bn("bn5", CONV_BN_EPS)(feat))
            if self.return_idx and not train:
                pool_idx = jnp.argmax(
                    feat if point_mask is None
                    else jnp.where(
                        point_mask[..., None], feat,
                        jnp.finfo(feat.dtype).min,
                    ),
                    axis=1,
                )  # [b, 1024] critical-point indices
            feat = _masked_max(feat, point_mask)  # [b, 1024]

        feat = nn.relu(bn("bn6", FC_BN_EPS)(nn.Dense(512, name="fc1")(feat)))
        feat = nn.Dropout(0.3, deterministic=not train)(feat)
        feat = nn.relu(bn("bn7", FC_BN_EPS)(nn.Dense(256, name="fc2")(feat)))
        feat = nn.Dropout(0.3, deterministic=not train)(feat)
        logits = nn.Dense(self.classes, name="fc3")(feat)

        if train:
            return logits, t_feat
        if self.return_idx:
            return logits, pool_idx
        return logits
