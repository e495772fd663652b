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


class TransformNet(nn.Module):
    """KxK spatial/feature transform net (reference Model/PointNet.py:56-94)."""

    K: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [b, n, K] -> [b, K, K]
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            epsilon=CONV_BN_EPS,
            momentum=0.9,
            name=name,
        )
        h = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        h = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(h)))
        h = nn.relu(bn("bn3")(nn.Dense(1024, name="conv3")(h)))
        h = jnp.max(h, axis=1)  # [b, 1024]
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

    @nn.compact
    def __call__(self, pc: jax.Array, train: bool = False):
        assert pc.shape[-1] == 3, "expected channel-last [b, n, 3]"
        bn = lambda name, eps: nn.BatchNorm(
            use_running_average=not train, epsilon=eps, momentum=0.9, name=name
        )

        t_in = TransformNet(K=3, name="input_transform")(pc, train=train)
        feat = jnp.einsum("bnk,bkj->bnj", pc, t_in)
        feat = nn.relu(bn("bn1", CONV_BN_EPS)(nn.Dense(64, name="conv1")(feat)))
        feat = nn.relu(bn("bn2", CONV_BN_EPS)(nn.Dense(64, name="conv2")(feat)))

        t_feat = TransformNet(K=64, name="feature_transform")(feat, train=train)
        feat = jnp.einsum("bnk,bkj->bnj", feat, t_feat)
        feat = nn.relu(bn("bn3", CONV_BN_EPS)(nn.Dense(64, name="conv3")(feat)))
        feat = nn.relu(bn("bn4", CONV_BN_EPS)(nn.Dense(128, name="conv4")(feat)))
        # conv5: kernel-3 conv over the (padded) point axis (reference :110)
        feat = nn.Conv(
            1024, kernel_size=(3,), padding=[(1, 1)], name="conv5"
        )(feat)
        feat = nn.relu(bn("bn5", CONV_BN_EPS)(feat))
        feat = jnp.max(feat, axis=1)  # [b, 1024]

        feat = nn.relu(bn("bn6", FC_BN_EPS)(nn.Dense(512, name="fc1")(feat)))
        feat = nn.Dropout(0.3, deterministic=not train)(feat)
        feat = nn.relu(bn("bn7", FC_BN_EPS)(nn.Dense(256, name="fc2")(feat)))
        feat = nn.Dropout(0.3, deterministic=not train)(feat)
        logits = nn.Dense(self.classes, name="fc3")(feat)

        if train:
            return logits, t_feat
        return logits
