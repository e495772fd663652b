"""Data-smoothness metric (TPU-native rebuild of reference
Measurement/compute_data_smoothness.py:30-86).

Per cloud: estimate per-point normals from the k2-NN covariance (smallest
eigenvector, no sign fix — the metric takes |.| anyway), then
smoothness = max over points of mean_k |<nbr - p, normal>|. The reference
loops numpy eig per point; here it is one batched `jnp.linalg.eigh`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoa3_tpu import ops


def smoothness(pc: jax.Array, k: int = 16, k2: int = 16) -> jax.Array:
    """pc [b, n, 3] -> smoothness [b].

    Matches compute_data_smoothness.py:48-66: normals from k2 neighbours,
    projection magnitudes over k neighbours, per-point mean, per-cloud max.
    Offsets are taken from the point itself (the reference's FIXME hypothesis
    that the plane passes through the point, :63-64).
    """
    pc = jax.lax.stop_gradient(pc)
    res2 = ops.knn_points(pc, pc, k=k2 + 1)
    nn2 = ops.knn_gather(pc, res2.idx[..., 1:])  # [b, n, k2, 3]
    offsets2 = nn2 - pc[:, :, None, :]
    # np.cov over the point's neighbour offsets (row-mean removed, /(k2-1))
    centered = offsets2 - offsets2.mean(axis=2, keepdims=True)
    cov = jnp.einsum("bnkc,bnkd->bncd", centered, centered) / (k2 - 1)
    _, eigvec = jnp.linalg.eigh(cov)
    normal = eigvec[..., :, 0]  # smallest-eigenvalue direction, [b, n, 3]

    res = ops.knn_points(pc, pc, k=k + 1)
    nn = ops.knn_gather(pc, res.idx[..., 1:])  # [b, n, k, 3]
    offsets = nn - pc[:, :, None, :]
    s = jnp.abs(jnp.sum(offsets * normal[:, :, None, :], axis=-1)).mean(axis=-1)
    return s.max(axis=-1)
