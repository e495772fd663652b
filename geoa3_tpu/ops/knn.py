"""Exact k-nearest-neighbour ops (TPU-native replacement for pytorch3d kNN).

The reference leans on pytorch3d's CUDA ``knn_points``/``knn_gather`` for every
geometric loss and normal estimator (reference: Lib/loss_utils.py:10,
Lib/utility.py:11, Attacker/geoA3_attack.py:12). Here the distance matrix is
built as one MXU matmul (||a||^2 + ||b||^2 - 2 a.b^T) and the k smallest
entries come from ``lax.top_k`` — XLA fuses the row norms into the matmul
epilogue, so the whole thing is a single HBM pass at the sizes GeoA3 uses
(n <= 10k).

Returned distances are **squared** Euclidean distances, matching pytorch3d
(and therefore every reference loss built on them).

Gradient design: neighbour *indices* are treated as non-differentiable
(stop-gradient), and distances are recomputed from the gathered neighbour
coordinates, so the backward pass is a cheap gather-scatter instead of
back-propagating through the dense [n, m] distance matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KNNResult(NamedTuple):
    """Mirror of pytorch3d's KNN return: squared dists + indices, both [b, n, k]."""

    dists: jax.Array
    idx: jax.Array


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distance matrix between two point sets.

    a: [..., n, d], b: [..., m, d] -> [..., n, m].

    Same expansion the reference keeps in comments as the dense fallback
    (reference: Lib/loss_utils.py:30-31, Model/PointNet.py:29-35).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., n, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., m, 1]
    # One MXU matmul; accumulate in f32 regardless of input dtype.
    ab = jnp.einsum(
        "...nd,...md->...nm", a, b, preferred_element_type=jnp.float32
    )
    d = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * ab
    return jnp.maximum(d, 0.0)


def knn_points(query: jax.Array, points: jax.Array, k: int) -> KNNResult:
    """k nearest neighbours of `query` in `points`.

    query: [b, n, d], points: [b, m, d] -> (dists [b, n, k], idx [b, n, k]),
    sorted ascending by distance; dists are squared (pytorch3d semantics,
    reference: Lib/loss_utils.py:32-34).
    """
    d = pairwise_sqdist(jax.lax.stop_gradient(query), jax.lax.stop_gradient(points))
    # top_k gives the k LARGEST, sorted descending -> negate for k smallest asc.
    _, idx = jax.lax.top_k(-d, k)
    idx = jax.lax.stop_gradient(idx)
    # Recompute the selected distances differentiably from gathered coords.
    nbrs = knn_gather(points, idx)  # [b, n, k, d]
    diff = query[..., :, None, :] - nbrs
    dists = jnp.sum(diff * diff, axis=-1)
    return KNNResult(dists=dists, idx=idx)


def knn_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbour features: points [b, m, c], idx [b, n, k] -> [b, n, k, c].

    Equivalent of pytorch3d's ``knn_gather`` (reference: Lib/loss_utils.py:58).
    """
    return jnp.take_along_axis(
        points[:, None, :, :],  # [b, 1, m, c]
        idx[..., None],  # [b, n, k, 1]
        axis=2,
    )
