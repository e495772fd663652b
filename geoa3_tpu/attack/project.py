"""Offset projection, L-inf clipping, normal estimation, tangent jitter.

TPU-native rebuilds of the geometric helpers in reference
Attacker/geoA3_attack.py:59-98 and Lib/utility.py:33-149. All channel-last
([b, n, 3]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geoa3_tpu import ops


def offset_proj(
    offset: jax.Array, ori_pc: jax.Array, ori_normal: jax.Array
) -> jax.Array:
    """Project each offset onto the normal direction of its nearest ORIGINAL point.

    Reference geoA3_attack.py:59-77. Note the reference's `condition_inner`
    is all-zeros (:63) so the projection applies unconditionally — reproduced.
    The kNN is keyed on the OFFSET coordinates (not adv points), exactly as
    the reference does (:65).
    """
    one_nn = ops.knn_points(offset, ori_pc, k=1)
    normal = ops.knn_gather(ori_normal, one_nn.idx)[:, :, 0, :]  # [b, n, 3]
    normal_len = jnp.sqrt(jnp.sum(normal**2, axis=-1, keepdims=True))
    unit = normal / (normal_len + 1e-6)
    return jnp.sum(offset * unit, axis=-1, keepdims=True) * unit


def find_offset(ori_pc: jax.Array, adv_pc: jax.Array) -> jax.Array:
    """Recompute offsets relative to each adv point's nearest original point.

    Reference geoA3_attack.py:79-85.
    """
    one_nn = ops.knn_points(adv_pc, ori_pc, k=1)
    knn_pc = ops.knn_gather(ori_pc, one_nn.idx)[:, :, 0, :]
    return adv_pc - knn_pc


def lp_clip(offset: jax.Array, cc_linf: float) -> jax.Array:
    """Rescale per-point offsets with L2 norm > cc_linf onto the sphere.

    Reference geoA3_attack.py:88-98 (named lp_clip there; it is an L2
    per-point ball clip despite the linf name).
    """
    lengths = jnp.sqrt(jnp.sum(offset**2, axis=-1, keepdims=True))
    scaled = jnp.where(lengths > 1e-6, offset / lengths * cc_linf, 0.0)
    return jnp.where(lengths < cc_linf, offset, scaled)


def jitter_input(
    key: jax.Array, shape, sigma: float = 0.01, clip: float = 0.05
) -> jax.Array:
    """Clamped gaussian jitter (reference Lib/utility.py:33-38)."""
    assert clip > 0
    return jnp.clip(sigma * jax.random.normal(key, shape), -clip, clip)


def _local_covariance_eig(pc: jax.Array, k: int):
    """Eigendecomposition of each point's kNN covariance.

    pc [b, n, 3] -> (eigenvalues [b, n, 3] ascending, eigenvectors [b, n, 3, 3]
    as columns). Shared by normal estimation and tangent-jitter
    (reference Lib/utility.py:40-149).
    """
    res = ops.knn_points(pc, pc, k=k + 1)
    nn_pts = res.nbrs[:, :, 1:, :]  # [b, n, k, 3]
    centered = nn_pts - nn_pts.mean(axis=2, keepdims=True)
    cov = jnp.einsum("bnkc,bnkd->bncd", centered, centered) / (k - 1)
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending eigenvalues
    return eigval, eigvec, centered


def estimate_normal(pc: jax.Array, k: int) -> jax.Array:
    """Per-point normal = smallest eigvec of local covariance, sign-corrected.

    Reference Lib/utility.py:40-89 (torch.symeig path). Sign fix: flip so the
    normal points away from the local neighbour centroid (:62-64).
    """
    pc = jax.lax.stop_gradient(pc)
    eigval, eigvec, centered = _local_covariance_eig(pc, k)
    normal = eigvec[..., :, 0]  # smallest eigenvalue's vector, [b, n, 3]
    nbr_sum = centered.sum(axis=2)  # [b, n, 3]
    sign = -jnp.sign(jnp.sum(normal * nbr_sum, axis=-1, keepdims=True))
    return sign * normal


def estimate_normal_via_ori_normal(
    pc_adv: jax.Array, pc_ori: jax.Array, normal_ori: jax.Array, k: int
) -> jax.Array:
    """Borrow/average normals from the k nearest original points.

    Reference Lib/utility.py:91-108: unmoved points (1-NN dist < 1e-6) copy
    the nearest normal directly; moved points take the (renormalised) mean of
    the k nearest normals.
    """
    res = ops.knn_points(pc_adv, pc_ori, k=k)
    normal_pts = ops.knn_gather(normal_ori, res.idx)  # [b, n, k, 3]
    avg = normal_pts.mean(axis=2)
    avg = avg / (jnp.linalg.norm(avg, axis=-1, keepdims=True) + 1e-12)
    unmoved = (res.dists[..., 0] < 1e-6)[..., None]
    return jnp.where(unmoved, normal_pts[:, :, 0, :], avg)


def get_perpendicular_jitter(
    key: jax.Array, vector: jax.Array, sigma: float = 0.01, clip: float = 0.05
) -> jax.Array:
    """Jitter perpendicular to `vector` via clamped cross products.

    Reference Lib/utility.py:110-114 ("previous method" jitter).
    """
    k1, k2 = jax.random.split(key)
    aux1 = sigma * jax.random.normal(k1, vector.shape)
    aux2 = sigma * jax.random.normal(k2, vector.shape)
    return jnp.clip(jnp.cross(vector, aux1), -clip, clip) + jnp.clip(
        jnp.cross(vector, aux2), -clip, clip
    )


def estimate_perpendicular(
    key: jax.Array,
    pc: jax.Array,
    k: int,
    sigma: float = 0.01,
    clip: float = 0.05,
) -> jax.Array:
    """Tangent-plane jitter: top-2 local covariance eigvecs x gaussians, clamped.

    Reference Lib/utility.py:116-149. Returns [b, n, 3].
    """
    pc = jax.lax.stop_gradient(pc)
    _, eigvec, _ = _local_covariance_eig(pc, k)
    v1 = eigvec[..., :, 2]  # largest
    v2 = eigvec[..., :, 1]  # second largest
    b, n, _ = pc.shape
    k1, k2 = jax.random.split(key)
    a1 = sigma * jax.random.normal(k1, (b, n, 1))
    a2 = sigma * jax.random.normal(k2, (b, n, 1))
    return jnp.clip(v1 * a1, -clip, clip) + jnp.clip(v2 * a2, -clip, clip)
