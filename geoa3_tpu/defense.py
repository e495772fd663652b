"""Point-removal defenses (TPU-native rebuild of reference defense.py:18-50).

Three defenses, all returning STATIC shapes so one XLA program serves the
whole eval set:
  * `random_drop`      — drop `drop_num` random points;
  * `outliers_fix_num` — drop the `drop_num` points with largest mean kNN
    distance (statistical outlier removal, fixed count);
  * `outliers_variance`— drop points whose mean kNN distance exceeds
    mean + alpha * std. The kept count is data-dependent, so the output is
    the full-size cloud with dropped slots REPLACED by the first kept point
    plus a boolean keep-mask; classify with `point_mask` (PointNet supports
    masked max-pools) or feed the padded cloud directly.

    The padding is classification-neutral for BOTH victim families:
    max-pool models trivially (duplicates never win a max), and
    FPS/ball-query models (PN++) because the duplicates sit in the SUFFIX
    with the coords of the FIRST kept point — CUDA-FPS starts at index 0 so
    they carry running min-dist 0 and are never sampled, and ball query pads
    empty slots with the first in-radius hit, whose coords equal the
    duplicates'. Padded logits == shrunk-cloud logits (pinned by
    tests/test_defense.py::test_pnpp_padded_variance_matches_shrunk), so
    this matches the reference, which materialises the shrunken cloud
    (defense.py:30-35).

The reference's torch versions (defense.py:18-40) materialise the cloud at
its shrunken size; the pad+mask design is the TPU equivalent (static shapes,
no recompilation per instance).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from geoa3_tpu import ops


class DefenseResult(NamedTuple):
    pc: jax.Array  # [b, m, 3] (fixed-count modes) or [b, n, 3] (variance)
    keep_mask: jax.Array | None  # [b, n] bool, only for outliers_variance
    num_dropped: jax.Array  # [b] int32


def _mean_knn_dist(pc: jax.Array, k: int) -> jax.Array:
    """Mean NON-squared kNN distance per point, self excluded.

    Reference defense.py:26-27: dense pairwise sqrt'ed distances, topk k+1.
    """
    res = ops.knn_points(pc, pc, k=k + 1)
    d = jnp.sqrt(res.dists[..., 1:] + 1e-20)
    return d.mean(axis=-1)  # [b, n]


def random_drop(pc: jax.Array, drop_num: int, key: jax.Array) -> DefenseResult:
    """Drop `drop_num` random points, preserving index order (reference :18-23)."""
    b, n, _ = pc.shape
    # per-cloud random permutation; keep the (n-drop) positions, sorted
    noise = jax.random.uniform(key, (b, n))
    keep_idx = jnp.argsort(noise, axis=-1)[:, drop_num:]
    keep_idx = jnp.sort(keep_idx, axis=-1)
    out = ops.gather_points(pc, keep_idx)
    return DefenseResult(out, None, jnp.full((b,), drop_num, jnp.int32))


def outliers_fix_num(
    pc: jax.Array, drop_num: int, outlier_knn: int
) -> DefenseResult:
    """Keep the n-drop_num smallest mean-kNN-dist points, index order
    (reference :36-40)."""
    b, n, _ = pc.shape
    dis = _mean_knn_dist(pc, outlier_knn)
    keep = n - drop_num
    _, keep_idx = jax.lax.top_k(-dis, keep)  # smallest distances
    keep_idx = jnp.sort(keep_idx, axis=-1)
    out = ops.gather_points(pc, keep_idx)
    return DefenseResult(out, None, jnp.full((b,), drop_num, jnp.int32))


def outliers_variance(
    pc: jax.Array, alpha: float, outlier_knn: int
) -> DefenseResult:
    """Keep points with mean kNN dist < mean + alpha*std (reference :30-35).

    The kept count is data-dependent; the static-shape output COMPACTS the
    kept points to the front in original index order (exactly the reference's
    masked_select compaction), pads the tail with copies of the first kept
    point, and returns a suffix keep_mask. Classifying (pc, keep_mask) is then
    bit-equivalent to classifying the physically shrunken cloud.
    """
    b, n, _ = pc.shape
    dis = _mean_knn_dist(pc, outlier_knn)
    mean = dis.mean(axis=-1, keepdims=True)
    std = jnp.std(dis, axis=-1, ddof=1, keepdims=True)  # torch Bessel std
    keep = dis < mean + alpha * std  # [b, n]
    # stable sort: kept indices first, original order preserved
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=-1, stable=True)
    out = ops.gather_points(pc, order)
    count = keep.sum(axis=-1, keepdims=True)  # [b, 1]
    mask = jnp.arange(n)[None, :] < count  # suffix mask
    filler = out[:, :1, :]  # first kept point
    out = jnp.where(mask[..., None], out, filler)
    dropped = (n - count[:, 0]).astype(jnp.int32)
    return DefenseResult(out, mask, dropped)


def point_removal(
    pc: jax.Array,
    defense_type: str,
    drop_num: int,
    alpha: float,
    outlier_knn: int,
    key: jax.Array | None = None,
) -> DefenseResult:
    """Dispatch on defense type (reference `point_removal_fn`, defense.py:42-50)."""
    if defense_type == "rand_drop":
        assert key is not None, "rand_drop needs an RNG key"
        return random_drop(pc, drop_num, key)
    if defense_type == "outliers_variance":
        return outliers_variance(pc, alpha, outlier_knn)
    if defense_type == "outliers_fixNum":
        return outliers_fix_num(pc, drop_num, outlier_knn)
    raise AssertionError("Wrong defense type!")
