"""Fused exact kNN Pallas kernel.

Replaces the `pairwise_sqdist -> lax.top_k` pair for the loss-layer kNN calls.
XLA's exact top_k is a full row sort (~8x the reduction floor at n=1024 on
v5e); this kernel computes the distance block ONCE into VMEM via an MXU
matmul (||q||^2 + ||p||^2 - 2 q.p^T) and then runs k iterations of a
VMEM-resident row-argmin + mask — exact k-smallest with one HBM pass over
the inputs and no sort.

Cost model per (R x m) row block: 1 tiny matmul + k VPU reductions over a
VMEM-resident [R, m] block (~R*m*4 bytes each at VMEM bandwidth), so ~k x
10us for R=256, m=1024 — an order of magnitude under the XLA sort.

Semantics match `knn_points`: squared distances, ascending, ties broken by
lowest index (argmin convention; identical to the numpy oracle used in
tests/test_ops.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on non-TPU builds too; guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_INF = 3.4e38  # python float: jnp scalars would be captured tracers in kernels


class _KNN(NamedTuple):
    dists: jax.Array
    idx: jax.Array
    nbrs: jax.Array  # gathered neighbour coordinates [b, n, k, 3]


def pallas_available() -> bool:
    """True when running on a TPU backend where the kernel can compile."""
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _knn_kernel(q_ref, p_ref, dist_ref, idx_ref, x_ref, y_ref, z_ref, *, k: int):
    """One (row-block x full-points) tile: exact k smallest per row.

    q_ref: [1, R, 3], p_ref: [1, m, 3]; outputs [1, R, k] x5
    (dist, idx, and the neighbour x/y/z coordinate planes).

    Besides distances/indices, the kernel emits the gathered neighbour
    COORDINATES as exact VPU masked-sums over the one-hot row (sum of one
    non-zero f32 is exact) — XLA's gather of [*, 3] rows costs ~4 ms at this
    size on v5e, these reductions ride the VMEM-resident distance block.
    Coordinates are three [R, k] planes (a packed [R, k, 3] output would be
    lane-padded 3->128 and blow the VMEM budget).
    """
    q = q_ref[0]  # [R, 3]
    p = p_ref[0]  # [m, 3]
    R = q.shape[0]
    m = p.shape[0]

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)  # [R, 1]
    p2 = jnp.sum(p * p, axis=-1)[None, :]  # [1, m]
    # HIGHEST: Mosaic lowers default-precision f32 dots to one bf16 pass,
    # which can flip near-tie neighbour choices; the contraction dim is 3 so
    # the full-precision passes are free
    qp = jax.lax.dot_general(
        q,
        p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, m]
    d = jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)

    def body(j, d):
        vals = jnp.min(d, axis=-1)  # [R]
        # lowest-index tie break: first column achieving the row min
        is_min = d == vals[:, None]
        first = jnp.min(jnp.where(is_min, col, m), axis=-1)  # [R]
        onehot = (col == first[:, None]).astype(jnp.float32)  # [R, m]
        dist_ref[0, :, j] = vals
        idx_ref[0, :, j] = first
        # neighbour coords: exact masked-sum row copy (one non-zero term)
        x_ref[0, :, j] = jnp.sum(onehot * p[:, 0][None, :], axis=-1)
        y_ref[0, :, j] = jnp.sum(onehot * p[:, 1][None, :], axis=-1)
        z_ref[0, :, j] = jnp.sum(onehot * p[:, 2][None, :], axis=-1)
        # knock out the selected column for the next round
        return jnp.where(col == first[:, None], _INF, d)

    jax.lax.fori_loop(0, k, body, d, unroll=True)


@functools.partial(jax.jit, static_argnames=("k", "row_block"))
def knn_pallas(
    query: jax.Array, points: jax.Array, k: int, row_block: int = 256
) -> _KNN:
    """Exact kNN: query [b, n, 3], points [b, m, 3] -> (dists, idx) [b, n, k].

    Distances are squared euclidean, ascending. Rows are processed in blocks
    of `row_block`; n is padded up internally if needed.
    """
    b, n, _ = query.shape
    m = points.shape[1]
    R = min(row_block, n)
    n_pad = (-n) % R
    if n_pad:
        query = jnp.concatenate(
            [query, jnp.zeros((b, n_pad, 3), query.dtype)], axis=1
        )
    grid = (b, (n + n_pad) // R)

    plane = pl.BlockSpec((1, R, k), lambda i, j: (i, j, 0))
    plane_shape = jax.ShapeDtypeStruct((b, n + n_pad, k), jnp.float32)
    dists, idx, x, y, z = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[plane, plane, plane, plane, plane],
        out_shape=[
            plane_shape,
            jax.ShapeDtypeStruct((b, n + n_pad, k), jnp.int32),
            plane_shape,
            plane_shape,
            plane_shape,
        ],
    )(query.astype(jnp.float32), points.astype(jnp.float32))

    nbrs = jnp.stack([x, y, z], axis=-1)  # [b, n+pad, k, 3]
    if n_pad:
        dists, idx, nbrs = dists[:, :n], idx[:, :n], nbrs[:, :n]
    return _KNN(dists=dists, idx=idx, nbrs=nbrs)


@functools.partial(jax.jit, static_argnames=("k", "row_block"))
def knn_pallas_planes(
    query: jax.Array, points: jax.Array, k: int, row_block: int = 256
):
    """Like knn_pallas but returns (idx, x, y, z) coordinate planes [b, n, k]
    without materialising the lane-padded [b, n, k, 3] stack."""
    b, n, _ = query.shape
    m = points.shape[1]
    R = min(row_block, n)
    n_pad = (-n) % R
    if n_pad:
        query = jnp.concatenate(
            [query, jnp.zeros((b, n_pad, 3), query.dtype)], axis=1
        )
    grid = (b, (n + n_pad) // R)
    plane = pl.BlockSpec((1, R, k), lambda i, j: (i, j, 0))
    plane_shape = jax.ShapeDtypeStruct((b, n + n_pad, k), jnp.float32)
    _, idx, x, y, z = pl.pallas_call(
        functools.partial(_knn_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[plane, plane, plane, plane, plane],
        out_shape=[
            plane_shape,
            jax.ShapeDtypeStruct((b, n + n_pad, k), jnp.int32),
            plane_shape,
            plane_shape,
            plane_shape,
        ],
    )(query.astype(jnp.float32), points.astype(jnp.float32))
    if n_pad:
        idx, x, y, z = idx[:, :n], x[:, :n], y[:, :n], z[:, :n]
    return idx, x, y, z
