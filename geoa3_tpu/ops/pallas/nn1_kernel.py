"""Fused dual 1-NN Pallas kernel: both Chamfer directions in one pass.

The attack's distance losses need the adv->ori AND ori->adv nearest
neighbours every step (reference chamfer_loss, Lib/loss_utils.py:28-35). At
XLA level that is: materialise the [b, n, m] distance matrix to HBM, then two
argmin reduction passes — ~4 full-matrix HBM round trips. This kernel
computes each distance tile ONCE in VMEM and updates BOTH directions'
running (min, argmin) accumulators before the tile is discarded: one
distance-matrix pass total, nothing written to HBM but the [b, n] outputs.

Grid: (b, n/R) row blocks; the ori->adv accumulators use the revisited-output
pattern (same output block for every row step; TPU grids are sequential).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = 3.4e38


def _nn1_dual_kernel(
    adv_ref, ori_ref, a2o_ref, o2a_min_ref, o2a_idx_ref, *, R: int
):
    """adv_ref [1, R, 3]; ori_ref [1, m, 3]; a2o_ref [1, 1, R] int32;
    o2a_min_ref [1, 1, m] f32 / o2a_idx_ref [1, 1, m] int32 (revisited).
    Outputs carry a singleton middle dim so the (sublane, lane) block dims
    satisfy Mosaic's (8, 128)-divisibility rule for any batch size."""
    j = pl.program_id(1)
    q = adv_ref[0]  # [R, 3] — this adv row block
    p = ori_ref[0]  # [m, 3]
    m = p.shape[0]

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1)[None, :]
    qp = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)  # [R, m]

    # ---- adv -> ori: plain row argmin (lowest index on ties) ----
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    rmin = jnp.min(d, axis=1)
    a2o_ref[0, 0] = jnp.min(
        jnp.where(d == rmin[:, None], col, m), axis=1
    ).astype(jnp.int32)

    # ---- ori -> adv: column mins folded across row blocks ----
    row = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + j * R
    cmin = jnp.min(d, axis=0)  # [m]
    cidx = jnp.min(jnp.where(d == cmin[None, :], row, 1 << 30), axis=0)

    @pl.when(j == 0)
    def _init():
        o2a_min_ref[0, 0] = cmin
        o2a_idx_ref[0, 0] = cidx.astype(jnp.int32)

    @pl.when(j > 0)
    def _fold():
        prev_min = o2a_min_ref[0, 0]
        prev_idx = o2a_idx_ref[0, 0]
        # strictly-less keeps the earliest (lowest-index) argmin on ties
        better = cmin < prev_min
        o2a_min_ref[0, 0] = jnp.where(better, cmin, prev_min)
        o2a_idx_ref[0, 0] = jnp.where(better, cidx.astype(jnp.int32), prev_idx)


@functools.partial(jax.jit, static_argnames=("row_block",))
def nn1_dual_pallas(adv: jax.Array, ori: jax.Array, row_block: int = 256):
    """adv [b, n, 3], ori [b, m, 3] -> (a2o_idx [b, n], o2a_idx [b, m]) int32.

    a2o_idx[i] = argmin_j ||adv_i - ori_j||; o2a_idx[j] = argmin_i likewise.
    Exact; ties break to the lowest index (matches jnp.argmin).
    """
    b, n, _ = adv.shape
    m = ori.shape[1]
    R = min(row_block, n)
    assert n % R == 0, "n must divide by row_block"
    grid = (b, n // R)

    a2o, _, o2a = pl.pallas_call(
        functools.partial(_nn1_dual_kernel, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0)),  # revisited
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0)),  # revisited
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
    )(adv.astype(jnp.float32), ori.astype(jnp.float32))
    return a2o[:, 0], o2a[:, 0]


def _nn1_payload_kernel(
    adv_ref, ori_ref, pay_ref, a2o_ref, gp_ref, o2a_min_ref, o2a_idx_ref,
    *, R: int
):
    """Dual 1-NN + constant-payload gather at the adv->ori argmin.

    pay_ref [1, 8, m]: constant per-ori-point payload planes (the attack
    packs ori x/y/z, normal x/y/z, kappa_ori, zero). gp_ref [1, 8, R]:
    payload rows gathered at each adv row's nearest ori point — replaces
    four XLA row-gathers (~0.7 ms/step at b=32) that the fused loss paid
    every step for a2o_nn / borrowed-normal / onenn_ori_kappa. The copy is
    exact: the transposed one-hot is built directly in [m, R] orientation
    (one VPU pass) and three non-overlapping bf16-split MXU dots
    reconstruct the f32 payload bitwise (single non-zero term per column);
    the dots are tiny (M=8) and overlap the next block's VPU reductions.
    """
    j = pl.program_id(1)
    q = adv_ref[0]  # [R, 3]
    p = ori_ref[0]  # [m, 3]
    m = p.shape[0]

    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1)[None, :]
    qp = jax.lax.dot_general(
        q, p,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)  # [R, m]

    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    rmin = jnp.min(d, axis=1)
    first = jnp.min(jnp.where(d == rmin[:, None], col, m), axis=1)  # [R]
    a2o_ref[0, 0] = first.astype(jnp.int32)

    colT = jax.lax.broadcasted_iota(jnp.int32, (m, R), 0)
    ohT = (colT == first[None, :]).astype(jnp.bfloat16)  # [m, R]
    pay = pay_ref[0]  # [8, m] f32
    acc = None
    rest = pay
    for _ in range(3):  # 3 bf16 mantissa segments -> exact f32 copies
        h = rest.astype(jnp.bfloat16)
        rest = rest - h.astype(jnp.float32)
        t = jax.lax.dot_general(
            h, ohT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = t if acc is None else acc + t
    gp_ref[0] = acc  # [8, R]

    row = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + j * R
    cmin = jnp.min(d, axis=0)
    cidx = jnp.min(jnp.where(d == cmin[None, :], row, 1 << 30), axis=0)

    @pl.when(j == 0)
    def _init():
        o2a_min_ref[0, 0] = cmin
        o2a_idx_ref[0, 0] = cidx.astype(jnp.int32)

    @pl.when(j > 0)
    def _fold():
        prev_min = o2a_min_ref[0, 0]
        prev_idx = o2a_idx_ref[0, 0]
        better = cmin < prev_min
        o2a_min_ref[0, 0] = jnp.where(better, cmin, prev_min)
        o2a_idx_ref[0, 0] = jnp.where(better, cidx.astype(jnp.int32), prev_idx)


@functools.partial(jax.jit, static_argnames=("row_block",))
def nn1_dual_payload_pallas(
    adv: jax.Array, ori: jax.Array, payload: jax.Array,
    row_block: int = 256,
):
    """adv [b, n, 3], ori [b, m, 3], payload [b, 8, m] (constant planes) ->
    (a2o_idx [b, n], o2a_idx [b, m], gathered payload [b, 8, n]).

    gathered[b, p, i] = payload[b, p, a2o_idx[b, i]] — exact f32 copies.
    """
    b, n, _ = adv.shape
    m = ori.shape[1]
    R = min(row_block, n)
    assert n % R == 0, "n must divide by row_block"
    grid = (b, n // R)

    a2o, gp, _, o2a = pl.pallas_call(
        functools.partial(_nn1_payload_kernel, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, m), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 8, R), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0)),  # revisited
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0)),  # revisited
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
    )(
        adv.astype(jnp.float32), ori.astype(jnp.float32),
        payload.astype(jnp.float32),
    )
    return a2o[:, 0], o2a[:, 0], gp
