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

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _CP = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
except Exception:  # pragma: no cover
    _CP = None

_INF = 3.4e38


def nn1_select_default() -> str:
    """'packed' (DEFAULT: ONE int-min reduction per argmin over quantised
    distance bits with the index packed into the truncated mantissa —
    near-tie swaps ~2^-13 relative; the losses recompute exact distances
    from the gathered coordinates, so only WHICH near-tie neighbour is
    picked can differ) or 'exact' (GEOA3_NN1_SELECT=exact: two f32
    reductions per argmin, bit-exact lowest-index ties).

    Packed became the default in round 4 after the isolation e2e recert
    measured IDENTICAL perturbation quality to exact (250/250 success,
    CD 0.00236 vs 0.00236, HD 0.01175 vs 0.0119 — runs/packed_recert.py
    nn1 arm) at 4.03 -> 3.91 ms/step on the PointNet attack (unlike
    kappa-packed, which costs measurable CD/HD and stays opt-in: the 1-NN
    selection feeds only the chamfer/HD gather, whose loss value is
    recomputed exactly from the chosen coordinates, while the kappa mask
    changes the curvature statistic itself)."""
    import os

    v = os.environ.get("GEOA3_NN1_SELECT", "packed")
    return v if v in ("exact", "packed") else "packed"


def _dist(q, p, exact: bool):
    """[R, m] squared distances. exact: HIGHEST (bit-exact selection
    contract); packed mode: hi/lo split (~2^-16, finer than the packed
    quantisation — see kappa_kernel._dist_block)."""
    from geoa3_tpu.ops.pallas.kappa_kernel import _dist_block

    return _dist_block(q, p, exact=exact)


def _pack(d, idx_plane, bits: int):
    """Monotone packed keys: truncated nonneg-f32 bit pattern | index."""
    quant = jnp.int32(-(1 << bits))
    return jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(d, jnp.int32), quant),
        idx_plane,
    )


def _nn1_dual_kernel(
    adv_ref, ori_ref, a2o_ref, o2a_min_ref, o2a_idx_ref,
    *, R: int, nblk: int, select: str
):
    """adv_ref [1, R, 3]; ori_ref [1, m, 3]; a2o_ref [1, 1, R] int32;
    o2a_min_ref [1, 1, m] f32|int32 / o2a_idx_ref [1, 1, m] int32
    (revisited). Outputs carry a singleton middle dim so the (sublane,
    lane) block dims satisfy Mosaic's (8, 128)-divisibility rule for any
    batch size."""
    j = pl.program_id(1)
    q = adv_ref[0]  # [R, 3] — this adv row block
    p = ori_ref[0]  # [m, 3]
    m = p.shape[0]
    n = R * nblk

    d = _dist(q, p, exact=(select != "packed"))  # [R, m]
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + j * R

    if select == "packed":
        mb = max(1, (m - 1).bit_length())
        nb = max(1, (n - 1).bit_length())
        a2o_ref[0, 0] = jnp.bitwise_and(
            jnp.min(_pack(d, col, mb), axis=1), (1 << mb) - 1
        )
        cpk = jnp.min(_pack(d, row, nb), axis=0)  # [m] packed column mins

        @pl.when(j == 0)
        def _initp():
            o2a_min_ref[0, 0] = cpk
            o2a_idx_ref[0, 0] = jnp.bitwise_and(cpk, (1 << nb) - 1)

        @pl.when(j > 0)
        def _foldp():
            best = jnp.minimum(o2a_min_ref[0, 0], cpk)
            o2a_min_ref[0, 0] = best
            o2a_idx_ref[0, 0] = jnp.bitwise_and(best, (1 << nb) - 1)

        return

    # ---- adv -> ori: plain row argmin (lowest index on ties) ----
    rmin = jnp.min(d, axis=1)
    a2o_ref[0, 0] = jnp.min(
        jnp.where(d == rmin[:, None], col, m), axis=1
    ).astype(jnp.int32)

    # ---- ori -> adv: column mins folded across row blocks ----
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


@functools.partial(jax.jit, static_argnames=("row_block", "select"))
def nn1_dual_pallas(
    adv: jax.Array, ori: jax.Array, row_block: int = 256,
    select: str = "exact",
):
    """adv [b, n, 3], ori [b, m, 3] -> (a2o_idx [b, n], o2a_idx [b, m]) int32.

    a2o_idx[i] = argmin_j ||adv_i - ori_j||; o2a_idx[j] = argmin_i likewise.
    Exact; ties break to the lowest index (matches jnp.argmin).
    select='packed': single-reduction argmins over quantised distance bits
    (see nn1_select_default).
    """
    b, n, _ = adv.shape
    m = ori.shape[1]
    R = min(row_block, n)
    assert n % R == 0, "n must divide by row_block"
    grid = (b, n // R)

    a2o, _, o2a = pl.pallas_call(
        functools.partial(
            _nn1_dual_kernel, R=R, nblk=n // R, select=select
        ),
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
            jax.ShapeDtypeStruct(
                (b, 1, m),
                jnp.int32 if select == "packed" else jnp.float32,
            ),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        compiler_params=_CP,
    )(adv.astype(jnp.float32), ori.astype(jnp.float32))
    return a2o[:, 0], o2a[:, 0]


def _sel_copy3(src8, oh_bf16, dn):
    """Exact f32 copy of payload planes through a bf16 one-hot: 3 bf16
    mantissa segments, single non-zero term per output column."""
    acc = None
    rest = src8
    for _ in range(3):
        h = rest.astype(jnp.bfloat16)
        rest = rest - h.astype(jnp.float32)
        t = jax.lax.dot_general(
            h, oh_bf16, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        acc = t if acc is None else acc + t
    return acc


def _nn1_payload_kernel(
    adv_ref, ori_ref, pay_ref, qp_ref,
    a2o_ref, gp_ref, o2a_min_ref, o2a_idx_ref, op_ref,
    *, R: int, nblk: int, select: str
):
    """Dual 1-NN + constant-payload gathers at BOTH argmin directions.

    pay_ref [1, 8, m]: constant per-ori-point payload planes (the attack
    packs ori x/y/z, normal x/y/z, kappa_ori, zero). gp_ref [1, 8, R]:
    payload rows gathered at each adv row's nearest ori point — replaces
    four XLA row-gathers (~0.7 ms/step at b=32) that the fused loss paid
    every step for a2o_nn / borrowed-normal / onenn_ori_kappa. The copy is
    exact: the transposed one-hot is built directly in [m, R] orientation
    (one VPU pass) and three non-overlapping bf16-split MXU dots
    reconstruct the f32 payload bitwise (single non-zero term per column);
    the dots are tiny (M=8) and overlap the next block's VPU reductions.

    qp_ref [1, 8, R]: THIS adv row block's coordinate planes (rows 0..2 =
    x/y/z; precomputed outside to avoid an in-kernel transpose).
    op_ref [1, 8, m] (revisited): adv coordinate planes of each ori
    column's nearest adv row — the o2a-side chamfer gather
    (ops.gather_rows3's forward, an XLA dynamic-row take that cost
    ~0.14 ms/step at [32, 1024] and grows with m on dense clouds). Folded
    across row blocks with the same better-mask as the o2a argmin, so
    op always matches o2a_idx.
    """
    j = pl.program_id(1)
    q = adv_ref[0]  # [R, 3]
    p = ori_ref[0]  # [m, 3]
    m = p.shape[0]
    n = R * nblk

    d = _dist(q, p, exact=(select != "packed"))  # [R, m]

    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    if select == "packed":
        mb = max(1, (m - 1).bit_length())
        first = jnp.bitwise_and(
            jnp.min(_pack(d, col, mb), axis=1), (1 << mb) - 1
        )  # [R]
    else:
        rmin = jnp.min(d, axis=1)
        first = jnp.min(jnp.where(d == rmin[:, None], col, m), axis=1)
    a2o_ref[0, 0] = first.astype(jnp.int32)

    colT = jax.lax.broadcasted_iota(jnp.int32, (m, R), 0)
    ohT = (colT == first[None, :]).astype(jnp.bfloat16)  # [m, R]
    dn_c = (((1,), (0,)), ((), ()))
    gp_ref[0] = _sel_copy3(pay_ref[0], ohT, dn_c)  # [8, R]

    rowl = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0)  # local row ids
    row = rowl + j * R
    if select == "packed":
        nb = max(1, (n - 1).bit_length())
        cpk = jnp.min(_pack(d, row, nb), axis=0)
        loc = jnp.bitwise_and(cpk, (1 << nb) - 1) - j * R  # [m] local winner
        ohc = (rowl == loc[None, :]).astype(jnp.bfloat16)  # [R, m]
        sel = _sel_copy3(qp_ref[0], ohc, dn_c)  # [8, m] this block's coords

        @pl.when(j == 0)
        def _initp():
            o2a_min_ref[0, 0] = cpk
            o2a_idx_ref[0, 0] = jnp.bitwise_and(cpk, (1 << nb) - 1)
            op_ref[0] = sel

        @pl.when(j > 0)
        def _foldp():
            prev = o2a_min_ref[0, 0]
            better = cpk < prev  # packed keys: min == strictly-less fold
            o2a_min_ref[0, 0] = jnp.where(better, cpk, prev)
            o2a_idx_ref[0, 0] = jnp.bitwise_and(
                jnp.where(better, cpk, prev), (1 << nb) - 1
            )
            op_ref[0] = jnp.where(better[None, :], sel, op_ref[0])

        return

    cmin = jnp.min(d, axis=0)
    cloc = jnp.min(jnp.where(d == cmin[None, :], rowl, 1 << 30), axis=0)
    cidx = cloc + j * R
    ohc = (rowl == cloc[None, :]).astype(jnp.bfloat16)  # [R, m]
    sel = _sel_copy3(qp_ref[0], ohc, dn_c)  # [8, m]

    @pl.when(j == 0)
    def _init():
        o2a_min_ref[0, 0] = cmin
        o2a_idx_ref[0, 0] = cidx.astype(jnp.int32)
        op_ref[0] = sel

    @pl.when(j > 0)
    def _fold():
        prev_min = o2a_min_ref[0, 0]
        prev_idx = o2a_idx_ref[0, 0]
        # strictly-less keeps the earliest (lowest-index) argmin on ties
        better = cmin < prev_min
        o2a_min_ref[0, 0] = jnp.where(better, cmin, prev_min)
        o2a_idx_ref[0, 0] = jnp.where(better, cidx.astype(jnp.int32), prev_idx)
        op_ref[0] = jnp.where(better[None, :], sel, op_ref[0])


@functools.partial(jax.jit, static_argnames=("row_block", "select"))
def nn1_dual_payload_pallas(
    adv: jax.Array, ori: jax.Array, payload: jax.Array,
    row_block: int = 256, select: str = "exact",
):
    """adv [b, n, 3], ori [b, m, 3], payload [b, 8, m] (constant planes) ->
    (a2o_idx [b, n], o2a_idx [b, m], gathered payload gp [b, 8, n],
    o2a adv-coordinate planes op [b, 8, m]).

    gp[b, p, i] = payload[b, p, a2o_idx[b, i]] and
    op[b, c, j] = adv[b, o2a_idx[b, j], c] (rows 3..7 zero) — exact f32
    copies (the one-hot builds consume whichever argmins `select`
    produced, so the copies stay exact in packed mode too).
    """
    b, n, _ = adv.shape
    m = ori.shape[1]
    R = min(row_block, n)
    assert n % R == 0, "n must divide by row_block"
    grid = (b, n // R)

    advf = adv.astype(jnp.float32)
    # adv coordinate planes [b, 8, n] (rows 3..7 zero): the kernel's
    # per-block qp input — sliced by the grid, no in-kernel transpose
    qp = jnp.concatenate(
        [jnp.swapaxes(advf, 1, 2), jnp.zeros((b, 5, n), jnp.float32)],
        axis=1,
    )
    a2o, gp, _, o2a, op = pl.pallas_call(
        functools.partial(
            _nn1_payload_kernel, R=R, nblk=n // R, select=select
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, m), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, R), lambda i, j: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 8, R), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0)),  # revisited
            pl.BlockSpec((1, 1, m), lambda i, j: (i, 0, 0)),  # revisited
            pl.BlockSpec((1, 8, m), lambda i, j: (i, 0, 0)),  # revisited
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
            jax.ShapeDtypeStruct(
                (b, 1, m),
                jnp.int32 if select == "packed" else jnp.float32,
            ),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, m), jnp.float32),
        ],
        compiler_params=_CP,
    )(
        advf, ori.astype(jnp.float32),
        payload.astype(jnp.float32), qp,
    )
    return a2o[:, 0], o2a[:, 0], gp, op
