"""Scatter-add Pallas kernel for the kNN-gather backward.

XLA lowers `zeros.at[batch, idx].add(ct)` on TPU as sort + segmented reduce —
~8 ms/step for the [b=32, n=1024, k=17, 3] self-kNN cotangents (profiled:
fusion.594 + sort.4 in the attack step). This kernel computes the same
scatter as k one-hot matmuls per (batch, row-block) tile:

    out[mm, :] = sum_{i,j} [idx[i,j] == mm] * ct[i,j, :]
               = sum_j  onehot_j[mm, i] @ ct_j[i, :]

with the one-hot built by an iota compare in VMEM and the contraction on the
MXU (precision=HIGHEST so the 1.0 * ct products are exact f32 — the result is
then bit-identical to a sequential f32 scatter-add up to summation order,
same as CUDA atomicAdd in the reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Pin the kernels' engineered bf16 dot passes against ambient
# jax.default_matmul_precision (HIGHEST on bf16 operands is rejected by
# Mosaic, and any override would change the kernels' accuracy contract).
_PDEF = jax.lax.Precision.DEFAULT


def _scatter3_kernel(idx_ref, ct_ref, out_ref, *, k: int, n: int):
    """idx_ref [1, k, n] int32; ct_ref [1, k, 3, n] f32;
    out_ref [1, TM, 3] f32 (one m-block of the scatter target)."""
    tm = out_ref.shape[1]
    m_start = pl.program_id(1) * tm
    # rows of this output block: global indices m_start + [0, tm)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tm, n), 0) + m_start
    )  # [tm, n]

    acc = jnp.zeros((tm, 3), jnp.float32)
    for j in range(k):
        idx_j = idx_ref[0, j, :][None, :]  # [1, n]
        # the one-hot is EXACT in bf16 (0.0/1.0); split the cotangents into
        # bf16 hi+lo parts so two single-pass bf16 MXU matmuls reach ~2^-16
        # relative accuracy instead of the 6-pass f32-emulation of
        # precision=HIGHEST (~3x the MXU time for gradient bits Adam ignores)
        onehot = (row_ids == idx_j).astype(jnp.bfloat16)  # [tm, n]
        ct_j = ct_ref[0, j]  # [3, n] f32
        hi = ct_j.astype(jnp.bfloat16)
        lo = (ct_j - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        acc = (
            acc
            + jax.lax.dot_general(
                onehot, hi, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=_PDEF,
            )
            + jax.lax.dot_general(
                onehot, lo, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
                precision=_PDEF,
            )
        )
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("m", "m_block"))
def scatter_add_pallas(
    idx: jax.Array, ct: jax.Array, m: int, m_block: int = 256
) -> jax.Array:
    """Scatter-add neighbour cotangents: idx [b, n, k], ct [b, n, k, 3] ->
    [b, m, 3] with out[b, idx[b,i,j]] += ct[b,i,j]."""
    b, n, k = idx.shape
    idx_t = idx.transpose(0, 2, 1)  # [b, k, n]
    ct_t = ct.transpose(0, 2, 3, 1)  # [b, k, 3, n]
    tm = min(m_block, m)
    assert m % tm == 0, "m must divide by m_block"
    grid = (b, m // tm)

    return pl.pallas_call(
        functools.partial(_scatter3_kernel, k=k, n=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, k, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, 3, n), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, 3), jnp.float32),
    )(idx_t, ct_t.astype(jnp.float32))


def _scatter_nc_kernel(idx_ref, ct_ref, out_ref, *, sc: int):
    """Generalised C-channel scatter, one (m-block, source-chunk) grid cell:
    idx_ref [1, 1, sc] int32; ct_ref [1, sc, C] f32; out_ref [1, TM, C]
    (revisited across the source-chunk grid dim; TPU grids are sequential)."""
    tm, C = out_ref.shape[1], out_ref.shape[2]
    m_start = pl.program_id(1) * tm
    ci = pl.program_id(2)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tm, sc), 0) + m_start
    )
    dn = (((1,), (0,)), ((), ()))
    idx_c = idx_ref[0, 0, :][None, :]  # [1, sc]
    onehot = (row_ids == idx_c).astype(jnp.bfloat16)  # [tm, sc]
    ct_c = ct_ref[0]  # [sc, C]
    hi = ct_c.astype(jnp.bfloat16)
    lo = (ct_c - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    contrib = jax.lax.dot_general(
        onehot, hi, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    ) + jax.lax.dot_general(
        onehot, lo, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )

    @pl.when(ci == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(ci > 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(jax.jit, static_argnames=("m", "m_block", "src_chunk"))
def scatter_add_nc_pallas(
    idx: jax.Array,
    ct: jax.Array,
    m: int,
    m_block: int = 256,
    src_chunk: int = 1024,
) -> jax.Array:
    """C-channel scatter-add: idx [b, S], ct [b, S, C] -> [b, m, C] with
    out[b, idx[b, s]] += ct[b, s]. Used for the grouping-gather backward
    ([b, npoint, nsample, C] cotangents in PointNet++)."""
    b, S = idx.shape
    C = ct.shape[-1]
    s_pad = (-S) % src_chunk
    if s_pad:
        # pad with out-of-range indices (contribute to no row)
        idx = jnp.concatenate(
            [idx, jnp.full((b, s_pad), m, idx.dtype)], axis=1
        )
        ct = jnp.concatenate(
            [ct, jnp.zeros((b, s_pad, C), ct.dtype)], axis=1
        )
        S += s_pad
    tm = min(m_block, m)
    assert m % tm == 0, "m must divide by m_block"
    chunks = S // src_chunk
    grid = (b, m // tm, chunks)

    return pl.pallas_call(
        functools.partial(_scatter_nc_kernel, sc=src_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, src_chunk), lambda i, j, ci: (i, 0, ci)),
            pl.BlockSpec((1, src_chunk, C), lambda i, j, ci: (i, ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, tm, C), lambda i, j, ci: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, C), jnp.float32),
    )(idx[:, None, :], ct.astype(jnp.float32))


def _scatter3t_kernel(idx_ref, ct_ref, out_ref, *, sc: int):
    """Transposed 3-plane scatter: one (m-block, source-chunk) grid cell.

    idx_ref [1, 1, sc] int32 (lane vector — the natural layout of a
    reshaped [b, S] index array, no relayout copy); ct_ref [1, 8, sc] f32
    (rows 0..2 = x/y/z planes, 3..7 zero); out_ref [1, 8, TM].

    Emitting the product as [8(sublane), TM(lane)] instead of [TM, 3] keeps
    the matmul's minor dimension full: the old layout padded the 3 output
    LANES to 128 (~42x wasted MXU slots); sublane padding 3->8 wastes only
    2.7x. ~16x fewer MAC slots overall. The one-hot is built as
    [TM(sub), sc(lane)] so the idx block streams straight off lanes.
    """
    tm = out_ref.shape[2]
    m_start = pl.program_id(1) * tm
    ci = pl.program_id(2)
    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (tm, sc), 0) + m_start
    )  # [tm, sc]
    onehot = (row_ids == idx_ref[0]).astype(jnp.bfloat16)  # [tm, sc]
    ct = ct_ref[0]  # [8, sc] f32
    hi = ct.astype(jnp.bfloat16)
    lo = (ct - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))  # contract sc with sc (B transposed)
    contrib = jax.lax.dot_general(
        hi, onehot, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    ) + jax.lax.dot_general(
        lo, onehot, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )

    @pl.when(ci == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(ci > 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(jax.jit, static_argnames=("m", "m_block", "src_chunk"))
def scatter_add_3t_pallas(
    idx: jax.Array,
    ct: jax.Array,
    m: int,
    m_block: int = 256,
    src_chunk: int = 2048,
) -> jax.Array:
    """3-channel scatter-add, transposed-matmul layout: idx [b, S],
    ct [b, S, 3] -> [b, m, 3] with out[b, idx[b, s]] += ct[b, s].

    Same accuracy contract as the other kernels here: exact bf16 one-hot x
    split-bf16 hi/lo cotangents, ~2^-16 relative error."""
    b, S = idx.shape
    s_pad = (-S) % src_chunk
    if s_pad:
        idx = jnp.concatenate(
            [idx, jnp.full((b, s_pad), m, idx.dtype)], axis=1
        )
        ct = jnp.concatenate(
            [ct, jnp.zeros((b, s_pad, 3), ct.dtype)], axis=1
        )
        S += s_pad
    # planes-on-sublanes layout: [b, 8, S], rows 3..7 zero
    ct_t = jnp.concatenate(
        [
            ct.astype(jnp.float32).transpose(0, 2, 1),
            jnp.zeros((b, 5, S), jnp.float32),
        ],
        axis=1,
    )
    tm = min(m_block, m)
    assert m % tm == 0, "m must divide by m_block"
    grid = (b, m // tm, S // src_chunk)

    out = pl.pallas_call(
        functools.partial(_scatter3t_kernel, sc=src_chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, src_chunk), lambda i, j, ci: (i, 0, ci)),
            pl.BlockSpec((1, 8, src_chunk), lambda i, j, ci: (i, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, 8, tm), lambda i, j, ci: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, 8, m), jnp.float32),
    )(idx[:, None, :], ct_t)
    return out[:, :3, :].transpose(0, 2, 1)
