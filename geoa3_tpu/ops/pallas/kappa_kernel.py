"""Fused self-kNN curvature (kappa) Pallas kernel.

The attack's curvature loss (reference Lib/loss_utils.py:70-97,
`_get_kappa_adv`) needs, per point i of the adv cloud:

    kappa_i = mean_{j in kNN(i)} | unit(p_j - p_i) . n_i |

where n_i is the (constant) normal borrowed from the nearest original point.
The hot path previously ran the generic kNN kernel (k+1 argmin rounds, each
emitting the selected neighbour's x/y/z via masked sums), materialised the
[b, n, k, 3] neighbour block to HBM, recomputed unit vectors in XLA, and
paid a one-hot-matmul scatter (~0.9 ms) plus gather/reshape glue (~0.6 ms)
for the backward at b=32.

This kernel exploits that curvature only ever consumes kappa — the per-slot
neighbour structure is irrelevant. Per [R, m] row block:

  forward:  distance block once (MXU expansion) -> k+1 argmin/knockout
            rounds accumulating only a selection MASK -> kappa as ONE masked
            reduction of A = |(p_c - q_i).n_i| / max(||p_c - q_i||, eps)
            computed for the whole block from a second thin MXU matmul
            (p . n_i^T). No per-slot emission, no [b, n, k, 3] tensor.
  backward: analytic. dA/dp_c = sign.n_i/r - (A/r^2)(p_c - q_i) for selected
            pairs, so the input gradient is four thin HIGHEST matmuls over
            mask-weighted [R, m] matrices — the scatter-add disappears.

Numerics vs the composed path (knn_points -> normalize -> abs-dot-mean):
  * the selected neighbour SET is bit-identical (same distance expansion,
    same lowest-index tie-break as knn_kernel.py);
  * the SELF term is exactly zero: the center dot q_i.n_i is extracted from
    the same MXU matrix row (diagonal), so |pn_ii - s_i| == 0 bitwise, which
    reproduces the reference's slot-0 drop for coincident/self points;
  * A uses r = sqrt(q2+p2-2qp) (the selection expansion) instead of the
    direct-difference norm — for the ~0.05-radius neighbourhoods of a unit
    cloud this differs by ~1e-4 relative (catastrophic-cancellation bound),
    and the masked lane reduction reorders the mean, so kappa agrees with
    the composed path to ~1e-3 relative, NOT bitwise. The engine's fused
    loss documents this deviation; e2e success/CD/HD are re-certified with
    the kernel on (RESULTS.md).

The borrowed normals are loss constants (the payload gather is
non-differentiable), so the kernel differentiates w.r.t. the cloud only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_INF = 3.4e38
_EPS = 1e-12  # reference normalisation clamp (loss_utils.py:79)
_HI = jax.lax.Precision.HIGHEST
# pin engineered bf16 passes against ambient jax.default_matmul_precision
_PDEF = jax.lax.Precision.DEFAULT


def _dot_hilo(a, b, dn):
    """f32 dot via hi/lo split-bf16 (3 single-pass MXU products, ~2^-16
    relative — the scatter kernel's accuracy contract). HIGHEST is a
    6-product emulation whose [R, m] splits/combines ride the VPU beside
    the selection loop; this halves that traffic. Only used where 2^-16
    suffices (the A matrix and gradient weights), never for the selection
    distances."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    f = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn,
        preferred_element_type=jnp.float32, precision=_PDEF,
    )
    return f(ah, bh) + (f(ah, bl) + f(al, bh))


def _dist_block(q, p, exact: bool = True):
    """Squared-distance block [R, m] via the MXU expansion.

    exact=True: HIGHEST (6-pass f32 emulation) — bit-identical to
    knn_kernel.py so the selected neighbour set matches knn_points.
    exact=False (packed select only): hi/lo split (3 passes, ~2^-16
    relative) — strictly finer than the packed mode's own 2^-13 bit
    quantisation, so it cannot change which near-ties the quantisation
    already merges; halves the distance MXU work.
    """
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1)[None, :]
    dn = (((1,), (1,)), ((), ()))
    if exact:
        qp = jax.lax.dot_general(
            q, p, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=_HI,
        )
    else:
        qp = _dot_hilo(q, p, dn)
    return jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)


def _select_maskf(d0, diag, col, m: int, k: int, select: str):
    """The k-round knockout selection over one [R, m] distance block ->
    f32 membership mask (k+1 ones per row incl. the pre-selected self).
    Shared by the fused-kappa forward and the selection-only kernel so the
    selected SET is bitwise identical between them by construction."""
    if select == "packed":
        # SINGLE-reduction knockout rounds: d0 >= 0, so its f32 bit pattern
        # is order-isomorphic to the value; truncate the low mantissa bits
        # and pack the lane index there, then each round is ONE int-min
        # reduction (min value AND lowest-index tie-break in one key) plus
        # an elementwise knockout — vs the exact path's two f32 reductions
        # per round. The truncation (2^-13 relative at m=1024) can swap
        # near-tied neighbours, a perturbation well inside the kernel's
        # documented ~1e-3 kappa tolerance; opt-in via GEOA3_KAPPA_SELECT
        # with e2e re-certification (engine deviation discipline).
        idx_bits = max(1, (m - 1).bit_length())
        quant = jnp.int32(-(1 << idx_bits))
        pk0 = jnp.bitwise_or(
            jnp.bitwise_and(
                jax.lax.bitcast_convert_type(d0, jnp.int32), quant
            ),
            col,
        )
        # imax is unreachable as a live key: finite f32 bits <= 0x7F7FFFFF
        # and the or'ed index adds < 2^idx_bits below that, so pkm == imax
        # marks EXACTLY the knocked-out (and pre-masked self) columns — the
        # membership mask is derived once at the end instead of carrying a
        # boolean mask and paying a logical_or pass every round (3 full
        # [R, m] passes per round instead of 4).
        imax = jnp.int32(2**31 - 1)

        def body_packed(j, pkm):
            best = jnp.min(pkm, axis=-1)
            return jnp.where(pkm == best[:, None], imax, pkm)

        pkm = jax.lax.fori_loop(
            0, k, body_packed, jnp.where(diag, imax, pk0), unroll=True,
        )
        return (pkm == imax).astype(jnp.float32)

    # carry the f32 distance matrix with INF knockouts and derive the
    # membership mask ONCE at loop end (dm == _INF, unreachable as a
    # live d0 value), so neither the per-round re-mask of d0 nor a
    # per-round mask `or` pass exists: each round is 2 reductions + 2
    # elementwise passes. (History: a bool-mask carry with per-round
    # re-mask measured parity with the original dm carry, 2.43 vs
    # 2.41 ms fwd+bwd — but that variant still paid re-mask + or; the
    # packed mode's round-4 mask-at-end restructure measured
    # 3.85 -> 3.32 ms/step at the attack shape, and this is the same
    # restructure for the exact path.) Selected set is bitwise
    # identical: same masked argmin, same lowest-index tie-break.
    def body(j, dm):
        vals = jnp.min(dm, axis=-1)
        first = jnp.min(jnp.where(dm == vals[:, None], col, m), axis=-1)
        return jnp.where(col == first[:, None], _INF, dm)

    dmf = jax.lax.fori_loop(
        0, k, body, jnp.where(diag, _INF, d0), unroll=True
    )
    return (dmf == _INF).astype(jnp.float32)


def _kappa_fwd_kernel(
    q_ref, p_ref, nrm_ref, kappa_ref, mask_ref, *, k: int, select: str
):
    """q_ref [1, R, 3] (row block), p_ref [1, m, 3] (full cloud, == q),
    nrm_ref [1, R, 3] (borrowed normals); kappa_ref [1, 1, R] f32 (the
    singleton middle dim satisfies Mosaic's (8, 128) block-divisibility rule
    for per-row outputs), mask_ref [1, R, m] int8 (the k+1 selected columns
    per row, incl. self).
    """
    q = q_ref[0]
    p = p_ref[0]
    nv = nrm_ref[0]
    R = q.shape[0]
    m = p.shape[0]

    d0 = _dist_block(q, p, exact=(select != "packed"))
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    growm = (
        jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + pl.program_id(1) * R
    )

    # the self column is always in the reference's top-(k+1) (d_ii ~ 0 and
    # exact duplicates produce bit-equal distances, so the selected SET is
    # unchanged): pre-select it and run only k argmin rounds. Its kappa
    # contribution is exactly zero (see sdiag below), mirroring the
    # reference's slot-0 drop.
    diag = col == growm
    maskf = _select_maskf(d0, diag, col, m, k, select)

    # |(p_c - q_i) . n_i| / r_ic for the whole block: p.n_i from one thin
    # matmul; the center term q_i.n_i is the matrix's own diagonal (extracted
    # by masked reduce), so the self column's numerator is exactly zero.
    pn = _dot_hilo(nv, p, (((1,), (1,)), ((), ())))  # [R, m]
    sdiag = jnp.sum(jnp.where(diag, pn, 0.0), axis=-1)  # [R]
    rc = jnp.maximum(jnp.sqrt(d0), _EPS)
    a = jnp.abs(pn - sdiag[:, None]) / rc
    kappa_ref[0, 0] = jnp.sum(maskf * a, axis=-1) / k
    mask_ref[0] = maskf.astype(jnp.int8)


def _kappa_selmask_kernel(q_ref, p_ref, mask_ref, *, k: int, select: str):
    """Selection ONLY: the k-round knockout over one [R, m] row block ->
    int8 membership mask (k+1 ones per row incl. self). Identical selection
    code path as _kappa_fwd_kernel (shared _select_maskf), no kappa math.
    Used by the lazy-refresh engine path (curv_knn_refresh_every > 1):
    the mask is computed once per refresh block and consumed for K steps by
    _kappa_frommask_kernel + the shared analytic backward."""
    q = q_ref[0]
    p = p_ref[0]
    R = q.shape[0]
    m = p.shape[0]
    d0 = _dist_block(q, p, exact=(select != "packed"))
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    growm = (
        jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + pl.program_id(1) * R
    )
    diag = col == growm
    mask_ref[0] = _select_maskf(d0, diag, col, m, k, select).astype(jnp.int8)


def _kappa_frommask_kernel(
    q_ref, p_ref, nrm_ref, maskin_ref, kappa_ref, *, k: int
):
    """Mask-consuming kappa forward: the A matrix + masked reduction of
    _kappa_fwd_kernel with the selection mask passed IN — the 16-round
    knockout loop (the fused step's single largest cost, ~0.9 ms of the
    1.23 ms kappa forward at [32, 1024]) is skipped entirely. The distance
    block stays HIGHEST so A's numerics are bit-identical to the exact
    forward given the same mask."""
    q = q_ref[0]
    p = p_ref[0]
    nv = nrm_ref[0]
    R = q.shape[0]
    m = p.shape[0]
    d0 = _dist_block(q, p, exact=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    growm = (
        jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + pl.program_id(1) * R
    )
    diag = col == growm
    maskf = maskin_ref[0].astype(jnp.float32)
    pn = _dot_hilo(nv, p, (((1,), (1,)), ((), ())))  # [R, m]
    sdiag = jnp.sum(jnp.where(diag, pn, 0.0), axis=-1)  # [R]
    rc = jnp.maximum(jnp.sqrt(d0), _EPS)
    a = jnp.abs(pn - sdiag[:, None]) / rc
    kappa_ref[0, 0] = jnp.sum(maskf * a, axis=-1) / k


def _kappa_bwd_kernel(
    q_ref, pt_ref, nrm_ref, mask_ref, g_ref, out_ref, *, k: int
):
    """One query row block's gradient contributions, accumulated into the
    full-cloud planes output (revisited across the row-block grid dim).

    q_ref [1, R, 3]; pt_ref [1, 8, m] (cloud planes, rows 0..2 = x/y/z);
    nrm_ref [1, R, 3]; mask_ref [1, R, m] int8; g_ref [1, 1, R] (kappa
    cotangents); out_ref [1, 8, m] f32 planes (rows 3..7 stay zero).
    """
    j = pl.program_id(1)
    q = q_ref[0]  # [R, 3]
    pt = pt_ref[0]  # [8, m]
    nv = nrm_ref[0]  # [R, 3]
    maskf = mask_ref[0].astype(jnp.float32)  # [R, m]
    g = g_ref[0, 0]  # [R]
    R = q.shape[0]
    m = pt.shape[1]

    p3 = pt[:3]  # [3, m]
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p3 * p3, axis=0)[None, :]
    # the distance expansion cancels near neighbours, amplifying product
    # error ~1000x relative: hi/lo's 2^-16 absolute becomes ~1% of d0 —
    # keep this one dot at HIGHEST (measured: 2/1536 grads off by 0.8%)
    qp = jax.lax.dot_general(
        q, p3, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )
    d0 = jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)
    r = jnp.sqrt(d0)
    rc = jnp.maximum(r, _EPS)

    pn = _dot_hilo(nv, p3, (((1,), (0,)), ((), ())))  # [R, m]
    col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    grow = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + j * R
    oh = (col == grow).astype(jnp.float32)  # [R, m]: row i's own column
    sdiag = jnp.sum(oh * pn, axis=-1)
    dot = pn - sdiag[:, None]
    a = jnp.abs(dot) / rc

    # dA/dp_c = sign.n_i/rc - gate.(A/rc^2).(p_c - q_i); dA/dq_i = -dA/dp_c.
    # gate: the max(norm, eps) clamp stops the denominator gradient below eps
    # (the numerator part survives via W1), matching jax.grad of the
    # composed path. sign(0) = 0 kills both self terms exactly.
    gk = (g / k)[:, None]  # [R, 1]
    w1 = maskf * gk * jnp.sign(dot) / rc  # [R, m]
    w2 = maskf * gk * jnp.where(r > _EPS, a / (rc * rc), 0.0)  # [R, m]

    # neighbour-side planes [3, m]: sum_i W1.n_i + W2.q_i - colsum(W2).p_c
    dn_r = (((0,), (0,)), ((), ()))  # contract the R axis
    gp = (
        _dot_hilo(nv, w1, dn_r)
        + _dot_hilo(q, w2, dn_r)
        - jnp.sum(w2, axis=0)[None, :] * p3
    )  # [3, m]

    # center-side [R, 3] -> scattered onto this block's own columns via the
    # diagonal one-hot (an MXU dot; no dynamic-lane stores)
    w2p = _dot_hilo(w2, p3, (((1,), (1,)), ((), ())))  # [R, 3]
    gq = (
        -jnp.sum(w1, axis=1)[:, None] * nv
        + w2p
        - jnp.sum(w2, axis=1)[:, None] * q
    )  # [R, 3]
    # one-hot side is exact in bf16: split only gq (2 products)
    gqh = gq.astype(jnp.bfloat16)
    gql = (gq - gqh.astype(jnp.float32)).astype(jnp.bfloat16)
    ohb = oh.astype(jnp.bfloat16)
    _f = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn_r,
        preferred_element_type=jnp.float32, precision=_PDEF,
    )
    gcen = _f(gqh, ohb) + _f(gql, ohb)  # [3, m]

    contrib = jnp.concatenate(
        [gp + gcen, jnp.zeros((5, m), jnp.float32)], axis=0
    )  # [8, m]

    @pl.when(j == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(j > 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


# row-block working set: ~6 live [rb, m] f32 matrices (d0/r, pn, a/dot,
# w1, w2, mask decode) must fit the 64 MB VMEM limit -> rb * m <= ~2.75M
_RB_ELEM_BUDGET = 2_750_000


def _pick_row_block(n: int) -> int:
    # 512 measured best at [32, 1024, k=16]: 2.43 ms fwd+bwd vs 2.50 (256)
    # and 2.83 (128) — runs/bench_kappa_rb.py. Dense shapes scale the block
    # down so the [rb, n] working set stays VMEM-resident.
    for rb in (512, 256, 128):
        if n % rb == 0 and rb * n <= _RB_ELEM_BUDGET:
            return rb
    return 0


def kappa_padded_n(n: int) -> int:
    """The lane-aligned cloud size the kernel actually runs at: callers pad
    n -> this with far-away sentinel points (ops/knn.py::knn_kappa) and
    slice the result back. 128-multiples pass through unchanged."""
    return ((n + 127) // 128) * 128


def _kappa_backend_ok() -> bool:
    from geoa3_tpu.ops import dispatch

    if dispatch.pallas_disabled("kappa"):
        return False
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def kappa_pallas_available(n: int) -> bool:
    """Gate for the EXACT-shape kernel paths (direct kappa AND the
    [b, n, n] mask-cache path the engine's lazy refresh carries): TPU
    backend, lane-aligned rows, VMEM-sized cloud (kill switch
    GEOA3_DISABLE_PALLAS=kappa)."""
    if n % 128 != 0 or n > 4096 or _pick_row_block(n) == 0:
        return False
    return _kappa_backend_ok()


def kappa_dense_available(n: int) -> bool:
    """Gate for the PADDED direct-kappa path (ops/knn.py::knn_kappa):
    arbitrary n up to the reference's modelnet_pure dense clouds
    (n=10000, BASELINE config 3 — main_attack.py:213,283-295), run at
    kappa_padded_n(n) with far-away sentinel points and sliced back.
    Covers only kappa_pallas (fwd + analytic bwd); the mask-cache path
    keeps the exact-shape gate (its [b, n, n] carry is engine state)."""
    pad = kappa_padded_n(n)
    if pad > 12288 or _pick_row_block(pad) == 0:
        return False
    return _kappa_backend_ok()


@functools.partial(jax.jit, static_argnames=("k", "row_block", "select"))
def _kappa_fwd_call(cloud, normal, k, row_block, select="exact"):
    b, n, _ = cloud.shape
    grid = (b, n // row_block)
    kappa, mask = pl.pallas_call(
        functools.partial(_kappa_fwd_kernel, k=k, select=select),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, row_block), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, row_block, n), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, n), jnp.int8),
        ],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
            if _HAS_PLTPU
            else None
        ),
    )(cloud.astype(jnp.float32), cloud.astype(jnp.float32),
      normal.astype(jnp.float32))
    return kappa[:, 0], mask


@functools.partial(jax.jit, static_argnames=("k", "row_block"))
def _kappa_bwd_call(cloud, normal, mask, g, k, row_block):
    b, n, _ = cloud.shape
    grid = (b, n // row_block)
    pt = jnp.concatenate(
        [
            jnp.swapaxes(cloud.astype(jnp.float32), 1, 2),
            jnp.zeros((b, 5, n), jnp.float32),
        ],
        axis=1,
    )  # [b, 8, n]
    out = pl.pallas_call(
        functools.partial(_kappa_bwd_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, row_block, n), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, row_block), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
            if _HAS_PLTPU
            else None
        ),
    )(cloud.astype(jnp.float32), pt, normal.astype(jnp.float32), mask,
      g[:, None, :])
    return out[:, :3, :].transpose(0, 2, 1)


def kappa_select_default() -> str:
    """Selection-loop variant: 'exact' (two f32 reductions per knockout
    round, bit-identical neighbour set) or 'packed' (one int-min reduction
    per round over quantised distance bits, opt-in via
    GEOA3_KAPPA_SELECT=packed — near-tie swaps inside the kernel's ~1e-3
    kappa tolerance, e2e re-certified; see _kappa_fwd_kernel)."""
    import os

    v = os.environ.get("GEOA3_KAPPA_SELECT", "exact")
    return v if v in ("exact", "packed") else "exact"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def kappa_pallas(cloud, normal, k, row_block=256, select="exact"):
    """Curvature proxy on a self-kNN neighbourhood: cloud [b, n, 3],
    normal [b, n, 3] (constants) -> kappa [b, n].

    kappa_i = mean over the k nearest (non-self) neighbours of
    |unit(p_j - p_i) . n_i| — the fused equivalent of
    losses.get_kappa_adv's math with the normal passed in. Differentiable
    in `cloud` (analytic VJP, see module docstring); `normal` gets zeros.
    """
    kappa, _ = _kappa_fwd_call(
        cloud, normal, k=k, row_block=row_block, select=select
    )
    return kappa


def _kappa_vjp_fwd(cloud, normal, k, row_block, select):
    # jax>=0.9 custom_vjp: fwd keeps the primal signature (nondiff args in
    # place); bwd receives the nondiff args as leading arguments
    kappa, mask = _kappa_fwd_call(
        cloud, normal, k=k, row_block=row_block, select=select
    )
    return kappa, (
        jax.lax.stop_gradient(cloud),
        jax.lax.stop_gradient(normal),
        mask,
    )


def _kappa_vjp_bwd(k, row_block, select, res, g):
    del select  # backward consumes the forward's mask; no selection rerun
    cloud, normal, mask = res
    grad = _kappa_bwd_call(cloud, normal, mask, g.astype(jnp.float32), k=k,
                           row_block=row_block)
    return grad.astype(cloud.dtype), jnp.zeros_like(normal)


kappa_pallas.defvjp(_kappa_vjp_fwd, _kappa_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("k", "row_block", "select"))
def kappa_selmask_call(cloud, k, row_block, select="exact"):
    """Self-kNN membership mask only: cloud [b, n, 3] -> [b, n, n] int8
    (k+1 ones per row incl. self). Same selection as _kappa_fwd_call by
    shared code; non-differentiable (selection has no useful gradient)."""
    b, n, _ = cloud.shape
    grid = (b, n // row_block)
    mask = pl.pallas_call(
        functools.partial(_kappa_selmask_kernel, k=k, select=select),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, row_block, n), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.int8),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
            if _HAS_PLTPU
            else None
        ),
    )(cloud.astype(jnp.float32), cloud.astype(jnp.float32))
    return jax.lax.stop_gradient(mask)


@functools.partial(jax.jit, static_argnames=("k", "row_block"))
def _kappa_frommask_call(cloud, normal, mask, k, row_block):
    b, n, _ = cloud.shape
    grid = (b, n // row_block)
    kappa = pl.pallas_call(
        functools.partial(_kappa_frommask_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, 3), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, row_block, n), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, row_block), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
            if _HAS_PLTPU
            else None
        ),
    )(cloud.astype(jnp.float32), cloud.astype(jnp.float32),
      normal.astype(jnp.float32), mask)
    return kappa[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def kappa_frommask_pallas(cloud, normal, mask, k, row_block=256):
    """Kappa from a CACHED selection mask: cloud [b, n, 3], normal [b, n, 3]
    (constants), mask [b, n, n] int8 (k+1 ones per row incl. self, from
    kappa_selmask_call) -> kappa [b, n].

    Same A-matrix math as kappa_pallas but the knockout selection loop is
    skipped — the engine's curv_knn_refresh_every nested scan recomputes the
    mask once per block and holds it fixed inside (reference semantics
    refresh every step: loss_utils.py:70-85 re-selects per call — this is
    the engine's documented lazy-refresh perf option). Differentiable in
    `cloud` via the SAME analytic backward as kappa_pallas (it only ever
    consumed the mask); `normal` and `mask` get no gradient."""
    return _kappa_frommask_call(cloud, normal, mask, k=k, row_block=row_block)


def _kappa_fm_vjp_fwd(cloud, normal, mask, k, row_block):
    kappa = _kappa_frommask_call(cloud, normal, mask, k=k, row_block=row_block)
    return kappa, (
        jax.lax.stop_gradient(cloud),
        jax.lax.stop_gradient(normal),
        mask,
    )


def _kappa_fm_vjp_bwd(k, row_block, res, g):
    cloud, normal, mask = res
    grad = _kappa_bwd_call(cloud, normal, mask, g.astype(jnp.float32), k=k,
                           row_block=row_block)
    return grad.astype(cloud.dtype), jnp.zeros_like(normal), None


kappa_frommask_pallas.defvjp(_kappa_fm_vjp_fwd, _kappa_fm_vjp_bwd)

def _curv_term_frommask_kernel(
    q_ref, pt_ref, nrm_ref, mask_ref, ref_ref, sq_ref, out_ref, cen_ref,
    *, k: int, npts: int
):
    """Fused curvature TERM: per-row squared diff (kappa_i - ref_i)^2 AND the
    analytic gradient planes of sum_i (kappa_i - ref_i)^2 / npts, from ONE
    matrix build.

    The mask-consuming forward (_kappa_frommask_kernel) and the analytic
    backward (_kappa_bwd_kernel) each rebuild the same d0/pn matrices —
    together 46% of the 2.95 ms attack step at [32, 1024]. But the
    curvature loss's kappa-cotangent has a closed row-local form
    (2 (kappa_i - ref_i) / npts, reference loss_utils.py:84-97 mean of
    squared diffs), so one kernel can compute kappa, derive the local
    cotangent, and run the backward's thin matmuls while the matrices are
    VMEM-resident. The engine-level backward degenerates to scaling the
    planes by the per-instance scalar cotangent (const * weight / batch).

    Round-5 restructure (runs/bench_curv_term.py, 0.940 -> 0.829 ms/call
    at [32, 1024, k=16]):
      * d0 comes from DIRECT per-plane squared differences on the VPU (the
        selection already happened — the mask is an input — so expansion-
        bitwise-compatibility is moot, and the direct form is exactly what
        the reference's normalize computes: no q2+p2-2qp cancellation).
        Values move ~3e-7, gradient planes ~1e-3 of max vs the expansion
        form (both inside the kernel's documented tolerances).
      * the center-side gradient is written to its own (1, 8, R) output
        block at this row block's own columns (a STATIC block write) and
        summed with the neighbour-side planes outside — the one-hot bf16
        matmul scatter disappears.
      * sdiag comes from a direct [R, 3] rowwise dot (q_i . n_i); the self
        column (and exact duplicates) contribute exactly zero through the
        d0 == 0 gate on `inv` instead of a bitwise diagonal extraction —
        d0's self entry is an exact 0.0 in the direct-difference form, and
        the reference's 0/eps normalize zeroes those columns the same way
        (loss_utils.py:79). This drops the [R, m] one-hot build + masked
        reduce.
      * round-5b (0.704 -> 0.677 ms/call): zero-gated rsqrt with the dead
        eps clamps removed + t-factored backward weights — see the inline
        comments for the domain argument and for why the contractions stay
        hi/lo (bf16 single-pass measured fast but quality-negative).

    q_ref [1, R, 3]; pt_ref [1, 8, m] (rows 0..2 = cloud x/y/z);
    nrm_ref [1, R, 3]; mask_ref [1, R, m] int8; ref_ref [1, 1, R]
    (the 1-NN ori kappa for these rows); sq_ref [1, 1, R] (squared diff
    out); out_ref [1, 8, m] f32 accumulated neighbour-side planes;
    cen_ref [1, 8, R] center-side planes at this block's columns (rows
    3..7 of both stay zero).
    """
    j = pl.program_id(1)
    q = q_ref[0]  # [R, 3]
    pt = pt_ref[0]  # [8, m]
    nv = nrm_ref[0]  # [R, 3]
    maskf = mask_ref[0].astype(jnp.float32)  # [R, m]
    ref = ref_ref[0, 0]  # [R]
    R = q.shape[0]
    m = pt.shape[1]

    p3 = pt[:3]  # [3, m]
    d0 = (
        (q[:, 0:1] - p3[0][None, :]) ** 2
        + (q[:, 1:2] - p3[1][None, :]) ** 2
        + (q[:, 2:3] - p3[2][None, :]) ** 2
    )
    # inv carries the zero-distance gate: self and exact-duplicate columns
    # (d0 == 0, an EXACT zero in the direct-difference form) contribute 0
    # to kappa AND to both gradient weights — the reference's 0/eps
    # normalize produces the same zero contribution (loss_utils.py:79), and
    # this replaces the one-hot diagonal extraction: sdiag no longer has to
    # be bitwise pn_ii, so it comes from a cheap [R, 3] rowwise dot.
    # Zero-gated rsqrt (round-5: 0.764 -> 0.677 ms/call with the t-factored
    # weights below, runs/bench_curv_term.py "tfac"): the reference
    # chain is 1/max(sqrt(d0), eps) with a gradient stop below eps
    # (loss_utils.py:79) — but the eps clamps only BIND when 0 < d0 <=
    # eps^2 = 1e-24, which an f32 coordinate grid cannot produce:
    # unit-scale coordinates quantise per-plane differences at ~1e-7, so
    # any nonzero d0 is >= ~1e-14. The d0 == 0 gate (exact in the
    # direct-difference form) is therefore the only live guard, and the
    # 1/eps min-clamp and the w2 eps^2 compare/where both drop out.
    inv = jnp.where(d0 > 0.0, jax.lax.rsqrt(d0), 0.0)

    pn = _dot_hilo(nv, p3, (((1,), (0,)), ((), ())))  # [R, m]
    sdiag = jnp.sum(nv * q, axis=-1)  # [R]: q_i . n_i directly
    dot = pn - sdiag[:, None]
    a = jnp.abs(dot) * inv

    # --- forward value + local cotangent (row-resident) ---
    kappa = jnp.sum(maskf * a, axis=-1) / k  # [R]
    diff = kappa - ref
    sq_ref[0, 0] = diff * diff
    g = diff * (2.0 / npts)  # d[sum_i diff_i^2 / npts] / d kappa_i

    # --- analytic backward, same math as _kappa_bwd_kernel ---
    # t-factored weights (round-5 "tfac"): t = maskf * gk * inv appears in
    # BOTH w1 and w2, and w2's remaining factor is a * inv — 3-4 fewer
    # [R, m] VPU ops than the unfactored chain, no compare/where (the eps
    # gates ride inv's zero-gate per the domain argument above). Planes
    # move ~8e-6 of max vs the unfactored form (reassociation rounding).
    gk = (g / k)[:, None]  # [R, 1]
    t = maskf * gk * inv  # [R, m]
    w1 = t * jnp.sign(dot)
    w2 = t * (a * inv)

    dn_r = (((0,), (0,)), ((), ()))  # contract the R axis
    # All three contractions stay hi/lo split (2^-16): single-pass bf16 was
    # measured FAST but QUALITY-NEGATIVE — full-bf16 ("tfacb", 0.516
    # ms/call) amplifies to 11% of plane max through the q^T w2 / sum(w2)
    # p3 cancellation (q - p_j is 10-30x smaller than q), and even
    # bf16-only-for-nv^T-w1 ("tfach", 0.643) leaks 18% relative onto small
    # plane entries because the w1 term partially cancels against the w2
    # pair componentwise (tests/test_pallas_kernels.py grad contract).
    gp = (
        _dot_hilo(nv, w1, dn_r)
        + _dot_hilo(q, w2, dn_r)
        - jnp.sum(w2, axis=0)[None, :] * p3
    )  # [3, m]

    w2p = _dot_hilo(w2, p3, (((1,), (1,)), ((), ())))  # [R, 3]
    gq = (
        -jnp.sum(w1, axis=1)[:, None] * nv
        + w2p
        - jnp.sum(w2, axis=1)[:, None] * q
    )  # [R, 3]
    cen_ref[0] = jnp.concatenate(
        [gq.T, jnp.zeros((5, R), jnp.float32)], axis=0
    )  # [8, R] at this block's own columns

    contrib = jnp.concatenate(
        [gp, jnp.zeros((5, m), jnp.float32)], axis=0
    )  # [8, m]

    @pl.when(j == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(j > 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(jax.jit, static_argnames=("k", "row_block"))
def _curv_term_frommask_call(cloud, normal, ref, mask, k, row_block):
    b, n, _ = cloud.shape
    grid = (b, n // row_block)
    pt = jnp.concatenate(
        [
            jnp.swapaxes(cloud.astype(jnp.float32), 1, 2),
            jnp.zeros((b, 5, n), jnp.float32),
        ],
        axis=1,
    )  # [b, 8, n]
    sq, planes, cen = pl.pallas_call(
        functools.partial(_curv_term_frommask_kernel, k=k, npts=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, row_block, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, row_block, n), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, row_block), lambda i, j: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, row_block), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, row_block), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
        ],
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=64 << 20)
            if _HAS_PLTPU
            else None
        ),
    )(cloud.astype(jnp.float32), pt, normal.astype(jnp.float32), mask,
      ref.astype(jnp.float32)[:, None, :])
    return jnp.sum(sq[:, 0], axis=-1) / n, planes + cen


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def curv_term_frommask_pallas(cloud, normal, ref, mask, k, row_block=256):
    """Per-instance curvature loss term from a CACHED selection mask:
    cloud [b, n, 3], normal [b, n, 3] (constants), ref [b, n] (the 1-NN ori
    kappa, constant), mask [b, n, n] int8 -> curv [b] =
    mean_i (kappa_i - ref_i)^2 (reference curvature_loss,
    Lib/loss_utils.py:84-97, with the engine's lazy mask).

    ONE kernel computes both the term and its gradient planes (the
    closed-form kappa-cotangent lives row-local), so the VJP is a
    per-instance scalar multiply — no second matrix build. Differentiable
    in `cloud` only."""
    curv, _ = _curv_term_frommask_call(
        cloud, normal, ref, mask, k=k, row_block=row_block
    )
    return curv


def _curv_term_fm_vjp_fwd(cloud, normal, ref, mask, k, row_block):
    curv, planes = _curv_term_frommask_call(
        cloud, normal, ref, mask, k=k, row_block=row_block
    )
    # zero-size dtype tokens so the bwd can emit correctly-typed grads
    # without carrying the full primals
    return curv, (
        planes,
        jnp.zeros((), cloud.dtype),
        jnp.zeros((), normal.dtype),
        jnp.zeros((), ref.dtype),
    )


def _curv_term_fm_vjp_bwd(k, row_block, res, g):
    planes, ctok, ntok, rtok = res
    b, _, n = planes.shape
    # g: [b] per-instance cotangent (const * weight / batch downstream)
    grad = (g[:, None, None] * planes[:, :3, :]).transpose(0, 2, 1)
    return (
        grad.astype(ctok.dtype),
        jnp.zeros((b, n, 3), ntok.dtype),
        jnp.zeros((b, n), rtok.dtype),
        None,
    )


curv_term_frommask_pallas.defvjp(_curv_term_fm_vjp_fwd, _curv_term_fm_vjp_bwd)
