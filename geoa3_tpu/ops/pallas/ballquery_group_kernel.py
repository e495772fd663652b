"""Fused ball-query + group Pallas kernel (query, gather, center-subtract
and feature-group in one VMEM pass, MXU one-hot gathers, matmul-scatter VJP).

Replaces the SA-module grouping pipeline
(reference: ball_query_gpu.cu:9-54 + group_points_gpu.cu:8-75, python
wrapper pointnet2_utils.py:279-333), which on TPU cost per SSG attack step:
approx_min_k ball-query sort 0.37 ms + SA1 xyz group gather 0.94 ms + the
planes-layout copy feeding the fused SA MLP 0.36 ms + the grouped-xyz
backward scatter 0.46 ms (plus the SA2 feature gather/scatter pair).

How the CUDA first-hit semantics map to the MXU:

  hit[c, j]  = (|x_j - center_c|^2 < r^2)            one [gbm, 8]x[8, n] dot
  rank[c, j] = #hits with index <= j                 hit @ lower-tri ones
                                                     (iota-built, MXU)
  slot s of center c holds the point with rank == min(s+1, max(cnt_c, 1))
  (i.e. the first `ns` hits in ascending index order, padded with the
  FIRST hit — ball_query_gpu.cu:33-41; empty balls -> index 0, matching
  ops.ball_query), expressed as a one-hot matrix S [ns*gbm, n] built from
  rank comparisons, so gather = planes @ S^T and feature-group = S @ feats
  — both MXU matmuls, no dynamic-row addressing anywhere.

Outputs feed geoa3_tpu.ops.pallas.group_mlp_kernel.group_mlp_maxpool
directly: gxp planes [b, 8, m*ns] (center-subtracted, rows 3..7 zero) and
gf [b, m, ns, cf].

Precision: the one-hot gathers run 3-split bf16 passes, which reconstruct
f32 row copies EXACTLY (non-overlapping mantissa segments, single non-zero
term per row; the center-subtract would otherwise amplify rounding into
the near-zero self-hit rows). The hit test computes D with HIGHEST
(contraction dim is 3 — free) in the same a2+b2-2ab association as
ops.ball_query's pairwise_sqdist, so FPS centers hit themselves at exactly
D == 0. The VJP scatters cotangents through the transposed one-hots with
the 2-split hi/lo passes (same contract as scatter_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoa3_tpu.ops.pallas.group_mlp_kernel import (
    _PDEF,
    pallas_available,
)

_HI = jax.lax.Precision.HIGHEST


def _splits(x, k: int):
    """k non-overlapping bf16 mantissa segments of f32 x (k=3 is exact)."""
    parts = []
    rest = x
    for _ in range(k):
        h = rest.astype(jnp.bfloat16)
        parts.append(h)
        rest = rest - h.astype(jnp.float32)
    return parts


def _split_dot(a, b_bf16, dn, k: int):
    """dot_general(a_f32, b_bf16) as k split-bf16 passes, f32 accumulate."""
    acc = None
    for ah in _splits(a, k):
        t = jax.lax.dot_general(
            ah, b_bf16, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=_PDEF,
        )
        acc = t if acc is None else acc + t
    return acc


def _build_tri(tri_ref):
    """Fill a [n, n] bf16 scratch with the lower-triangular ones matrix,
    once per kernel launch (pl.when on the first grid step). Building it
    inline per grid step was ~40% of the ball-query kernel's time on SSG
    SA1 (two [n, n] iotas + compare + cast on every one of b * m/gbm
    steps, for a grid-invariant constant)."""
    n = tri_ref.shape[0]
    ja = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri_ref[...] = (ja <= jb).astype(jnp.bfloat16)


def _tri_scratch(tri_ref):
    """Build-once accessor for the shared tri scratch (call at the top of
    a kernel body; grid iteration is sequential on TPU)."""
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        _build_tri(tri_ref)

    return tri_ref[...]


def _hit_rank(xp8, cr, r2, tri):
    """hit [gbm, n] bool, rank [gbm, n] f32 (inclusive index-cumsum),
    cnt [gbm, 1] f32. cr: center ROWS [gbm, 8] (Mosaic needs the block's
    trailing dim full, so centers travel row-major). tri: [n, n] bf16
    lower-triangular ones (from _tri_scratch). Counts <= n stay
    integer-exact in f32."""
    x2 = jnp.sum(xp8 * xp8, axis=0)[None, :]  # [1, n]
    c2 = jnp.sum(cr * cr, axis=1)[:, None]  # [gbm, 1]
    cx = jax.lax.dot_general(
        cr, xp8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # [gbm, n]
    d = c2 + x2 - 2.0 * cx
    hit = d < r2
    # rank via the lower-triangular ones matmul: the MXU does the cumsum;
    # bf16 0/1 operands, f32 accumulate is exact
    rank = jax.lax.dot_general(
        hit.astype(jnp.bfloat16), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PDEF,
    )  # [gbm, n]
    cnt = rank[:, -1:]
    return hit, rank, cnt


def _expander(cb: int, ns: int):
    """E [cb, cb*ns] bf16: E[c, c*ns+s] = 1 — replicate-per-slot (and its
    transpose, sum-per-center) as MXU matmuls; Mosaic cannot shape-cast a
    lane-dim collapse like [8, cb, ns] -> [8, cb*ns]."""
    colc = jax.lax.broadcasted_iota(jnp.int32, (cb, cb * ns), 1)
    rowc = jax.lax.broadcasted_iota(jnp.int32, (cb, cb * ns), 0)
    return ((colc >= rowc * ns) & (colc < (rowc + 1) * ns)).astype(
        jnp.bfloat16
    )


def _onehot_chunk(hit, rank, cnt, ns: int, c0: int, cb: int):
    """S [cb*ns, n] bf16 for centers [c0, c0+cb): S[c*ns+s, j] = 1 iff
    point j fills slot s of center c (first-hit order + padding).

    Cost note: this build is the dominant VPU term of the whole grouping
    pipeline (the [cb, ns, n] tensor is ~30x bigger than anything else the
    kernels touch elementwise), so everything 3D is folded into ONE
    broadcast compare: a masked-rank row (hits keep their 1..n rank,
    non-hits 0, empty balls a BIG sentinel at column 0) against a per-slot
    target (slot rank, first-hit padding past the count — the CUDA kernel
    pre-fills every slot with hit 0, ball_query_gpu.cu:33-41 — or the
    sentinel for empty balls, matching ops.ball_query's index-0 contract).
    The earlier 7-pass form (eq & hit, then a float empty-ball blend) cost
    ~0.9 ms/step on SSG SA1 alone.

    Dead end (round 4, hard Mosaic reject): running the [cb, ns, n]
    compare on bf16 operands (ranks clamped to ns+2, integer-exact in
    bf16) to get 2x packed-lane VPU throughput — v5e Mosaic cannot lower
    an arith.cmpf on packed vector<8x128x2xbf16> ("Target does not
    support this comparison", runs/artifacts/tpu_selfcheck.json history),
    so the compare stays f32."""
    n = hit.shape[1]
    rk = rank[c0 : c0 + cb]  # [cb, n]
    ht = hit[c0 : c0 + cb]
    ct = cnt[c0 : c0 + cb]  # [cb, 1]
    big = 65536.0  # > any rank (n <= 4096), exact in f32/bf16
    j0 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) == 0
    ).astype(jnp.float32)  # [1, n] (int iota: Mosaic rejects float tpu.iota)
    empty = (ct == 0.0).astype(jnp.float32)  # [cb, 1]
    mrk = jnp.where(ht, rk, 0.0) + j0 * (empty * big)  # [cb, n]
    s1 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, ns, 1), 1) + 1
    ).astype(jnp.float32)  # slot rank targets 1..ns
    tgt = jnp.where(s1 <= ct[:, None, :], s1, 1.0)  # [cb, ns, 1]
    tgt = tgt + empty[:, None, :] * (big - tgt)  # empty -> sentinel
    oh = (mrk[:, None, :] == tgt).astype(jnp.bfloat16)  # [cb, ns, n]
    return oh.reshape(cb * ns, n)


def _fwd_kernel(*refs, ns: int, cb: int, cf: int, r2: float, ksp: int):
    if cf:
        xp_ref, cp_ref, f_ref, gxp_ref, gf_ref, tri_ref = refs
    else:
        xp_ref, cp_ref, gxp_ref, tri_ref = refs
        f_ref = gf_ref = None
    xp8 = xp_ref[0]  # [8, n]
    cr = cp_ref[0]  # [gbm, 8] center rows
    gbm = cr.shape[0]
    hit, rank, cnt = _hit_rank(xp8, cr, r2, _tri_scratch(tri_ref))
    cp8 = jnp.swapaxes(cr, 0, 1)  # [8, gbm]
    xsplits = _splits(xp8, ksp)
    # features: 1-split when not exact — the gathered rows feed a
    # single-pass-bf16 dot downstream, which rounds its operands to
    # bf16 anyway; gathering bf16(f) is bit-identical to the unfused
    # exact-gather-then-bf16-dot products (no cancellation: features
    # are not center-subtracted)
    fsplits = _splits(f_ref[0], 3 if ksp == 3 else 1) if cf else None
    dn_g = (((1,), (1,)), ((), ()))  # [8, n] x [R, n] -> [8, R]
    dn_f = (((1,), (0,)), ((), ()))  # [R, n] x [n, cf] -> [R, cf]
    for c0 in range(0, gbm, cb):
        oh = _onehot_chunk(hit, rank, cnt, ns, c0, cb)
        g8 = None
        for xh in xsplits:
            t = jax.lax.dot_general(
                xh, oh, dimension_numbers=dn_g,
                preferred_element_type=jnp.float32, precision=_PDEF,
            )
            g8 = t if g8 is None else g8 + t
        # replicate each center across its ns slots via the expander
        # matmul (3-split: exact f32 copies, one nonzero per column)
        crep = _split_dot(
            cp8[:, c0 : c0 + cb], _expander(cb, ns),
            (((1,), (0,)), ((), ())), ksp,
        )  # [8, cb*ns]
        gxp_ref[0, :, c0 * ns : (c0 + cb) * ns] = g8 - crep
        if cf:
            gfc = None
            for fh in fsplits:
                t = jax.lax.dot_general(
                    oh, fh, dimension_numbers=dn_f,
                    preferred_element_type=jnp.float32, precision=_PDEF,
                )
                gfc = t if gfc is None else gfc + t
            gf_ref[0, c0 : c0 + cb] = gfc.reshape(cb, ns, cf)


def _bwd_kernel(*refs, ns: int, cb: int, cf: int, r2: float):
    if cf:
        (xp_ref, cp_ref, f_ref, dgxp_ref, dgf_ref,
         dxp_ref, dcp_ref, df_ref, tri_ref) = refs
    else:
        xp_ref, cp_ref, dgxp_ref, dxp_ref, dcp_ref, tri_ref = refs
        dgf_ref = df_ref = None
    xp8 = xp_ref[0]
    cr = cp_ref[0]  # [gbm, 8]
    gbm = cr.shape[0]
    n = xp8.shape[1]
    hit, rank, cnt = _hit_rank(xp8, cr, r2, _tri_scratch(tri_ref))
    j = pl.program_id(1)
    dn_x = (((1,), (0,)), ((), ()))  # [8, R] x [R, n] -> [8, n]
    dn_ft = (((0,), (0,)), ((), ()))  # [R, n] x [R, cf] -> [n, cf]
    dxp = jnp.zeros((8, n), jnp.float32)
    dft = jnp.zeros((n, cf), jnp.float32) if cf else None
    for c0 in range(0, gbm, cb):
        oh = _onehot_chunk(hit, rank, cnt, ns, c0, cb)
        dg8 = dgxp_ref[0, :, c0 * ns : (c0 + cb) * ns]  # [8, cb*ns]
        for dh in _splits(dg8, 2):
            dxp += jax.lax.dot_general(
                dh, oh, dimension_numbers=dn_x,
                preferred_element_type=jnp.float32, precision=_PDEF,
            )
        # center-subtract cotangent: dc = -sum_s dgxp (row-major out);
        # the per-center sum is the transposed expander matmul (2-split,
        # cotangent contract)
        dc8 = _split_dot(
            dg8, _expander(cb, ns), (((1,), (1,)), ((), ())), 2
        )  # [8, cb]
        dcp_ref[0, c0 : c0 + cb, :] = -jnp.swapaxes(dc8, 0, 1)
        if cf:
            dgfc = dgf_ref[0, c0 : c0 + cb].reshape(cb * ns, cf)
            for dh in _splits(dgfc, 2):
                dft += jax.lax.dot_general(
                    oh, dh, dimension_numbers=dn_ft,
                    preferred_element_type=jnp.float32, precision=_PDEF,
                )

    @pl.when(j == 0)
    def _init():
        dxp_ref[0] = dxp
        if cf:
            df_ref[0] = dft

    @pl.when(j > 0)
    def _acc():
        dxp_ref[0] += dxp
        if cf:
            df_ref[0] += dft


def _pick_gbm(m: int, ns: int, cf: int = 0) -> int:
    """Centers per tile: bound the onehot chunk + rank tiles to ~4 MB
    while keeping the grid coarse (pipeline overhead dominates small
    tiles — the round-2 group_mlp lesson).

    Wide feature widths also bound the tile: the grouped-feature block is
    gbm*ns*cf*4 bytes and the backward's unrolled per-chunk intermediates
    scale with it — MSG SA2 (ns=128, cf=320) OOMed scoped VMEM at
    gbm=128 (78.4M > 65.1M), so the gf block is capped at ~12 MB (only
    that shape shrinks; every 128-multiple cf keeps its tile)."""
    gbm = max(1, min(m, 16384 // ns))
    if cf:
        gbm = min(gbm, max(1, (12 << 20) // (ns * cf * 4)))
    while m % gbm:
        gbm -= 1
    return gbm


def _cb(gbm: int, ns: int) -> int:
    """Center sub-chunk: static output-lane offsets need (cb*ns) % 128 == 0."""
    cb = min(gbm, max(1, 2048 // ns))
    while gbm % cb or (cb * ns) % 128:
        cb -= 1
        if cb == 0:
            return 0
    return cb


def _planes(x):
    """[b, k, 3] -> planes [b, 8, k] (rows 3..7 zero)."""
    b, k, _ = x.shape
    xp = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
    return jnp.concatenate([xp, jnp.zeros((b, 5, k), jnp.float32)], axis=1)


def _rows8(x):
    """[b, k, 3] -> [b, k, 8] rows (cols 3..7 zero; trailing dim full-8
    keeps Mosaic's block rules happy where a [8, k] planes block with
    k < 128 would not)."""
    b, k, _ = x.shape
    return jnp.concatenate(
        [x.astype(jnp.float32), jnp.zeros((b, k, 5), jnp.float32)], axis=2
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def ball_query_group_planes(radius, nsample, f32_exact, xyz, new_xyz,
                            features):
    """Fused ball-query + group: xyz [b, n, 3], new_xyz [b, m, 3],
    features [b, n, cf] | None ->
    (gxp planes [b, 8, m*nsample] f32 center-subtracted, gf [b, m, nsample,
    cf] f32 | None). Differentiable w.r.t. xyz / new_xyz / features;
    neighbour selection is stop-gradient (reference semantics).

    f32_exact=True (CPU/interpret tests): 3-split gathers — bitwise-exact
    f32 row copies. False (TPU victims, pool_matmul_kernel.
    platform_f32_exact): 2-split gathers — ~2^-16-relative copies, which
    is noise-free where it matters: the split decomposition of a given
    f32 value is deterministic, and FPS centers ARE rows of xyz, so the
    gathered self/padding rows and the replicated center subtract to
    EXACTLY zero pass-by-pass; non-self rows carry error ~50x below the
    single-pass-bf16 layer-1 dot the victim applies downstream. Saves a
    third of the gather MXU time (the kernel's dominant cost)."""
    return _fwd(radius, nsample, f32_exact, xyz, new_xyz, features)


def _fwd(radius, nsample, f32_exact, xyz, new_xyz, features):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    ns = nsample
    cf = features.shape[-1] if features is not None else 0
    gbm = _pick_gbm(m, ns, cf)
    cb = _cb(gbm, ns)
    xp = _planes(jax.lax.stop_gradient(xyz))
    cp = _rows8(jax.lax.stop_gradient(new_xyz))
    kernel = functools.partial(
        _fwd_kernel, ns=ns, cb=cb, cf=cf,
        r2=float(radius) * float(radius), ksp=3 if f32_exact else 2,
    )
    in_specs = [
        pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, gbm, 8), lambda i, j: (i, j, 0)),
    ]
    args = [xp, cp]
    out_specs = [pl.BlockSpec((1, 8, gbm * ns), lambda i, j: (i, 0, j))]
    out_shapes = [jax.ShapeDtypeStruct((b, 8, m * ns), jnp.float32)]
    if cf:
        in_specs.append(pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)))
        args.append(features.astype(jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, gbm, ns, cf), lambda i, j: (i, j, 0, 0))
        )
        out_shapes.append(jax.ShapeDtypeStruct((b, m, ns, cf), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, m // gbm),
        in_specs=in_specs,
        out_specs=out_specs if cf else out_specs[0],
        out_shape=out_shapes if cf else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((n, n), jnp.bfloat16)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    if cf:
        return outs[0], outs[1]
    return outs, None


def _fwd_rule(radius, nsample, f32_exact, xyz, new_xyz, features):
    out = _fwd(radius, nsample, f32_exact, xyz, new_xyz, features)
    return out, (xyz, new_xyz, features)


def _bwd_rule(radius, nsample, f32_exact, res, cts):
    xyz, new_xyz, features = res
    dgxp, dgf = cts
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    ns = nsample
    cf = features.shape[-1] if features is not None else 0
    gbm = _pick_gbm(m, ns, cf)
    cb = _cb(gbm, ns)
    xp = _planes(xyz)
    cp = _rows8(new_xyz)
    kernel = functools.partial(
        _bwd_kernel, ns=ns, cb=cb, cf=cf, r2=float(radius) * float(radius)
    )
    in_specs = [
        pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, gbm, 8), lambda i, j: (i, j, 0)),
    ]
    args = [xp, cp]
    if cf:
        in_specs.append(pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)))
        args.append(features.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((1, 8, gbm * ns), lambda i, j: (i, 0, j)))
    args.append(dgxp.astype(jnp.float32))
    out_specs = [
        pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, gbm, 8), lambda i, j: (i, j, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
        jax.ShapeDtypeStruct((b, m, 8), jnp.float32),
    ]
    if cf:
        in_specs.append(
            pl.BlockSpec((1, gbm, ns, cf), lambda i, j: (i, j, 0, 0))
        )
        args.append((dgf if dgf is not None
                     else jnp.zeros((b, m, ns, cf))).astype(jnp.float32))
        out_specs.append(pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)))
        out_shapes.append(jax.ShapeDtypeStruct((b, n, cf), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, m // gbm),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((n, n), jnp.bfloat16)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*args)
    dxyz = jnp.swapaxes(outs[0][:, :3, :], 1, 2).astype(xyz.dtype)
    dnew = outs[1][:, :, :3].astype(new_xyz.dtype)
    dfeat = outs[2].astype(features.dtype) if cf else None
    return dxyz, dnew, dfeat


ball_query_group_planes.defvjp(_fwd_rule, _bwd_rule)


def _interpret() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def ball_query_group_available(n: int, m: int, ns: int, cf: int) -> bool:
    """Shape gate (kill switch GEOA3_DISABLE_PALLAS=bqgroup)."""
    from geoa3_tpu.ops import dispatch

    if dispatch.pallas_disabled("bqgroup"):
        return False
    if not pallas_available():
        return False
    if n % 128 or n > 4096:
        return False
    if cf and cf % 128:
        # cf=320 (MSG SA2) DOES lower — the gf blocks span the full cf
        # axis, so Mosaic's full-trailing-dim rule admits it, and the
        # selfcheck passed on it — but it measured a round-trip LOSS:
        # 10.54 vs 9.49 ms/step (MSG b=10, runs/profile_pnpp.py, round 4).
        # The split pipeline materialises [b, m, ns, 320] grouped features
        # in HBM for three scale levels (fwd + bwd re-reads), which is
        # exactly what the whole-SA fallback avoids; same verdict as
        # round 3's pad-to-384 experiment (11.15 vs 10.13).
        return False
    gbm = _pick_gbm(m, ns, cf)
    return _cb(gbm, ns) > 0
