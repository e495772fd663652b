"""Fully-fused set-abstraction Pallas kernel: ball-query + layer-1
pre-projected grouping + 3-layer MLP + max-pool in one VMEM pass.

Merges ballquery_group_kernel (query + one-hot gathers) and
group_mlp_kernel (folded-BN MLP + pool) — reference semantics
ball_query_gpu.cu:9-54 + group_points_gpu.cu:8-75 +
pointnet2_modules.py:29-74. Layer 1 is linear, so
  z1 = (x_j - c) @ W1x + f_j @ W1f + b1
     = y_j - Y_c + yf_j + b1,   y = x @ W1x, Y = c @ W1x, yf = f @ W1f
projection happens ONCE per point/center (n + m tiny dots, HIGHEST
precision on the size-3/8 contraction), the one-hot gathers move
c1-wide projected rows, the center subtraction rides the SAME k-split
decomposition on both sides (self-hit / padding rows cancel to
~2^-24), grouped tensors never exist outside VMEM, and one backward
scatter oh^T @ dz1 serves xyz and features at once.

ROLE (measured, SSG b=16 attack step): this kernel LOST to the split
ballquery_group -> group_mlp pipeline as the default path — 10.4 vs
7.3 ms/step — because a gather emitting c1-wide rows ([R, n] x
[n, c1]) costs ~8x the MACs of the planes form ([8, n] x [n, R]) and
the MXU-utilisation gain does not pay for that on these shapes, while
the backward additionally re-pays the whole gather under remat. It
ships as the FALLBACK for SA shapes the split pair cannot take — the
gate in models.pointnetpp prefers the split pipeline and routes here
only when group_mlp_available is False, i.e. MSG SA2's cf=320 feature
width (cf % 128 != 0), where this kernel replaces the UNFUSED path
and its [b, m, ns, 323] grouped-activation HBM roundtrips.

Precision contract: f32_exact=False (TPU victims — see
pool_matmul_kernel.platform_f32_exact) runs 2-split gathers (~2^-17
copies, tighter than the unfused path's single-pass-bf16 layer-1 dot)
and single-pass bf16 MLP dots; f32_exact=True (CPU/interpret tests)
runs 3-split gathers (exact f32 copies) and 3-pass MLP dots. Max-pool
ties split evenly and ReLU'(0) = 0, matching jnp.max / relu VJP
semantics; neighbour selection is stop-gradient (reference semantics).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoa3_tpu.ops.pallas.ballquery_group_kernel import (
    _cb,
    _tri_scratch,
    _expander,
    _hit_rank,
    _onehot_chunk,
    _pick_gbm,
    _planes,
    _rows8,
    _splits,
)
from geoa3_tpu.ops.pallas.group_mlp_kernel import _PDEF, _mm, _mm_t

_HI = jax.lax.Precision.HIGHEST

# SSG SA1's backward holds ~16.5 MB of chunk tiles at cb=32 — just over
# the 16 MB default scoped-VMEM limit; v5e has 128 MiB physical VMEM, so
# raise the scoped limit rather than shrinking the chunk (smaller chunks
# mean more unrolled gather/scatter code and slower Mosaic compiles).
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)


def _project(a, w, dn):
    """Tiny layer-1 projection dot at HIGHEST (contraction dim is 3/8)."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_HI,
    )


def _gather(oh, parts, dn):
    """sum_k oh @ parts[k] with f32 accumulation (k-split gather)."""
    acc = None
    for p in parts:
        t = jax.lax.dot_general(
            oh, p, dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=_PDEF,
        )
        acc = t if acc is None else acc + t
    return acc


_DN_G = (((1,), (0,)), ((), ()))  # oh [R, n] x y [n, c1] -> [R, c1]
_DN_E = (((0,), (0,)), ((), ()))  # E [cb, R] x Yc [cb, c1] -> [R, c1]
_DN_S = (((0,), (0,)), ((), ()))  # oh [R, n] x dz1 [R, c1] -> [n, c1]
_DN_C = (((1,), (0,)), ((), ()))  # E [cb, R] x dz1 [R, c1] -> [cb, c1]


def _chunk_z1(oh, ysplits, Ycsplits, yfsplits, c0, cb, ns, b1):
    """z1 [cb*ns, c1] for one center chunk: gather(y) - replicate(Yc)
    (+ gather(yf)) + b1, all through the same split decomposition."""
    z1 = _gather(oh, ysplits, _DN_G)
    E = _expander(cb, ns)  # [cb, cb*ns]
    crep = _gather(E, [p[c0:c0 + cb] for p in Ycsplits], _DN_E)
    z1 = z1 - crep
    if yfsplits is not None:
        z1 = z1 + _gather(oh, yfsplits, _DN_G)
    return z1 + b1


def _fwd_kernel(*refs, ns: int, cb: int, cf: int, r2: float,
                f32_exact: bool):
    if cf:
        (xp_ref, cp_ref, f_ref, w1x, w1f, b1, w2, b2, w3, b3,
         out_ref, tri_ref) = refs
    else:
        xp_ref, cp_ref, w1x, b1, w2, b2, w3, b3, out_ref, tri_ref = refs
        f_ref = w1f = None
    xp8 = xp_ref[0]  # [8, n]
    cr = cp_ref[0]  # [gbm, 8]
    gbm = cr.shape[0]
    hit, rank, cnt = _hit_rank(xp8, cr, r2, _tri_scratch(tri_ref))
    ksp = 3 if f32_exact else 2
    y = _project(xp8, w1x[:], (((0,), (0,)), ((), ())))  # [n, c1]
    Yc = _project(cr, w1x[:], (((1,), (0,)), ((), ())))  # [gbm, c1]
    ysplits = _splits(y, ksp)
    Ycsplits = _splits(Yc, ksp)
    yfsplits = (
        _splits(_mm(f_ref[0], w1f[:], f32_exact), ksp) if cf else None
    )
    c3 = out_ref.shape[-1]
    for c0 in range(0, gbm, cb):
        oh = _onehot_chunk(hit, rank, cnt, ns, c0, cb)
        z1 = _chunk_z1(oh, ysplits, Ycsplits, yfsplits, c0, cb, ns, b1[:])
        a1 = jnp.maximum(z1, 0.0)
        z2 = _mm(a1, w2[:], f32_exact) + b2[:]
        a2 = jnp.maximum(z2, 0.0)
        z3 = _mm(a2, w3[:], f32_exact) + b3[:]
        a3 = jnp.maximum(z3, 0.0)
        out_ref[0, c0:c0 + cb] = jnp.max(a3.reshape(cb, ns, c3), axis=1)


def _bwd_kernel(*refs, ns: int, cb: int, cf: int, r2: float,
                f32_exact: bool):
    if cf:
        (xp_ref, cp_ref, f_ref, w1x, w1f, b1, w2, b2, w3, b3, g_ref,
         dxp_ref, dcp_ref, df_ref, tri_ref) = refs
    else:
        (xp_ref, cp_ref, w1x, b1, w2, b2, w3, b3, g_ref,
         dxp_ref, dcp_ref, tri_ref) = refs
        f_ref = w1f = df_ref = None
    xp8 = xp_ref[0]
    cr = cp_ref[0]
    gbm = cr.shape[0]
    n = xp8.shape[1]
    hit, rank, cnt = _hit_rank(xp8, cr, r2, _tri_scratch(tri_ref))
    ksp = 3 if f32_exact else 2
    y = _project(xp8, w1x[:], (((0,), (0,)), ((), ())))
    Yc = _project(cr, w1x[:], (((1,), (0,)), ((), ())))
    ysplits = _splits(y, ksp)
    Ycsplits = _splits(Yc, ksp)
    yfsplits = (
        _splits(_mm(f_ref[0], w1f[:], f32_exact), ksp) if cf else None
    )
    c1 = y.shape[-1]
    c3 = g_ref.shape[-1]
    j = pl.program_id(1)
    dy = jnp.zeros((n, c1), jnp.float32)
    for c0 in range(0, gbm, cb):
        oh = _onehot_chunk(hit, rank, cnt, ns, c0, cb)
        z1 = _chunk_z1(oh, ysplits, Ycsplits, yfsplits, c0, cb, ns, b1[:])
        a1 = jnp.maximum(z1, 0.0)
        z2 = _mm(a1, w2[:], f32_exact) + b2[:]
        a2 = jnp.maximum(z2, 0.0)
        z3 = _mm(a2, w3[:], f32_exact) + b3[:]
        a3 = jnp.maximum(z3, 0.0).reshape(cb, ns, c3)
        pooled = jnp.max(a3, axis=1, keepdims=True)
        eq = (a3 == pooled).astype(jnp.float32)
        ties = jnp.sum(eq, axis=1, keepdims=True)
        g = g_ref[0, c0:c0 + cb]  # [cb, c3]
        da3 = (g[:, None, :] * eq / ties).reshape(cb * ns, c3)
        dz3 = jnp.where(z3 > 0, da3, 0.0)
        da2 = _mm_t(dz3, w3[:], f32_exact)
        dz2 = jnp.where(z2 > 0, da2, 0.0)
        da1 = _mm_t(dz2, w2[:], f32_exact)
        dz1 = jnp.where(z1 > 0, da1, 0.0)  # [cb*ns, c1]
        # one scatter serves xyz and features: dy += oh^T @ dz1
        # (2-split cotangent passes, the scatter_kernel contract)
        E = _expander(cb, ns)
        dYc = None
        for dh in _splits(dz1, 2):
            dy += jax.lax.dot_general(
                oh, dh, dimension_numbers=_DN_S,
                preferred_element_type=jnp.float32, precision=_PDEF,
            )
            t = jax.lax.dot_general(
                E, dh, dimension_numbers=_DN_C,
                preferred_element_type=jnp.float32, precision=_PDEF,
            )
            dYc = t if dYc is None else dYc + t
        # dc = -dYc @ W1x^T -> [cb, 8] rows
        dcp_ref[0, c0:c0 + cb, :] = -jax.lax.dot_general(
            dYc, w1x[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
    # project the accumulated scatter back: dx = W1x @ dy^T (planes rows)
    dxp = jax.lax.dot_general(
        w1x[:], dy, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # [8, n]
    dft = _mm_t(dy, w1f[:], f32_exact) if cf else None  # [n, cf]

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


def _param_blocks(w1x, w1f, b1, w2, b2, w3, b3):
    """(args, in_specs) for the folded params (full-array blocks)."""
    params = [w1x] + ([w1f] if w1f is not None else []) + [
        b1, w2, b2, w3, b3
    ]
    specs = [
        pl.BlockSpec(p.shape, lambda i, j, r=len(p.shape): (0,) * r)
        for p in params
    ]
    return params, specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def sa_query_group_mlp(radius, nsample, f32_exact, xyz, new_xyz, features,
                       ws_and_bs):
    """Fused SA scale: ball-query + group + folded-BN 3-layer MLP + pool.

    xyz [b, n, 3], new_xyz [b, m, 3], features [b, n, cf] | None,
    ws_and_bs = (w1 [3+cf, c1], b1 [1, c1], w2, b2, w3, b3) with BN
    folded (stop-gradient at the call site — the VJP differentiates
    only xyz/new_xyz/features). Returns pooled [b, m, c3] f32.
    """
    return _fwd(radius, nsample, f32_exact, xyz, new_xyz, features,
                ws_and_bs)


def _prep(radius, nsample, xyz, new_xyz, features, ws_and_bs):
    w1, b1, w2, b2, w3, b3 = [a.astype(jnp.float32) for a in ws_and_bs]
    c1 = w1.shape[1]
    w1x = jnp.concatenate(
        [w1[:3], jnp.zeros((5, c1), jnp.float32)], axis=0
    )  # [8, c1]: rows 3..7 multiply the zero planes rows
    cf = features.shape[-1] if features is not None else 0
    w1f = w1[3:] if cf else None
    m, ns = new_xyz.shape[1], nsample
    gbm = _pick_gbm(m, ns)
    cb = _cb(gbm, ns)
    return w1x, w1f, b1, w2, b2, w3, b3, cf, gbm, cb


def _fwd(radius, nsample, f32_exact, xyz, new_xyz, features, ws_and_bs):
    b, n, _ = xyz.shape
    m, ns = new_xyz.shape[1], nsample
    (w1x, w1f, b1, w2, b2, w3, b3, cf, gbm, cb) = _prep(
        radius, nsample, xyz, new_xyz, features, ws_and_bs
    )
    c3 = w3.shape[1]
    xp = _planes(jax.lax.stop_gradient(xyz))
    cp = _rows8(jax.lax.stop_gradient(new_xyz))
    kernel = functools.partial(
        _fwd_kernel, ns=ns, cb=cb, cf=cf,
        r2=float(radius) * float(radius), f32_exact=f32_exact,
    )
    in_specs = [
        pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, gbm, 8), lambda i, j: (i, j, 0)),
    ]
    args = [xp, cp]
    if cf:
        in_specs.append(pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)))
        args.append(features.astype(jnp.float32))
    pargs, pspecs = _param_blocks(w1x, w1f, b1, w2, b2, w3, b3)
    out = pl.pallas_call(
        kernel,
        grid=(b, m // gbm),
        in_specs=in_specs + pspecs,
        out_specs=pl.BlockSpec((1, gbm, c3), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, c3), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.bfloat16)],
        interpret=_interpret(),
        compiler_params=_CPARAMS,
    )(*args, *pargs)
    return out


def _fwd_rule(radius, nsample, f32_exact, xyz, new_xyz, features,
              ws_and_bs):
    out = _fwd(radius, nsample, f32_exact, xyz, new_xyz, features,
               ws_and_bs)
    return out, (xyz, new_xyz, features, ws_and_bs)


def _bwd_rule(radius, nsample, f32_exact, res, g):
    xyz, new_xyz, features, ws_and_bs = res
    b, n, _ = xyz.shape
    m, ns = new_xyz.shape[1], nsample
    (w1x, w1f, b1, w2, b2, w3, b3, cf, gbm, cb) = _prep(
        radius, nsample, xyz, new_xyz, features, ws_and_bs
    )
    xp = _planes(xyz)
    cp = _rows8(new_xyz)
    kernel = functools.partial(
        _bwd_kernel, ns=ns, cb=cb, cf=cf,
        r2=float(radius) * float(radius), f32_exact=f32_exact,
    )
    in_specs = [
        pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, gbm, 8), lambda i, j: (i, j, 0)),
    ]
    args = [xp, cp]
    if cf:
        in_specs.append(pl.BlockSpec((1, n, cf), lambda i, j: (i, 0, 0)))
        args.append(features.astype(jnp.float32))
    pargs, pspecs = _param_blocks(w1x, w1f, b1, w2, b2, w3, b3)
    c3 = w3.shape[1]
    in_specs = in_specs + pspecs + [
        pl.BlockSpec((1, gbm, c3), lambda i, j: (i, j, 0))
    ]
    out_specs = [
        pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, gbm, 8), lambda i, j: (i, j, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
        jax.ShapeDtypeStruct((b, m, 8), jnp.float32),
    ]
    if cf:
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
        compiler_params=_CPARAMS,
    )(*args, *pargs, g.astype(jnp.float32))
    dxyz = jnp.swapaxes(outs[0][:, :3, :], 1, 2).astype(xyz.dtype)
    dnew = outs[1][:, :, :3].astype(new_xyz.dtype)
    dfeat = outs[2].astype(features.dtype) if cf else None
    dws = tuple(jnp.zeros_like(w) for w in ws_and_bs)
    return dxyz, dnew, dfeat, dws


sa_query_group_mlp.defvjp(_fwd_rule, _bwd_rule)


def _interpret() -> bool:
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


from geoa3_tpu.ops.pallas.knn_kernel import pallas_available  # noqa: E402


def sa_fused_available(
    n: int, m: int, ns: int, mlp_widths: Sequence[int], cf: int
) -> bool:
    """Shape gate for the fully-fused SA kernel (kill switch
    GEOA3_DISABLE_PALLAS=safused falls back to the split
    ballquery_group + group_mlp pipeline)."""
    from geoa3_tpu.ops import dispatch

    if dispatch.pallas_disabled("safused"):
        return False
    if not pallas_available():
        return False
    if len(mlp_widths) != 3 or any(w > 1024 for w in mlp_widths):
        return False
    if n % 128 or n > 4096:
        return False
    # features only appear as full-axis [n, cf] blocks and the [cf, c1]
    # param block — any cf Mosaic can lay out full-width is fine; keep a
    # sane upper bound for VMEM
    if cf and cf > 1024:
        return False
    gbm = _pick_gbm(m, ns)
    cb = _cb(gbm, ns)
    if cb <= 0:
        return False
    return m % gbm == 0
