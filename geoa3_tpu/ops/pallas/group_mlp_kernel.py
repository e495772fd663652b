"""Fused set-abstraction MLP + max-pool Pallas kernel.

The PN++ SA module runs a 3-layer shared MLP (Conv2d-1x1 + BN + ReLU, eval
mode) over grouped neighbourhoods [b, m, ns, c] and max-pools over ns
(reference pointnet2_modules.py:29-74). Unfused, every layer materialises a
[b*m*ns, c_out] activation in HBM — for SSG SA1 at b=16 that is ~0.5 GB of
HBM traffic per forward (and more in backward), which dominates the victim's
step time; the FLOPs themselves are trivial (<0.5 ms of MXU).

This kernel keeps a tile of groups resident in VMEM, runs all three
(folded-BN) affine+ReLU layers back to back on the MXU, and max-pools before
anything returns to HBM: traffic drops to the [.., 3(+c_in)] inputs plus the
[b, m, c_out] pooled output. The custom VJP recomputes the tile forward in
VMEM (remat) and emits ONLY input cotangents — in the attack the victim
params are constants, so weight gradients are never needed (train mode uses
the unfused path).

Precision contract: in f32 both operands are split into bf16 hi+lo parts and
each matmul runs 3 MXU passes (hi*hi + hi*lo + lo*hi, f32 accumulation,
~2^-21 relative error — comparable to XLA's default f32 dot lowering on
TPU); in bf16 victim mode a single bf16 pass per layer. Max-pool tie
gradients split evenly among ties and ReLU'(0) = 0, matching jnp.max /
jax.nn.relu VJP semantics exactly.

Layouts: grouped xyz rides as [b, 8, m*ns] "planes" (rows 0..2 = x/y/z;
a [.., 3]-minor tensor would pad 3 lanes to 128 on TPU); grouped features as
[b, m, ns, c_f] (c_f is a lane-friendly 128-multiple in every victim).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pin the kernels' engineered bf16 dot passes against ambient
# jax.default_matmul_precision (HIGHEST on bf16 operands is rejected by
# Mosaic, and any override would change the kernels' accuracy contract).
_PDEF = jax.lax.Precision.DEFAULT


def _mm(x, w, f32_exact: bool):
    """[R, ci] @ [ci, co] with f32 accumulation.

    f32_exact: split-bf16 3-pass (see module docstring); else single bf16.
    """
    dn = (((1,), (0,)), ((), ()))
    if not f32_exact:
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        xh, wh, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )
    acc += jax.lax.dot_general(
        xh, wl, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )
    acc += jax.lax.dot_general(
        xl, wh, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )
    return acc


def _mm_t(g, w, f32_exact: bool):
    """[R, co] @ [ci, co]^T -> [R, ci] (backward data matmul)."""
    dn = (((1,), (1,)), ((), ()))
    if not f32_exact:
        return jax.lax.dot_general(
            g.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
    gh = g.astype(jnp.bfloat16)
    gl = (g - gh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        gh, wh, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )
    acc += jax.lax.dot_general(
        gh, wl, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )
    acc += jax.lax.dot_general(
        gl, wh, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
    )
    return acc


def _tile_forward(gx, gf, ws, bs, ns, f32_exact):
    """Shared fwd body: gx [3, R] (planes), gf [R, cf] | None.

    Returns (z1, a1, z2, a2, z3, a3) — all [R, c_i] f32."""
    w1, w2, w3 = ws
    b1, b2, b3 = bs
    # layer 1: xyz part contracts the 3-plane dim; features part is a
    # regular [R, cf] matmul against the lower rows of w1
    dn_x = (((0,), (0,)), ((), ()))
    w1x = w1[:3]
    if f32_exact:
        gxh = gx.astype(jnp.bfloat16)
        gxl = (gx - gxh.astype(jnp.float32)).astype(jnp.bfloat16)
        w1xh = w1x.astype(jnp.bfloat16)
        w1xl = (w1x - w1xh.astype(jnp.float32)).astype(jnp.bfloat16)
        z1 = jax.lax.dot_general(
            gxh, w1xh, dimension_numbers=dn_x,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
        z1 += jax.lax.dot_general(
            gxh, w1xl, dimension_numbers=dn_x,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
        z1 += jax.lax.dot_general(
            gxl, w1xh, dimension_numbers=dn_x,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
    else:
        z1 = jax.lax.dot_general(
            gx.astype(jnp.bfloat16),
            w1x.astype(jnp.bfloat16),
            dimension_numbers=dn_x,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
    if gf is not None:
        z1 = z1 + _mm(gf, w1[3:], f32_exact)
    z1 = z1 + b1
    a1 = jnp.maximum(z1, 0.0)
    z2 = _mm(a1, w2, f32_exact) + b2
    a2 = jnp.maximum(z2, 0.0)
    z3 = _mm(a2, w3, f32_exact) + b3
    a3 = jnp.maximum(z3, 0.0)
    return z1, a1, z2, a2, z3, a3


def _fwd_kernel(*refs, ns: int, has_feats: bool, f32_exact: bool):
    if has_feats:
        gx_ref, gf_ref, w1, b1, w2, b2, w3, b3, out_ref = refs
        gf = gf_ref[0].reshape(-1, gf_ref.shape[-1])
    else:
        gx_ref, w1, b1, w2, b2, w3, b3, out_ref = refs
        gf = None
    gx = gx_ref[0, :3, :]  # [3, R]
    *_, a3 = _tile_forward(
        gx, gf,
        (w1[:], w2[:], w3[:]),
        (b1[:], b2[:], b3[:]),
        ns, f32_exact,
    )
    gpt = out_ref.shape[1]
    pooled = jnp.max(a3.reshape(gpt, ns, -1), axis=1)
    out_ref[0] = pooled


def _bwd_kernel(*refs, ns: int, has_feats: bool, f32_exact: bool):
    if has_feats:
        (gx_ref, gf_ref, w1, b1, w2, b2, w3, b3, g_ref,
         dgx_ref, dgf_ref) = refs
        gf = gf_ref[0].reshape(-1, gf_ref.shape[-1])
    else:
        gx_ref, w1, b1, w2, b2, w3, b3, g_ref, dgx_ref = refs
        gf = None
    gx = gx_ref[0, :3, :]
    ws = (w1[:], w2[:], w3[:])
    z1, a1, z2, a2, z3, a3 = _tile_forward(
        gx, gf, ws, (b1[:], b2[:], b3[:]), ns, f32_exact
    )
    gpt = g_ref.shape[1]
    c3 = a3.shape[-1]
    a3g = a3.reshape(gpt, ns, c3)
    pooled = jnp.max(a3g, axis=1, keepdims=True)
    eq = (a3g == pooled).astype(jnp.float32)
    ties = jnp.sum(eq, axis=1, keepdims=True)
    da3 = (g_ref[0][:, None, :] * eq / ties).reshape(-1, c3)
    dz3 = jnp.where(z3 > 0, da3, 0.0)
    da2 = _mm_t(dz3, ws[2], f32_exact)
    dz2 = jnp.where(z2 > 0, da2, 0.0)
    da1 = _mm_t(dz2, ws[1], f32_exact)
    dz1 = jnp.where(z1 > 0, da1, 0.0)
    # dgx (planes layout): [3, R] = w1x [3, c1] @ dz1 [R, c1]^T
    w1x = ws[0][:3]
    dn = (((1,), (1,)), ((), ()))
    if f32_exact:
        dh = dz1.astype(jnp.bfloat16)
        dl = (dz1 - dh.astype(jnp.float32)).astype(jnp.bfloat16)
        wh = w1x.astype(jnp.bfloat16)
        wl = (w1x - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        dgx = jax.lax.dot_general(
            wh, dh, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
        )
        dgx += jax.lax.dot_general(
            wh, dl, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
        )
        dgx += jax.lax.dot_general(
            wl, dh, dimension_numbers=dn, preferred_element_type=jnp.float32,
        precision=_PDEF
        )
    else:
        dgx = jax.lax.dot_general(
            w1x.astype(jnp.bfloat16),
            dz1.astype(jnp.bfloat16),
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
    dgx_ref[0] = jnp.concatenate(
        [dgx, jnp.zeros((5, dgx.shape[1]), jnp.float32)], axis=0
    )
    if has_feats:
        dgf = _mm_t(dz1, ws[0][3:], f32_exact)
        dgf_ref[0] = dgf.reshape(dgf_ref.shape[1:]).astype(dgf_ref.dtype)


def _pick_gpt(
    m: int, ns: int, cf: int = 0, widths: Sequence[int] = (64, 64, 128)
) -> int:
    """Groups per tile, sized by a VMEM activation budget.

    Round 2 fixed this at 512//ns rows per tile, which degenerated SSG SA1
    into ~1024 tiles/step whose ~23 us/tile pipeline overhead dwarfed the
    interlayer-HBM savings (the measured 23.8 vs 9.8 ms f32 regression).
    The real constraint is VMEM: the backward holds (z_i, a_i) for all
    three layers plus the gx planes and gf block, so rows-per-tile R obeys
    4*(8 + cf + 2*sum(widths))*R <= budget. ~8 MB leaves room for Mosaic's
    double-buffered input/output blocks in 16 MB of VMEM; SA1 lands on
    gpt=64 (R=4096, 128 tiles/step at b=16), SA2 on gpt=32 (R=2048)."""
    per_row = 4 * (8 + cf + 2 * sum(widths))
    r_target = min((24 << 20) // per_row, 8192)
    gpt = max(1, min(m, r_target // ns))
    while m % gpt:
        gpt -= 1
    return max(gpt, 1)


def _specs(b, m, ns, gpt, cf, ws_shapes, planes_first: bool):
    """Common in_specs for (gx [b,8,m*ns], gf?, w1,b1,w2,b2,w3,b3)."""
    R = gpt * ns
    specs = [
        pl.BlockSpec((1, 8, R), lambda i, j: (i, 0, j)),
    ]
    if cf:
        specs.append(
            pl.BlockSpec((1, gpt, ns, cf), lambda i, j: (i, j, 0, 0))
        )
    for (ci, co) in ws_shapes:
        specs.append(pl.BlockSpec((ci, co), lambda i, j: (0, 0)))
        specs.append(pl.BlockSpec((1, co), lambda i, j: (0, 0)))
    return specs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3)
)
def group_mlp_maxpool(
    gx: jax.Array,
    gf: Optional[jax.Array],
    ns: int,
    f32_exact: bool,
    ws_and_bs: Tuple[jax.Array, ...] = (),
):
    """Fused 3-layer folded-BN MLP + max-pool over ns.

    gx: grouped relative xyz, PLANES layout [b, 8, m*ns] (rows 0..2 used);
    gf: grouped features [b, m, ns, cf] or None;
    ws_and_bs: (w1 [c0, c1], b1 [1, c1], w2, b2, w3, b3) with BN already
    folded into each affine (c0 = 3 + cf).
    Returns pooled features [b, m, c3] (f32; bf16 when f32_exact is False).
    """
    return _fwd(gx, gf, ns, f32_exact, ws_and_bs)


def _fwd(gx, gf, ns, f32_exact, ws_and_bs):
    w1, b1, w2, b2, w3, b3 = ws_and_bs
    b = gx.shape[0]
    m = gx.shape[2] // ns
    cf = gf.shape[-1] if gf is not None else 0
    gpt = _pick_gpt(m, ns, cf, (w1.shape[1], w2.shape[1], w3.shape[1]))
    c3 = w3.shape[1]
    ws_shapes = [w1.shape, w2.shape, w3.shape]
    kernel = functools.partial(
        _fwd_kernel, ns=ns, has_feats=gf is not None, f32_exact=f32_exact
    )
    args = [gx] + ([gf] if gf is not None else []) + [
        w1, b1, w2, b2, w3, b3
    ]
    out_dtype = jnp.float32 if f32_exact else jnp.bfloat16
    out = pl.pallas_call(
        kernel,
        grid=(b, m // gpt),
        in_specs=_specs(b, m, ns, gpt, cf, ws_shapes, True),
        out_specs=pl.BlockSpec((1, gpt, c3), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, c3), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*[a.astype(jnp.float32) if a is not None else a for a in args])
    return out.astype(out_dtype)


def _fwd_rule(gx, gf, ns, f32_exact, ws_and_bs):
    out = _fwd(gx, gf, ns, f32_exact, ws_and_bs)
    return out, (gx, gf, ws_and_bs)


def _bwd_rule(ns, f32_exact, res, g):
    gx, gf, ws_and_bs = res
    w1, b1, w2, b2, w3, b3 = ws_and_bs
    b = gx.shape[0]
    m = gx.shape[2] // ns
    cf = gf.shape[-1] if gf is not None else 0
    gpt = _pick_gpt(m, ns, cf, (w1.shape[1], w2.shape[1], w3.shape[1]))
    ws_shapes = [w1.shape, w2.shape, w3.shape]
    kernel = functools.partial(
        _bwd_kernel, ns=ns, has_feats=gf is not None, f32_exact=f32_exact
    )
    in_specs = _specs(b, m, ns, gpt, cf, ws_shapes, True)
    c3 = w3.shape[1]
    in_specs.append(pl.BlockSpec((1, gpt, c3), lambda i, j: (i, j, 0)))
    out_shapes = [jax.ShapeDtypeStruct((b, 8, m * ns), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 8, gpt * ns), lambda i, j: (i, 0, j)),
    ]
    if gf is not None:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, m, ns, cf), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, gpt, ns, cf), lambda i, j: (i, j, 0, 0))
        )
    args = [gx] + ([gf] if gf is not None else []) + [
        w1, b1, w2, b2, w3, b3, g
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(b, m // gpt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(*[a.astype(jnp.float32) for a in args])
    dgx = outs[0].astype(gx.dtype)
    dgf = outs[1].astype(gf.dtype) if gf is not None else None
    dws = tuple(jnp.zeros_like(w) for w in ws_and_bs)
    return (dgx, dgf, dws)


group_mlp_maxpool.defvjp(_fwd_rule, _bwd_rule)


from geoa3_tpu.ops.pallas.knn_kernel import pallas_available  # noqa: E402

_FORCE_INTERPRET = False


def _interpret() -> bool:
    """Interpret on CPU so tests can exercise the kernel bodies (including
    with pallas_available monkeypatched True to force the fused model path)."""
    if _FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def group_mlp_available(
    ns: int, m: int, mlp_widths: Sequence[int], cf: int
) -> bool:
    """Shape gate for the fused SA kernel — DEFAULT ON (kill switch
    GEOA3_DISABLE_PALLAS=groupmlp).

    Measurement history (same SSG attack step, b=16, trace-timed): round 2
    fixed 512-row tiles lost badly (f32 23.8 vs 9.8 ms/step — ~2700 tiles
    at ~23 us/tile pipeline overhead) and the kernel shipped opt-in as a
    dead end. Round 3 re-tiled by VMEM budget (_pick_gpt: SA1 4096-row
    tiles -> 128 tiles/step), which cut it to 10.31 vs 9.35 — still losing
    to the f32-exact 3-pass dots tripling the MXU time. Switching the dots
    to the platform's default precision (single-pass bf16, f32 accumulate
    — exactly what XLA does to the unfused victim's f32 dots; see
    pool_matmul_kernel.platform_f32_exact) flipped it to a WIN: 8.45 vs
    9.35 ms/step (0.378 vs 0.327 attacks/s). Now the default eval path."""
    from geoa3_tpu.ops import dispatch

    if dispatch.pallas_disabled("groupmlp"):
        return False
    if len(mlp_widths) != 3:
        return False
    gpt = _pick_gpt(m, ns, cf, mlp_widths)
    if ns * gpt > 8192:
        return False
    # the planes block's trailing dim R = gpt*ns must be lane-aligned
    # (multiple of 128) whenever the m//gpt grid has more than one step —
    # Mosaic only allows an unaligned trailing dim when the block spans the
    # full axis (single grid step, m == gpt)
    if (ns * gpt) % 128 != 0 and m != gpt:
        return False
    if cf and cf % 128 != 0:
        # cf=320 lowers fine (full-trailing-dim blocks) but the split
        # pipeline measured a loss at MSG SA2 — see the matching gate in
        # ball_query_group_available for the numbers
        return False
    return all(w <= 1024 for w in mlp_widths)
