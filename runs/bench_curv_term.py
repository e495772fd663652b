"""Micro-bench: curv_term_frommask kernel variants at the attack shape.

The fused curvature-TERM kernel (loss + gradient planes in one matrix
build) is the largest single slice of the K=10 PointNet attack step after
round 4. This sweeps candidate restructures of the kernel body, trace-timed
standalone at [B=32, N=1024, k=16], rb=512:

  base     — the shipped kernel (HIGHEST expansion d0, hi/lo pn, one-hot
             matmul for the center-side gradient scatter)
  directd  — d0 from direct per-plane squared differences on the VPU
             (3 broadcast FMA chains) instead of the 6-pass HIGHEST MXU
             expansion. Also EXACTER: no q2+p2-2qp cancellation, so r is
             closer to the reference composition than the expansion form.
  blockw   — center-side gradient written to its own (1, 8, R) output
             block at the row block's own columns (static block write)
             instead of the one-hot bf16 matmul; summed outside.
  both     — directd + blockw.

Prints trace-timed ms per call for each variant + value/grad parity vs
base. Pure experiment harness; winners get folded into
ops/pallas/kappa_kernel.py with interpret-mode tests.
"""
import functools
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geoa3_tpu.ops.pallas.kappa_kernel import (
    _EPS,
    _HI,
    _PDEF,
    _dot_hilo,
    _curv_term_frommask_call,
    kappa_selmask_call,
)

B, N, K = 32, 1024, 16
RB = int(os.environ.get("RB", 512))
REPS = int(os.environ.get("REPS", 40))


def _kernel_variant(
    q_ref, pt_ref, nrm_ref, mask_ref, ref_ref, sq_ref, out_ref, cen_ref,
    *, k, npts, directd, blockw, packmm=False, sdiagr=False, dsdiag=False,
    rsq=False, tfac=False, cen8=False, bfw=False,
):
    j = pl.program_id(1)
    q = q_ref[0]
    pt = pt_ref[0]
    nv = nrm_ref[0]
    maskf = mask_ref[0].astype(jnp.float32)
    ref = ref_ref[0, 0]
    R = q.shape[0]
    m = pt.shape[1]

    p3 = pt[:3]
    if directd:
        # per-plane squared differences: exact f32, no expansion
        # cancellation; 3 broadcasted VPU chains instead of 6 MXU passes
        d0 = (
            (q[:, 0:1] - p3[0][None, :]) ** 2
            + (q[:, 1:2] - p3[1][None, :]) ** 2
            + (q[:, 2:3] - p3[2][None, :]) ** 2
        )
    else:
        q2 = jnp.sum(q * q, axis=-1, keepdims=True)
        p2 = jnp.sum(p3 * p3, axis=0)[None, :]
        qp = jax.lax.dot_general(
            q, p3, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        d0 = jnp.maximum(q2 + p2 - 2.0 * qp, 0.0)
    if tfac:
        # zero-gated rsqrt WITHOUT the 1/eps min-clamp: the clamp (and the
        # w2 r > eps gate) only bind when 0 < d0 <= eps^2 = 1e-24, which an
        # f32 coordinate grid cannot produce — unit-scale coords quantise
        # per-plane differences at ~1e-7, so any nonzero d0 is >= ~1e-14.
        # inv's d0 == 0 gate remains the only (and sufficient) guard.
        inv = jnp.where(d0 > 0.0, jax.lax.rsqrt(d0), 0.0)
        r = rc = None
    elif rsq:
        # gated rsqrt: 1/max(sqrt(d0), eps) == min(rsqrt(d0), 1/eps) in real
        # arithmetic (1-ulp class rounding differences); kills the sqrt AND
        # the [R, m] divide, and the w2 clamp-gate r > eps becomes
        # d0 > eps^2 — r never materialises
        inv = jnp.where(
            d0 > 0.0, jnp.minimum(jax.lax.rsqrt(d0), 1.0 / _EPS), 0.0
        )
        r = rc = None
    else:
        r = jnp.sqrt(d0)
        rc = jnp.maximum(r, _EPS)
        inv = jnp.where(d0 > 0.0, 1.0 / rc, 0.0) if dsdiag else None

    pn = _dot_hilo(nv, p3, (((1,), (0,)), ((), ())))
    if dsdiag or rsq or tfac:
        # shipped round-5 form: sdiag from a direct [R, 3] rowwise dot; the
        # d0 == 0 gate on inv zeroes self/duplicate columns
        sdiag = jnp.sum(nv * q, axis=-1)
        oh = None
    elif sdiagr:
        # sdiag_i = pn[i, j*R + i]: extract from an [R, R] column slice of
        # pn with a small iota mask instead of a full [R, m] one-hot
        pnr = jax.lax.dynamic_slice_in_dim(pn, j * R, R, axis=1)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
            == jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        )
        sdiag = jnp.sum(jnp.where(eye, pnr, 0.0), axis=-1)
        oh = None
    else:
        col = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
        grow = jax.lax.broadcasted_iota(jnp.int32, (R, m), 0) + j * R
        oh = (col == grow).astype(jnp.float32)
        sdiag = jnp.sum(oh * pn, axis=-1)
    dot = pn - sdiag[:, None]
    a = jnp.abs(dot) * inv if inv is not None else jnp.abs(dot) / rc

    kappa = jnp.sum(maskf * a, axis=-1) / k
    diff = kappa - ref
    sq_ref[0, 0] = diff * diff
    g = diff * (2.0 / npts)

    gk = (g / k)[:, None]
    if tfac:
        # t-factored weights: t = maskf * gk * inv appears in BOTH w1 and
        # w2, and w2's remaining factor is a * inv (one product) — 3 fewer
        # [R, m] VPU ops than the rsq form and no compare/where (the eps^2
        # gate rides inv's own zero-gate per the domain argument above)
        t = maskf * gk * inv
        w1 = t * jnp.sign(dot)
        w2 = t * (a * inv)
    elif rsq:
        w1 = maskf * gk * jnp.sign(dot) * inv
        w2 = maskf * gk * a * inv * jnp.where(d0 > _EPS * _EPS, inv, 0.0)
    elif inv is not None:
        w1 = maskf * gk * jnp.sign(dot) * inv
        w2 = maskf * gk * a * inv * jnp.where(r > _EPS, inv, 0.0)
    else:
        w1 = maskf * gk * jnp.sign(dot) / rc
        w2 = maskf * gk * jnp.where(r > _EPS, a / (rc * rc), 0.0)

    dn_r = (((0,), (0,)), ((), ()))
    if bfw == "w1":
        # single-pass bf16 ONLY for the nv^T w1 contraction — the q^T w2 /
        # sum(w2) p3 pair cancels (q - p is ~10-30x smaller than q), which
        # amplified full-bf16's 4e-3 to 11% (tfacb); the w1 term has no
        # cancelling partner, so its bf16 rounding stays ~4e-3 of itself
        _fb = functools.partial(
            jax.lax.dot_general, preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
        gp = (
            _fb(
                nv.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                dimension_numbers=dn_r,
            )
            + _dot_hilo(q, w2, dn_r)
            - jnp.sum(w2, axis=0)[None, :] * p3
        )
        w2p = _dot_hilo(w2, p3, (((1,), (1,)), ((), ())))
        gq = (
            -jnp.sum(w1, axis=1)[:, None] * nv
            + w2p
            - jnp.sum(w2, axis=1)[:, None] * q
        )
    elif bfw:
        # single-pass bf16 backward contractions: the w1/w2 weights round
        # to bf16 once (no hi/lo split casts) and each plane contraction is
        # ONE MXU pass with f32 accumulate — ~4e-3 relative per weight,
        # against the 5e-3-of-max plane tolerance
        _fb = functools.partial(
            jax.lax.dot_general, preferred_element_type=jnp.float32,
            precision=_PDEF,
        )
        w1b = w1.astype(jnp.bfloat16)
        w2b = w2.astype(jnp.bfloat16)
        gp = (
            _fb(nv.astype(jnp.bfloat16), w1b, dimension_numbers=dn_r)
            + _fb(q.astype(jnp.bfloat16), w2b, dimension_numbers=dn_r)
            - jnp.sum(w2, axis=0)[None, :] * p3
        )
        w2p = _fb(
            w2b, p3.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
        )
        gq = (
            -jnp.sum(w1, axis=1)[:, None] * nv
            + w2p
            - jnp.sum(w2, axis=1)[:, None] * q
        )
    elif packmm:
        # ONE stacked contraction for the neighbour-side planes:
        # [nv; q] [2R, 3] x [w1; w2] [2R, m] over the 2R axis
        # == nv^T w1 + q^T w2, and ONE for the center-side row stats:
        # [w1; w2] [2R, m] x [p3; 1] [4, m] over m gives w1.1, w2.p3^T,
        # w2.1 in one pass (plus an unused w1.p3^T block)
        nq = jnp.concatenate([nv, q], axis=0)  # [2R, 3]
        w12 = jnp.concatenate([w1, w2], axis=0)  # [2R, m]
        gp = _dot_hilo(nq, w12, dn_r) - jnp.sum(w2, axis=0)[None, :] * p3
        p3e = jnp.concatenate([p3, jnp.ones((1, m), jnp.float32)], axis=0)
        stats = _dot_hilo(w12, p3e, (((1,), (1,)), ((), ())))  # [2R, 4]
        s_w1 = stats[:R, 3]
        w2p = stats[R:, :3]
        s_w2 = stats[R:, 3]
        gq = -s_w1[:, None] * nv + w2p - s_w2[:, None] * q  # [R, 3]
    else:
        gp = (
            _dot_hilo(nv, w1, dn_r)
            + _dot_hilo(q, w2, dn_r)
            - jnp.sum(w2, axis=0)[None, :] * p3
        )

        w2p = _dot_hilo(w2, p3, (((1,), (1,)), ((), ())))
        gq = (
            -jnp.sum(w1, axis=1)[:, None] * nv
            + w2p
            - jnp.sum(w2, axis=1)[:, None] * q
        )  # [R, 3]
    if cen8:
        # transpose-free center write: cen block is (1, R, 8) — rows are
        # this block's points, lanes 0..2 the gradient — so gq lands
        # without the [R, 3] -> [3, R] sublane/lane shuffle; the caller
        # transposes the tiny [b, n, 8] once in XLA
        cen_ref[0] = jnp.concatenate(
            [gq, jnp.zeros((R, 5), jnp.float32)], axis=1
        )
        contrib = jnp.concatenate(
            [gp, jnp.zeros((5, m), jnp.float32)], axis=0
        )
    elif blockw:
        # static block write to this row block's own columns; summed with
        # gp outside the kernel
        cen_ref[0] = jnp.concatenate(
            [gq.T, jnp.zeros((5, R), jnp.float32)], axis=0
        )
        contrib = jnp.concatenate(
            [gp, jnp.zeros((5, m), jnp.float32)], axis=0
        )
    else:
        cen_ref[0] = jnp.zeros((8, R), jnp.float32)
        gqh = gq.astype(jnp.bfloat16)
        gql = (gq - gqh.astype(jnp.float32)).astype(jnp.bfloat16)
        ohb = oh.astype(jnp.bfloat16)
        _f = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn_r,
            preferred_element_type=jnp.float32, precision=_PDEF,
        )
        gcen = _f(gqh, ohb) + _f(gql, ohb)
        contrib = jnp.concatenate(
            [gp + gcen, jnp.zeros((5, m), jnp.float32)], axis=0
        )

    @pl.when(j == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(j > 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "rb", "directd", "blockw", "packmm", "sdiagr", "dsdiag", "rsq",
        "tfac", "cen8", "bfw",
    ),
)
def _variant_call(
    cloud, normal, ref, mask, k, rb, directd, blockw, packmm=False,
    sdiagr=False, dsdiag=False, rsq=False, tfac=False, cen8=False,
    bfw=False,
):
    b, n, _ = cloud.shape
    grid = (b, n // rb)
    pt = jnp.concatenate(
        [jnp.swapaxes(cloud, 1, 2), jnp.zeros((b, 5, n), jnp.float32)], axis=1
    )
    cen_spec = (
        pl.BlockSpec((1, rb, 8), lambda i, j: (i, j, 0))
        if cen8
        else pl.BlockSpec((1, 8, rb), lambda i, j: (i, 0, j))
    )
    cen_shape = (
        jax.ShapeDtypeStruct((b, n, 8), jnp.float32)
        if cen8
        else jax.ShapeDtypeStruct((b, 8, n), jnp.float32)
    )
    sq, planes, cen = pl.pallas_call(
        functools.partial(
            _kernel_variant, k=k, npts=n, directd=directd, blockw=blockw,
            packmm=packmm, sdiagr=sdiagr, dsdiag=dsdiag, rsq=rsq,
            tfac=tfac, cen8=cen8, bfw=bfw,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, rb, 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, rb, n), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, rb), lambda i, j: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rb), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 8, n), lambda i, j: (i, 0, 0)),
            cen_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, n), jnp.float32),
            cen_shape,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(cloud, pt, normal, mask, ref[:, None, :])
    if cen8:
        planes = planes + jnp.swapaxes(cen, 1, 2)
    elif blockw:
        planes = planes + cen
    return jnp.sum(sq[:, 0], axis=-1) / n, planes


def _traced_ms(fn, args_list):
    """Longest-X-device-event trace time over len(args_list) calls / reps."""
    logdir = tempfile.mkdtemp(prefix="curv_term_trace")
    try:
        with jax.profiler.trace(logdir):
            outs = [fn(*a) for a in args_list]
            jax.block_until_ready(outs)
            np.asarray(outs[-1][0])
        paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
        with gzip.open(paths[0], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        dev_pids = {
            ev.get("pid")
            for ev in events
            if ev.get("ph") == "M"
            and ev.get("name") == "process_name"
            and "device:" in str(ev.get("args", {}).get("name", ""))
        }
        durs = sorted(
            (
                ev.get("dur", 0) / 1e3
                for ev in events
                if ev.get("ph") == "X" and ev.get("pid") in dev_pids
                and ev.get("dur", 0) > 0
            ),
            reverse=True,
        )
        # each call is its own top-level device event; median of the top
        # len(args_list) events is robust to a stray long fetch
        top = durs[: len(args_list)]
        return float(np.median(top)) if top else float("nan")
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


def main():
    rng = np.random.RandomState(0)

    def draw(seed):
        r = np.random.RandomState(seed)
        c = r.randn(B, N, 3).astype(np.float32)
        c /= np.abs(c).max()
        nrm = r.randn(B, N, 3).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        ref = np.abs(r.randn(B, N)).astype(np.float32)
        return jnp.asarray(c), jnp.asarray(nrm), jnp.asarray(ref)

    c0, n0, r0 = draw(0)
    mask0 = kappa_selmask_call(c0, K, RB, "exact")

    # parity reference: the shipped kernel
    v_base, p_base = _curv_term_frommask_call(c0, n0, r0, mask0, K, RB)
    v_base, p_base = np.asarray(v_base), np.asarray(p_base)

    variants = {
        "base": dict(directd=False, blockw=False),
        "directd": dict(directd=True, blockw=False),
        "blockw": dict(directd=False, blockw=True),
        "both": dict(directd=True, blockw=True),
        "b+packmm": dict(directd=True, blockw=True, packmm=True),
        "b+sdiagr": dict(directd=True, blockw=True, sdiagr=True),
        "b+pm+sd": dict(directd=True, blockw=True, packmm=True, sdiagr=True),
        # "ship" mirrors the shipped round-5 kernel (direct sdiag + gated
        # reciprocal) inside this harness; "ship+rsq" replaces the
        # sqrt/max/divide chain with one gated rsqrt (min-clamped to 1/eps)
        # and gates the w2 clamp on d0 > eps^2 so r never materialises
        "ship": dict(directd=True, blockw=True, dsdiag=True),
        "ship+rsq": dict(directd=True, blockw=True, rsq=True),
        # round-5b: t-factored weights (t = maskf*gk*inv shared by w1/w2,
        # w2 = t * (a*inv)) with the eps clamps riding inv's zero-gate —
        # 3-4 fewer [R, m] VPU ops and no compare/where in the weight pass
        "tfac": dict(directd=True, blockw=True, tfac=True),
        # + transpose-free (1, R, 8) center write (caller transposes once)
        "tfac8": dict(directd=True, blockw=True, tfac=True, cen8=True),
        # + single-pass bf16 backward contractions (no hi/lo splits)
        "tfacb": dict(directd=True, blockw=True, tfac=True, bfw=True),
        # + bf16 single-pass for the cancellation-free nv^T w1 dot only
        "tfach": dict(directd=True, blockw=True, tfac=True, bfw="w1"),
    }
    only = os.environ.get("VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}
    # fresh inputs per rep: the relay memoizes identical (program, input)
    args = []
    for s in range(REPS):
        c, nv, rf = draw(100 + s)
        args.append((c, nv, rf, kappa_selmask_call(c, K, RB, "exact")))

    for name, kw in variants.items():
        f = functools.partial(_variant_call, k=K, rb=RB, **kw)
        v, p = f(c0, n0, r0, mask0)
        v, p = np.asarray(v), np.asarray(p)
        vrel = float(np.abs(v - v_base).max() / (np.abs(v_base).max() + 1e-12))
        prel = float(np.abs(p - p_base).max() / (np.abs(p_base).max() + 1e-12))
        ms = _traced_ms(f, args)
        print(
            f"{name:8s}: {ms:7.3f} ms/call  value_rel={vrel:.2e} "
            f"planes_rel={prel:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
