"""Fused (matmul | kernel-3 conv) + (segmented) max-pool Pallas kernel.

Two families of pre-pool activations dominate the victims' attack-step HBM
traffic while their FLOPs are trivial:

  * PointNet's three GLOBAL poolings (TransformNet conv3+bn3+pool x2 and
    conv5+bn5+pool, reference Model/PointNet.py:65-67,110-118): each
    materialises [b, n, 1024] (128 MB at b=32) that XLA re-reads in the
    pool forward, the pool backward's eq-mask, and the dX matmul —
    ~2.2 ms/step of HBM traffic.
  * PN++'s per-SA LAST MLP layer + max over nsample (reference
    pointnet2_modules.py:29-74): [b, m, ns, c_out] (134 MB at SSG SA1,
    b=16) with the same fwd/bwd re-read pattern (~1.5 ms/step).

This kernel computes the (folded-BN) affine in VMEM tiles and max-pools
over segments of `seg` rows before anything returns to HBM: traffic drops
to X [b, g*s, cin] + pooled [b, g, cout]. Fusing ONLY the last layer is
deliberate: round-2/3 measurements (RESULTS.md) show fusing the whole SA
MLP chain loses to XLA's pipeline, while the pool is where the HBM
traffic multiplies.

The ReLU between the affine and the pool commutes with max (monotone, and
relu'(0) = 0 makes the tie/clamp gradients agree), so callers apply it
AFTER pooling on the [b, g, cout] result.

The custom VJP recomputes the affine tile (remat), rebuilds jnp.max's
exact tie semantics (gradient split evenly among equal maxima via an
eq-mask / count — PN++ groups contain exact duplicate rows from
first-hit ball-query padding, so ties are COMMON there, not a corner
case), and emits ONLY the input cotangent as MXU matmuls. The weights are
frozen victim params in the attack (callers pass them through
stop_gradient; train mode uses the unfused path).

Precision: same contract as group_mlp_kernel — f32 operands run split-bf16
3-pass dots (~2^-21 relative error, at least as tight as XLA's default
f32-dot lowering on TPU); bf16 victims run single-pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from geoa3_tpu.ops.pallas.group_mlp_kernel import _mm, _mm_t, pallas_available


def _shift_rows(x, by: int):
    """Static row shift with zero fill: by=+1 -> row p holds x[p-1]."""
    if by == 0:
        return x
    z = jnp.zeros((abs(by), x.shape[1]), x.dtype)
    if by > 0:
        return jnp.concatenate([z, x[:-by]], axis=0)
    return jnp.concatenate([x[-by:], z], axis=0)


def _affine(x, w3, b, f32_exact: bool):
    """z [R, cb] = sum_k shift(x, 1-k) @ w3[k] + b  (zero row padding)."""
    taps = w3.shape[0]
    if taps == 1:
        z = _mm(x, w3[0], f32_exact)
    else:
        assert taps == 3
        z = _mm(x, w3[1], f32_exact)
        z = z + _mm(_shift_rows(x, 1), w3[0], f32_exact)
        z = z + _mm(_shift_rows(x, -1), w3[2], f32_exact)
    return z + b


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, seg: int, f32_exact: bool):
    z = _affine(x_ref[0], w_ref[:], b_ref[:], f32_exact)
    gb = out_ref.shape[1]
    out_ref[0] = jnp.max(z.reshape(gb, seg, -1), axis=1)


def _bwd_kernel(
    x_ref, w_ref, b_ref, p_ref, g_ref, dx_ref, *, seg: int, f32_exact: bool
):
    x = x_ref[0]
    w3 = w_ref[:]
    z = _affine(x, w3, b_ref[:], f32_exact)
    gb, cb = p_ref.shape[1], p_ref.shape[2]
    z3 = z.reshape(gb, seg, cb)
    eq = (z3 == p_ref[0][:, None, :]).astype(jnp.float32)
    cnt = jnp.sum(eq, axis=1, keepdims=True)
    m = (eq * (g_ref[0][:, None, :] / cnt)).reshape(gb * seg, cb)
    taps = w3.shape[0]
    if taps == 1:
        dx = _mm_t(m, w3[0], f32_exact)
    else:
        # z[p] got x[p-1] via tap 0 and x[p+1] via tap 2, so their
        # cotangents land one row down/up respectively
        dx = _mm_t(m, w3[1], f32_exact)
        dx = dx + _shift_rows(_mm_t(m, w3[0], f32_exact), -1)
        dx = dx + _shift_rows(_mm_t(m, w3[2], f32_exact), 1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dx_ref[0] = dx

    @pl.when(j > 0)
    def _acc():
        dx_ref[0] += dx


def _blocks(g: int, seg: int, cin: int, cout: int):
    """(groups-per-tile, cout-block): bound the per-tile VMEM footprint.

    The backward holds per row the z tile (cb lanes), its eq/cotangent
    tile (cb), the x block (cin) and the dx accumulator (cin) — f32 plus
    bf16 split copies — with the x/dx blocks double-buffered by the
    pipeline, so the budget counts cb + cin per row. A 2 MB z-tile budget
    keeps the whole stack under Mosaic's 16 MB scoped-vmem limit
    (observed: SSG SA2's 4096-row x 256 z tile at a cb-only 4 MB budget
    overflowed scoped vmem by 121 KB). The global pool (g=1) needs the
    whole segment in one tile, hence the max(seg, ...) floor."""
    cb = min(cout, 512)
    while cout % cb:
        cb //= 2
    rows_max = max(seg, (2 << 20) // (4 * (cb + cin)))
    gb = max(1, min(g, rows_max // seg))
    while g % gb:
        gb -= 1
    return gb, cb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pool_affine_max(
    x: jax.Array,
    w3: jax.Array,
    b: jax.Array,
    seg: int = 0,
    f32_exact: bool = True,
) -> jax.Array:
    """Segmented max over (k-tap conv(x) + b) -> [B, g, cout].

    x: [B, R, cin] with R = g * seg (seg=0 means one global segment,
    g=1); w3: [taps, cin, cout] with taps in {1, 3} (tap k sees
    x[p + k - taps//2], zero row padding — nn.Conv SAME semantics; taps=3
    requires seg=global); b: [cout] with any BN affine already folded in.
    """
    return _fwd(x, w3, b, seg, f32_exact)


def _fwd(x, w3, b, seg, f32_exact):
    B, R, cin = x.shape
    seg = seg or R
    assert R % seg == 0 and (w3.shape[0] == 1 or seg == R)
    g = R // seg
    cout = w3.shape[-1]
    gb, cb = _blocks(g, seg, cin, cout)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, seg=seg, f32_exact=f32_exact),
        grid=(B, g // gb, cout // cb),
        in_specs=[
            pl.BlockSpec((1, gb * seg, cin), lambda i, k, j: (i, k, 0)),
            pl.BlockSpec((w3.shape[0], cin, cb), lambda i, k, j: (0, 0, j)),
            pl.BlockSpec((1, cb), lambda i, k, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, gb, cb), lambda i, k, j: (i, k, j)),
        out_shape=jax.ShapeDtypeStruct((B, g, cout), jnp.float32),
        interpret=_interpret(),
    )(x.astype(jnp.float32), w3.astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32))
    return out


def _fwd_rule(x, w3, b, seg, f32_exact):
    out = _fwd(x, w3, b, seg, f32_exact)
    return out, (x, w3, b, out)


def _bwd_rule(seg, f32_exact, res, g_cot):
    x, w3, b, pooled = res
    B, R, cin = x.shape
    seg = seg or R
    g = R // seg
    cout = w3.shape[-1]
    gb, cb = _blocks(g, seg, cin, cout)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, seg=seg, f32_exact=f32_exact),
        grid=(B, g // gb, cout // cb),
        in_specs=[
            pl.BlockSpec((1, gb * seg, cin), lambda i, k, j: (i, k, 0)),
            pl.BlockSpec((w3.shape[0], cin, cb), lambda i, k, j: (0, 0, j)),
            pl.BlockSpec((1, cb), lambda i, k, j: (0, j)),
            pl.BlockSpec((1, gb, cb), lambda i, k, j: (i, k, j)),
            pl.BlockSpec((1, gb, cb), lambda i, k, j: (i, k, j)),
        ],
        out_specs=pl.BlockSpec((1, gb * seg, cin), lambda i, k, j: (i, k, 0)),
        out_shape=jax.ShapeDtypeStruct((B, R, cin), jnp.float32),
        interpret=_interpret(),
    )(x.astype(jnp.float32), w3.astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32), pooled,
      g_cot.astype(jnp.float32))
    return (dx.astype(x.dtype), jnp.zeros_like(w3), jnp.zeros_like(b))


pool_affine_max.defvjp(_fwd_rule, _bwd_rule)

_FORCE_INTERPRET = False


def _interpret() -> bool:
    if _FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # pragma: no cover
        return True


def platform_f32_exact() -> bool:
    """Whether a victim's fused pool should run the split-bf16 3-pass dots.

    The point of the fused pool is to replace the unfused XLA pipeline at
    EQUAL numerics and lower HBM traffic. On TPU, XLA lowers the victim's
    default-precision f32 dots to single-pass bf16 (operands rounded, f32
    accumulate) — so the matching kernel mode is f32_exact=False; running
    3-pass there triples the pool's MXU time for precision the rest of the
    victim never had (measured: 2.12 -> ~0.7 ms/step across PointNet's
    three pools). Off-TPU (CPU tests, interpret mode) XLA computes true
    f32 dots, so the matching mode is f32_exact=True. Loss-geometry
    kernels (kNN/scatter/chamfer) keep their own f32-exact contract —
    this helper is only for victim-network affines."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover
        return True


def pool_matmul_available(
    n: int, cin: int, cout: int, seg: int = 0, taps: int = 1
) -> bool:
    """Shape gate: default-ON on TPU (kill switch GEOA3_DISABLE_PALLAS=pool)."""
    from geoa3_tpu.ops import dispatch

    if dispatch.pallas_disabled("pool"):
        return False
    if not pallas_available():
        return False
    if taps == 3 and seg not in (0, n):
        return False
    if seg and (n % seg or seg % 8):
        return False
    lanes_ok = cin % 128 == 0 or cin in (64,)
    return n % 8 == 0 and lanes_ok and cout % 128 == 0
