"""Furthest-point-sampling Pallas kernel.

FPS is inherently sequential over the m selected samples (reference CUDA:
sampling_gpu.cu:69-229). The XLA `fori_loop` version round-trips the running
min-distance vector and the index buffer through HBM every iteration and
serialises per batch; this kernel keeps everything in VMEM and processes the
WHOLE batch per iteration as [b, n] vector ops (b on sublanes, n on lanes):

  per step: selected-point coords via masked row-sums (3 x [b, n] pass),
  distance update + min + masked argmax (4 x [b, n] pass), one [b] column
  store — ~7 VPU passes over ~128 KB, x m steps.

Semantics match the CUDA kernel: start at index 0, points with squared
magnitude <= 1e-3 never become candidates, min-distance buffer starts at 1e10,
ties break to the lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = 1e10


def _fps_kernel(x0_ref, x1_ref, x2_ref, start_ref, idx_ref, *, m: int, skip_near_origin: bool):
    """x{0,1,2}_ref: [b, n] coordinate planes; start_ref [b, 1] int32;
    idx_ref out [b, m] int32."""
    x0 = x0_ref[...]
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    b, n = x0.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    if skip_near_origin:  # CUDA mag<=1e-3 skip (sampling_gpu.cu:100-101)
        mag_ok = (x0 * x0 + x1 * x1 + x2 * x2) > 1e-3
    else:  # the torch random-start variant has no such skip
        mag_ok = jnp.ones((b, n), jnp.bool_)

    start = start_ref[:, 0]  # [b]
    col_m = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def body(j, carry):
        mindist, last, idxs = carry  # [b, n], [b], [b, m]
        sel = col == last[:, None]  # [b, n]
        # coords of the last selected point per batch row (masked row-sum)
        lx = jnp.sum(jnp.where(sel, x0, 0.0), axis=1)[:, None]
        ly = jnp.sum(jnp.where(sel, x1, 0.0), axis=1)[:, None]
        lz = jnp.sum(jnp.where(sel, x2, 0.0), axis=1)[:, None]
        d = (x0 - lx) ** 2 + (x1 - ly) ** 2 + (x2 - lz) ** 2
        mindist = jnp.minimum(mindist, d)
        score = jnp.where(mag_ok, mindist, -1.0)
        # lowest-index argmax (CUDA reduction tie-break is layout-dependent;
        # lowest-index matches the numpy oracle used in tests)
        best = jnp.max(score, axis=1)
        nxt = jnp.min(
            jnp.where(score == best[:, None], col, n), axis=1
        ).astype(jnp.int32)
        # Mosaic has no dynamic-lane column store: select into the carried
        # index matrix instead and bulk-store it once after the loop
        idxs = jnp.where(col_m == j, nxt[:, None], idxs)
        return mindist, nxt, idxs

    mindist0 = jnp.full((b, n), _INF, jnp.float32)
    idxs0 = jnp.where(col_m == 0, start[:, None], 0)
    _, _, idxs = jax.lax.fori_loop(1, m, body, (mindist0, start, idxs0))
    idx_ref[...] = idxs


@functools.partial(jax.jit, static_argnames=("m", "skip_near_origin"))
def fps_pallas(
    xyz: jax.Array,
    m: int,
    start: jax.Array | None = None,
    skip_near_origin: bool = True,
) -> jax.Array:
    """FPS indices: xyz [b, n, 3] -> [b, m] int32.

    `start=None` uses index 0 (CUDA semantics, sampling_gpu.cu:86); pass a
    [b] int32 array for the random-start torch variant
    (reference Lib/utility.py:175-187).
    """
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    start = start.astype(jnp.int32)
    # Mosaic miscompiles single-sublane ([1, n]) blocks: pad tiny batches to 8
    b_pad = (-b) % 8 if b < 8 else 0
    if b_pad:
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[:1], (b_pad,) + xyz.shape[1:])], axis=0
        )
        start = jnp.concatenate([start, jnp.zeros((b_pad,), jnp.int32)])
    x0, x1, x2 = xyz[..., 0], xyz[..., 1], xyz[..., 2]

    idx = pl.pallas_call(
        functools.partial(_fps_kernel, m=m, skip_near_origin=skip_near_origin),
        out_shape=jax.ShapeDtypeStruct((b + b_pad, m), jnp.int32),
    )(x0, x1, x2, start[:, None])
    return idx[:b] if b_pad else idx
