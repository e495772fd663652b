"""Furthest-point sampling + index gathers.

TPU-native replacement for the reference's CUDA FPS / gather kernels
(reference: Model/pointnet2_ops_lib/pointnet2_ops/_ext-src/src/sampling_gpu.cu)
and the pure-torch random-start FPS used for resampling
(reference: Lib/utility.py:175-203).

FPS is inherently sequential over the m selected samples. On TPU it runs as
the batch-parallel Pallas kernel (ops/pallas/fps_kernel.py) with the running
min-distance state resident in VMEM; elsewhere it is an m-step
``lax.fori_loop`` of vectorised distance-update + masked argmax — the same
O(m*n) work the CUDA kernel does. For PN++ (n=1024, m=512) this is the
victim's hot sampling path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e10


def _use_pallas() -> bool:
    from geoa3_tpu.ops.knn import _pallas_disabled
    from geoa3_tpu.ops.pallas.knn_kernel import pallas_available

    return pallas_available() and not _pallas_disabled("fps")


def furthest_point_sampling(xyz: jax.Array, npoint: int) -> jax.Array:
    """Greedy FPS, CUDA-kernel semantics. xyz: [b, n, 3] -> idx [b, npoint] int32.

    Parity notes (reference: sampling_gpu.cu:69-229):
      * always starts from index 0 (sampling_gpu.cu:86);
      * points with squared magnitude <= 1e-3 never become candidates
        (sampling_gpu.cu:100-101) — a near-origin-point skip in the original;
      * running min-distance buffer starts at 1e10 (sampling.cpp:78).
    Non-differentiable (index output).
    """
    xyz = jax.lax.stop_gradient(xyz)
    b, n, _ = xyz.shape
    if _use_pallas():
        from geoa3_tpu.ops.pallas.fps_kernel import fps_pallas

        return fps_pallas(xyz, npoint, skip_near_origin=True)
    mag_ok = jnp.sum(xyz * xyz, axis=-1) > 1e-3  # [b, n]

    def body(j, carry):
        mindist, idxs, last = carry
        last_pt = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [b,1,3]
        d = jnp.sum((xyz - last_pt) ** 2, axis=-1)  # [b, n]
        mindist = jnp.minimum(mindist, d)
        # Skipped points never participate in the argmax.
        score = jnp.where(mag_ok, mindist, -1.0)
        nxt = jnp.argmax(score, axis=-1).astype(jnp.int32)  # [b]
        idxs = jax.lax.dynamic_update_slice(idxs, nxt[:, None], (0, j))
        return mindist, idxs, nxt

    idxs0 = jnp.zeros((b, npoint), jnp.int32)
    mindist0 = jnp.full((b, n), _INF, xyz.dtype)
    start = jnp.zeros((b,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (mindist0, idxs0, start))
    return idxs


def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features [b, n, c], idx [b, m] -> [b, m, c].

    Equivalent of `gather_operation` (reference: sampling_gpu.cu:8-57);
    differentiable via XLA's gather VJP (the reference needed a hand-written
    atomicAdd scatter kernel for this).
    """
    return jnp.take_along_axis(features, idx[..., None], axis=1)


def _fps_random_start(
    points: jax.Array, num_points: int, key: jax.Array
) -> jax.Array:
    """Random-start FPS indices, torch-utility semantics. points [b,n,3] -> [b,num_points].

    Mirrors `farthest_points_sample` (reference: Lib/utility.py:175-187): the
    random first pick IS part of the returned selection, distances are
    non-squared there but argmax ordering is identical under sqrt, so squared
    distances are used here.
    """
    points = jax.lax.stop_gradient(points)
    b, n, _ = points.shape
    first = jax.random.randint(key, (b,), 0, n, dtype=jnp.int32)
    if _use_pallas():
        from geoa3_tpu.ops.pallas.fps_kernel import fps_pallas

        return fps_pallas(points, num_points, start=first, skip_near_origin=False)

    def body(j, carry):
        mindist, idxs, last = carry
        last_pt = jnp.take_along_axis(points, last[:, None, None], axis=1)
        d = jnp.sum((points - last_pt) ** 2, axis=-1)
        mindist = jnp.minimum(mindist, d)
        nxt = jnp.argmax(mindist, axis=-1).astype(jnp.int32)
        idxs = jax.lax.dynamic_update_slice(idxs, nxt[:, None], (0, j))
        return mindist, idxs, nxt

    idxs0 = jnp.zeros((b, num_points), jnp.int32)
    idxs0 = jax.lax.dynamic_update_slice(idxs0, first[:, None], (0, 0))
    mindist0 = jnp.full((b, n), _INF, points.dtype)
    _, idxs, _ = jax.lax.fori_loop(1, num_points, body, (mindist0, idxs0, first))
    return idxs


def farthest_points_sample(
    points: jax.Array, num_points: int, key: jax.Array
) -> jax.Array:
    """Random-start FPS resampling of a cloud. points [b, n, 3] -> [b, num_points, 3].

    Replacement for `farthest_points_sample` (reference: Lib/utility.py:175-187),
    used to downsample oversized adversarial clouds before evaluation
    (reference: main_attack.py:251-252, defense.py:94-96). JAX needs the
    explicit RNG key the reference got from the global torch seed.
    """
    idx = _fps_random_start(points, num_points, key)
    return gather_points(points, idx)


def farthest_points_sample_with_normal(
    points: jax.Array, normals: jax.Array, num_points: int, key: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """FPS resampling carrying normals along (reference: Lib/utility.py:189-203)."""
    idx = _fps_random_start(points, num_points, key)
    return gather_points(points, idx), gather_points(normals, idx)
