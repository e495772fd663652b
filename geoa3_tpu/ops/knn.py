"""Exact k-nearest-neighbour ops (TPU-native replacement for pytorch3d kNN).

The reference leans on pytorch3d's CUDA ``knn_points``/``knn_gather`` for every
geometric loss and normal estimator (reference: Lib/loss_utils.py:10,
Lib/utility.py:11, Attacker/geoA3_attack.py:12). Here:

  * k == 1 -> one MXU distance matmul (||a||^2 + ||b||^2 - 2 a.b^T) + argmin
    (the memory-bandwidth floor);
  * k > 1 on TPU -> the fused Pallas kernel (ops/pallas/knn_kernel.py):
    distance tile in VMEM + k iterations of row-argmin/knockout, emitting
    exact neighbour coordinates for free (XLA's exact top_k is a full row
    sort, ~8x slower; its gather of [*, 3] rows another ~4 ms);
  * neighbour-gather backward -> the Pallas one-hot-matmul scatter
    (ops/pallas/scatter_kernel.py; XLA lowers scatter-add as sort+reduce);
  * elsewhere (CPU tests) -> plain XLA top_k + gathers.

Returned distances are **squared** Euclidean distances, matching pytorch3d
(and therefore every reference loss built on them).

Gradient design: neighbour *indices* are treated as non-differentiable
(stop-gradient), and distances are recomputed from the gathered neighbour
coordinates, so the backward pass is a cheap gather-scatter instead of
back-propagating through the dense [n, m] distance matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KNNResult(NamedTuple):
    """pytorch3d-style KNN return, plus the gathered neighbour coordinates.

    dists/idx are [b, n, k]; nbrs is [b, n, k, c] — prefer it over a separate
    `knn_gather(points, idx)` (the XLA gather of [*, 3] rows costs ~4 ms at
    n=1024/k=16 on v5e; the Pallas path produces coordinates for free).
    """

    dists: jax.Array
    idx: jax.Array
    nbrs: jax.Array


@jax.custom_vjp
def _coords_gather(points, idx, precomputed):
    """Neighbour gather whose forward is the (exact) precomputed coordinate
    block from the Pallas kernel and whose backward is the scatter-add a
    plain take_along_axis gather would have."""
    del points, idx
    return precomputed


def _coords_gather_fwd(points, idx, precomputed):
    return precomputed, (idx, jax.lax.stop_gradient(points))


def _coords_gather_bwd(res, ct):
    idx, points = res
    b, m, c = points.shape
    if (
        c == 3 and _pallas_ok(m, idx.shape[-1]) and m % 256 == 0
        and not _pallas_disabled("scatter")
    ):
        # XLA lowers this scatter-add as sort + segmented reduce (~8 ms at
        # [32,1024,17,3] on v5e); the transposed-layout Pallas one-hot
        # matmul kernel keeps the minor matmul dim full (~16x fewer MXU
        # slots than the [TM, 3]-output variant). Accuracy: split-bf16
        # hi/lo matmuls, ~2^-16 relative error (see scatter_kernel.py
        # docstring) — fine for Adam gradients, NOT bit-equal to the f32
        # scatter
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_3t_pallas

        nq, k = idx.shape[1], idx.shape[2]
        g = scatter_add_3t_pallas(
            idx.reshape(b, nq * k), ct.reshape(b, nq * k, 3), m
        ).astype(points.dtype)
    else:
        g = (
            jnp.zeros_like(points)
            .at[jnp.arange(b)[:, None, None], idx]
            .add(ct)
        )
    return g, None, jnp.zeros_like(ct)


_coords_gather.defvjp(_coords_gather_fwd, _coords_gather_bwd)


@jax.custom_vjp
def _plane_gather(points_c, idx, precomputed):
    """Per-coordinate neighbour gather: points_c [b, m], idx [b, n, k] ->
    [b, n, k], with a precomputed exact forward (from the Pallas kernel) and
    a scatter-add backward."""
    del points_c, idx
    return precomputed


def _plane_gather_fwd(points_c, idx, precomputed):
    return precomputed, (idx, jax.lax.stop_gradient(points_c))


def _plane_gather_bwd(res, ct):
    idx, points_c = res
    b = points_c.shape[0]
    g = jnp.zeros_like(points_c).at[jnp.arange(b)[:, None, None], idx].add(ct)
    return g, None, jnp.zeros_like(ct)


_plane_gather.defvjp(_plane_gather_fwd, _plane_gather_bwd)


def _nn1_rb(n: int, m: int) -> int:
    """Row block for the dual-1NN kernels: the sweep-measured 1024 at the
    headline [n=1024, m=1024] shape (runs/bench_nn1_rb.py), shrunk when
    the ori side is dense so the ~5 live [R, m] f32 tiles (+ the [m, R]
    one-hot in the payload kernel) fit scoped VMEM — n=1024 x m=5000 at
    R=1024 OOMed the Mosaic stack at 47.9M vs the 20.7M limit (dense
    subsample-opt attack, runs/bench_dense.py). Budget R*m <= 2^20
    elements: exactly the headline shape's proven-to-compile product."""
    budget = 1 << 20
    # 128 is the row-block FLOOR when n is lane-aligned: the payload
    # kernel's per-block qp input (1, 8, R) needs R % 128 == 0 or R == n
    # (Mosaic block-shape rule), and R=128 x m=12288 f32 tiles stay well
    # under the kernels' 64 MB vmem limit even past the element budget
    cands = [r for r in (1024, 512, 256, 128) if r <= n and n % r == 0]
    for r in cands:
        if r * m <= budget:
            return r
    if cands:
        return cands[-1]
    return n  # small / unaligned n: full rows (block == array dims)


def _nn1_ok(m: int) -> bool:
    """Gate for the dual-1NN kernels' ori side: they hold one [R, m]
    distance tile (+ [8, m] payload planes) in VMEM with the row block
    scaled by _nn1_rb, so dense ori clouds up to the reference's
    modelnet_pure n=10000 (BASELINE config 3) fit at R=64. m needs only
    8-sublane alignment (the o2a outputs use full-trailing-dim blocks)."""
    from geoa3_tpu.ops.pallas.knn_kernel import pallas_available

    return m <= 12288 and m % 8 == 0 and pallas_available()


def nn1_dual(adv: jax.Array, ori: jax.Array):
    """Both 1-NN directions at once: (a2o_idx [b, n], o2a_idx [b, m]).

    One fused Pallas pass on TPU (the distance matrix never hits HBM);
    pairwise + two argmins elsewhere. Non-differentiable (indices).
    """
    adv = jax.lax.stop_gradient(adv)
    ori = jax.lax.stop_gradient(ori)
    m = ori.shape[-2]
    n = adv.shape[-2]
    if _pallas_disabled("nn1"):
        pass
    elif _nn1_ok(m) and n % 256 == 0 or (_nn1_ok(m) and n % 8 == 0 and n <= 256):
        from geoa3_tpu.ops.pallas.nn1_kernel import (
            nn1_dual_pallas,
            nn1_select_default,
        )

        return nn1_dual_pallas(adv, ori, row_block=_nn1_rb(n, m),
                               select=nn1_select_default())
    d = pairwise_sqdist(adv, ori)
    return (
        jnp.argmin(d, axis=-1).astype(jnp.int32),
        jnp.argmin(d, axis=-2).astype(jnp.int32),
    )


def nn1_dual_payload(adv: jax.Array, ori: jax.Array, payload: jax.Array):
    """nn1_dual plus exact gathers of constant planes at BOTH argmins:
    (a2o_idx [b, n], o2a_idx [b, m], gp [b, 8, n], op [b, 8, m]) with
    gp[b, p, i] = payload[b, p, a2o_idx[b, i]] and
    op[b, c, j] = adv[b, o2a_idx[b, j], c] (rows 3..7 zero).

    The attack packs (ori x/y/z, normal x/y/z, kappa_ori, 0) so the fused
    loss's a2o-side row-gathers — AND the o2a-side chamfer coordinate
    gather (previously an XLA dynamic-row take, ~0.14 ms/step at
    [32, 1024] and growing with m on dense clouds) — ride the 1-NN
    kernel's VMEM-resident distance block. All outputs are stop-gradient
    constants; for a differentiable view of `op` use o2a_coord_planes.
    """
    adv = jax.lax.stop_gradient(adv)
    ori = jax.lax.stop_gradient(ori)
    payload = jax.lax.stop_gradient(payload)
    m = ori.shape[-2]
    n = adv.shape[-2]
    if not _pallas_disabled("nn1") and (
        _nn1_ok(m)
        and (n % 256 == 0 or (n % 8 == 0 and n <= 256))
    ):
        from geoa3_tpu.ops.pallas.nn1_kernel import (
            nn1_dual_payload_pallas,
            nn1_select_default,
        )

        return nn1_dual_payload_pallas(adv, ori, payload,
                                       row_block=_nn1_rb(n, m),
                                       select=nn1_select_default())
    d = pairwise_sqdist(adv, ori)
    a2o = jnp.argmin(d, axis=-1).astype(jnp.int32)
    o2a = jnp.argmin(d, axis=-2).astype(jnp.int32)
    gp = jnp.take_along_axis(payload, a2o[:, None, :], axis=-1)
    o2a_nn = jnp.take_along_axis(
        adv, o2a[..., None].astype(jnp.int32), axis=1
    )  # [b, m, 3]
    op = jnp.concatenate(
        [
            jnp.swapaxes(o2a_nn, 1, 2),
            jnp.zeros((adv.shape[0], 5, m), adv.dtype),
        ],
        axis=1,
    )
    return a2o, o2a, gp, op


@jax.custom_vjp
def o2a_coord_planes(
    points: jax.Array, idx: jax.Array, op: jax.Array
) -> jax.Array:
    """Differentiable view of the o2a coordinate planes: points [b, n, 3],
    idx [b, m] (o2a argmins), op [b, 8, m] (the kernel's exact copies of
    points rows at idx) -> op, with the backward scatter-adding the plane
    cotangents into `points` rows (the Pallas one-hot-matmul scatter —
    same route as gather_rows3's backward). idx/op get no gradient."""
    del points, idx
    return op


def _o2a_coord_planes_fwd(points, idx, op):
    return op, (idx, points.shape[1])


def _o2a_coord_planes_bwd(res, ct):
    idx, n = res
    g, _ = _gather_rows3_bwd((idx, n), ct[:, :3].transpose(0, 2, 1))
    return g, None, None


o2a_coord_planes.defvjp(_o2a_coord_planes_fwd, _o2a_coord_planes_bwd)


class KNNPlanes(NamedTuple):
    """kNN result in coordinate-plane form: TPU-friendly [b, n, k] tensors.

    Elementwise math on [b, n, k, 3] tensors lane-pads 3 -> 128 on TPU (85x
    wasted bandwidth per op); the plane layout keeps every tensor at [b, n, k].
    """

    idx: jax.Array  # [b, n, k]
    x: jax.Array  # [b, n, k], differentiable w.r.t. points
    y: jax.Array
    z: jax.Array


def knn_points_planes(query: jax.Array, points: jax.Array, k: int) -> KNNPlanes:
    """Exact kNN returning per-coordinate neighbour planes (TPU fast path).

    Falls back to gather-based planes off-TPU. Differentiable in `points`
    (scatter-add VJP per plane); indices are stop-gradient.
    """
    q_sg = jax.lax.stop_gradient(query)
    p_sg = jax.lax.stop_gradient(points)
    m = points.shape[-2]
    if (
        k > 1 and _TOPK_MODE in ("auto", "pallas") and _pallas_ok(m, k)
        and not _pallas_disabled("knn")
    ):
        from geoa3_tpu.ops.pallas.knn_kernel import knn_pallas_planes

        row_block = max(8, min(256, _PALLAS_VMEM_BUDGET // (m * 4) // 8 * 8))
        idx, x, y, z = knn_pallas_planes(q_sg, p_sg, k, row_block=row_block)
        idx = jax.lax.stop_gradient(idx)
        return KNNPlanes(
            idx=idx,
            x=_plane_gather(points[..., 0], idx, jax.lax.stop_gradient(x)),
            y=_plane_gather(points[..., 1], idx, jax.lax.stop_gradient(y)),
            z=_plane_gather(points[..., 2], idx, jax.lax.stop_gradient(z)),
        )
    idx, _ = _knn_search(q_sg, p_sg, k)
    idx = jax.lax.stop_gradient(idx)
    nbrs = knn_gather(points, idx)
    return KNNPlanes(idx=idx, x=nbrs[..., 0], y=nbrs[..., 1], z=nbrs[..., 2])


# --------------------------------------------------------------------------
# top-k backend selection.
#
# XLA's exact top_k on TPU is a full row sort (~8x the cost of the reduction
# floor at n=1024). k=1 always uses a plain argmin (exact, at the memory-
# bandwidth floor). For k>1 the default stays exact; 'approx' switches to the
# TPU-optimised jax.lax.approx_min_k (PanoTopK), which at recall 0.99 agrees
# with exact kNN on >99.9% of neighbours at ~half the cost — useful for the
# k=16 curvature neighbourhood where a swapped borderline neighbour moves the
# loss by <0.1%.
# --------------------------------------------------------------------------

_TOPK_MODE: str = "auto"
_TOPK_RECALL: float = 0.99
# the pallas kernel keeps an [R, m] f32 block in VMEM; cap its footprint
_PALLAS_MAX_M = 8192
_PALLAS_VMEM_BUDGET = 4 * 1024 * 1024


def set_topk_backend(mode: str) -> None:
    """k>1 neighbour search backend: 'auto' (pallas on TPU, else top_k),
    'pallas', 'exact' (XLA top_k), or 'approx[:recall]' (approx_min_k)."""
    global _TOPK_MODE, _TOPK_RECALL
    if mode.startswith("approx"):
        _TOPK_MODE = "approx"
        if ":" in mode:
            _TOPK_RECALL = float(mode.split(":", 1)[1])
    elif mode in ("exact", "auto", "pallas"):
        _TOPK_MODE = mode
    else:
        raise ValueError(f"unknown topk backend {mode!r}")


def get_topk_backend() -> str:
    return _TOPK_MODE if _TOPK_MODE != "approx" else f"approx:{_TOPK_RECALL}"


def _pallas_disabled(which: str) -> bool:
    """Kill-switch: GEOA3_DISABLE_PALLAS="knn,nn1,scatter,fps" (or "all"),
    plus the trace-time pinned-composed context (ops/dispatch.py)."""
    from geoa3_tpu.ops import dispatch

    return dispatch.pallas_disabled(which)


def _pallas_ok(m: int, k: int) -> bool:
    from geoa3_tpu.ops.pallas.knn_kernel import pallas_available

    return m <= _PALLAS_MAX_M and k <= 64 and pallas_available()


def _knn_search(query: jax.Array, points: jax.Array, k: int):
    """(idx [b,n,k], nbr-coords [b,n,k,c] or None). Exact except 'approx'."""
    m = points.shape[-2]
    if k == 1:
        d = pairwise_sqdist(query, points)
        return jnp.argmin(d, axis=-1)[..., None].astype(jnp.int32), None
    mode = _TOPK_MODE
    if mode in ("auto", "pallas"):
        mode = (
            "pallas"
            if _pallas_ok(m, k) and not _pallas_disabled("knn")
            else "exact"
        )
    if mode == "pallas":
        from geoa3_tpu.ops.pallas.knn_kernel import knn_pallas

        row_block = max(
            8, min(256, _PALLAS_VMEM_BUDGET // (m * 4) // 8 * 8)
        )
        out = knn_pallas(query, points, k, row_block=row_block)
        return out.idx, out.nbrs
    d = pairwise_sqdist(query, points)
    if mode == "approx":
        _, idx = jax.lax.approx_min_k(d, k, recall_target=_TOPK_RECALL)
        return idx.astype(jnp.int32), None
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), None


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distance matrix between two point sets.

    a: [..., n, d], b: [..., m, d] -> [..., n, m].

    Same expansion the reference keeps in comments as the dense fallback
    (reference: Lib/loss_utils.py:30-31, Model/PointNet.py:29-35).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., n, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # [..., m, 1]
    # One MXU matmul; accumulate in f32 regardless of input dtype.
    ab = jnp.einsum(
        "...nd,...md->...nm", a, b, preferred_element_type=jnp.float32
    )
    d = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * ab
    return jnp.maximum(d, 0.0)


@jax.custom_vjp
def gather_rows3(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather points [b, n, 3], idx [b, s] -> [b, s, 3] whose backward
    is the Pallas one-hot-matmul scatter when available (XLA lowers the
    take-backward as sort + segmented reduce — ~0.3 ms/step for the
    o2a-side chamfer gather at b=32)."""
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def _gather_rows3_fwd(points, idx):
    out = jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
    return out, (idx, points.shape[1])


def _gather_rows3_bwd(res, ct):
    idx, n = res
    if (
        _pallas_ok(n, 2) and n % 256 == 0
        and not _pallas_disabled("scatter")
    ):
        from geoa3_tpu.ops.pallas.scatter_kernel import scatter_add_3t_pallas

        g = scatter_add_3t_pallas(idx.astype(jnp.int32), ct, n)
    else:
        b = idx.shape[0]
        g = (
            jnp.zeros((b, n, 3), ct.dtype)
            .at[jnp.arange(b)[:, None], idx]
            .add(ct)
        )
    return g, None


gather_rows3.defvjp(_gather_rows3_fwd, _gather_rows3_bwd)


def kappa_pallas_padded(
    cloud: jax.Array, normal: jax.Array, k: int, select: str = None
) -> jax.Array:
    """kappa_pallas on a dense / lane-unaligned cloud (reference
    modelnet_pure n=10000, BASELINE config 3): pad to kappa_padded_n(n)
    with far-away DISTINCT sentinel points and slice the result back.

    Real rows never select a sentinel (squared distance >= ~1e6 vs a unit
    cloud), so their kappa — and, through the masked analytic backward,
    their gradient (sentinel rows' cotangents are zero after the slice) —
    is bitwise what the unpadded kernel would produce."""
    from geoa3_tpu.ops.pallas.kappa_kernel import (
        _pick_row_block,
        kappa_padded_n,
        kappa_pallas,
        kappa_select_default,
    )

    b, n, _ = cloud.shape
    pad_n = kappa_padded_n(n)
    if select is None:
        select = kappa_select_default()
    if pad_n != n:
        pad = pad_n - n
        sent = (
            1e3 + 10.0 * jnp.arange(pad, dtype=cloud.dtype)[:, None]
        ) * jnp.ones((1, 3), cloud.dtype)
        cloud = jnp.concatenate(
            [cloud, jnp.broadcast_to(sent, (b, pad, 3))], axis=1
        )
        normal = jnp.concatenate(
            [normal, jnp.zeros((b, pad, 3), normal.dtype)], axis=1
        )
    kp = kappa_pallas(cloud, normal, k, _pick_row_block(pad_n), select)
    return kp[:, :n]


def knn_kappa(cloud: jax.Array, normal: jax.Array, k: int) -> jax.Array:
    """Curvature proxy over the self-kNN neighbourhood: cloud [b, n, 3],
    normal [b, n, 3] (loss constants) -> kappa [b, n].

    kappa_i = mean_{j in kNN_k(i), j != i} |unit(p_j - p_i) . n_i| — the
    curvature statistic of reference Lib/loss_utils.py:70-85 with the
    borrowed normal passed in. On TPU this is one fused Pallas kernel whose
    backward is analytic mask-weighted matmuls (no scatter-add; see
    ops/pallas/kappa_kernel.py — kappa agrees with the composed path to
    ~1e-3 relative, not bitwise). Elsewhere: composed knn_points ->
    normalize -> abs-dot-mean, bit-identical to the engine's pre-fusion
    inline math. `normal` never receives gradient (the reference treats the
    borrowed normal as constant — its gather is non-differentiable).
    """
    normal = jax.lax.stop_gradient(normal)
    n = cloud.shape[-2]
    if not _pallas_disabled("kappa"):
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _pick_row_block,
            kappa_dense_available,
            kappa_pallas,
            kappa_pallas_available,
            kappa_select_default,
        )

        if kappa_pallas_available(n):
            return kappa_pallas(
                cloud, normal, k, _pick_row_block(n), kappa_select_default()
            )
        if kappa_dense_available(n):
            return kappa_pallas_padded(cloud, normal, k)
    res = knn_points(cloud, cloud, k=k + 1)
    nn_pts = res.nbrs[:, :, 1:, :]
    vectors = nn_pts - cloud[:, :, None, :]
    vectors = vectors / jnp.maximum(
        jnp.linalg.norm(vectors, axis=-1, keepdims=True), 1e-12
    )
    return jnp.abs(
        jnp.sum(vectors * normal[:, :, None, :], axis=-1)
    ).mean(axis=-1)


def kappa_mask_path_available(n: int) -> bool:
    """True when the engine's lazy curvature refresh should cache the kappa
    selection MASK (and run the mask-consuming Pallas forward) instead of
    caching kNN indices + gathering. Mirrors knn_kappa's kernel gate."""
    if _pallas_disabled("kappa"):
        return False
    from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas_available

    return kappa_pallas_available(n)


def kappa_select_mask(cloud: jax.Array, k: int) -> jax.Array:
    """Self-kNN membership mask: cloud [b, n, 3] -> [b, n, n] int8 with k+1
    ones per row — the pre-selected self column plus the k nearest non-self
    neighbours, lowest-index tie-break (the kappa kernel's selection,
    reference semantics Lib/loss_utils.py:70-78). Non-differentiable."""
    cloud = jax.lax.stop_gradient(cloud)
    n = cloud.shape[-2]
    if not _pallas_disabled("kappa"):
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _pick_row_block,
            kappa_pallas_available,
            kappa_select_default,
            kappa_selmask_call,
        )

        if kappa_pallas_available(n):
            return kappa_selmask_call(
                cloud, k, _pick_row_block(n), kappa_select_default()
            )
    # composed: force self strictly first (d = -1 < every real distance),
    # then top_k smallest — XLA top_k keeps the lower index on equal values,
    # matching the knockout loop's tie rule
    d = pairwise_sqdist(cloud, cloud)
    diag = jnp.eye(n, dtype=bool)[None]
    d = jnp.where(diag, -1.0, d)
    _, idx = jax.lax.top_k(-d, k + 1)
    return (
        jax.nn.one_hot(idx, n, dtype=jnp.int8).sum(axis=2).astype(jnp.int8)
    )


def knn_kappa_from_mask(
    cloud: jax.Array, normal: jax.Array, mask: jax.Array, k: int
) -> jax.Array:
    """Curvature proxy with a CACHED neighbour-membership mask: cloud
    [b, n, 3], normal [b, n, 3] (loss constants), mask [b, n, n] int8 (from
    kappa_select_mask) -> kappa [b, n].

    kappa_i = sum_j mask_ij |unit(p_j - p_i) . n_i| / k (the self column
    contributes exactly zero). Used by the engine's curv_knn_refresh_every
    nested scan: the selection loop runs once per refresh block and this
    forward skips it entirely. On TPU one Pallas kernel whose backward is
    the SAME analytic mask-weighted matmuls as knn_kappa; elsewhere a
    composed masked reduction (O(n^2) matrices, test shapes only)."""
    normal = jax.lax.stop_gradient(normal)
    n = cloud.shape[-2]
    if not _pallas_disabled("kappa"):
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _pick_row_block,
            kappa_frommask_pallas,
            kappa_pallas_available,
        )

        if kappa_pallas_available(n):
            return kappa_frommask_pallas(
                cloud, normal, mask, k, _pick_row_block(n)
            )
    # composed fallback (expansion distances like the kernel; the direct-
    # difference oracle lives in the tests): dot_ij = p_j.n_i - p_i.n_i.
    # The center term is pn's own diagonal (bitwise-equal values), so the
    # self column's numerator is exactly zero like the kernel's.
    pn = jnp.einsum("bic,bjc->bij", normal, cloud)
    sdiag = jnp.diagonal(pn, axis1=1, axis2=2)
    d = pairwise_sqdist(cloud, cloud)
    # sqrt(0) has an infinite derivative; gate coincident/self pairs out of
    # the sqrt so the masked-out branch cannot poison the gradient with nan
    safe = d > 0
    r = jnp.where(safe, jnp.sqrt(jnp.where(safe, d, 1.0)), 0.0)
    a = jnp.abs(pn - sdiag[:, :, None]) / jnp.maximum(r, 1e-12)
    return jnp.sum(mask.astype(cloud.dtype) * a, axis=-1) / k


def curv_term_from_mask(
    cloud: jax.Array,
    normal: jax.Array,
    ref: jax.Array,
    mask: jax.Array,
    k: int,
) -> jax.Array:
    """Per-instance curvature loss term with a CACHED selection mask:
    cloud [b, n, 3], normal [b, n, 3], ref [b, n] (1-NN ori kappa), mask
    [b, n, n] int8 -> [b] = mean_i (kappa_i - ref_i)^2 (reference
    curvature_loss, Lib/loss_utils.py:84-97, on the lazy-refresh mask).

    On TPU one fused Pallas kernel emits the term AND its gradient planes
    from a single matrix build (the closed-form kappa-cotangent is
    row-local), so the backward is a per-instance scalar multiply — the
    mask-path forward + analytic backward previously rebuilt the same
    d0/pn matrices twice per step. Elsewhere: composed
    knn_kappa_from_mask -> mean of squared diffs (same values).
    `normal` and `ref` are loss constants (their gathers ride the
    non-differentiable nn1 payload)."""
    normal = jax.lax.stop_gradient(normal)
    ref = jax.lax.stop_gradient(ref)
    n = cloud.shape[-2]
    if not _pallas_disabled("kappa"):
        from geoa3_tpu.ops.pallas.kappa_kernel import (
            _pick_row_block,
            curv_term_frommask_pallas,
            kappa_pallas_available,
        )

        if kappa_pallas_available(n):
            return curv_term_frommask_pallas(
                cloud, normal, ref, mask, k, _pick_row_block(n)
            )
    kappa = knn_kappa_from_mask(cloud, normal, mask, k)
    return jnp.mean((kappa - ref) ** 2, axis=-1)


def knn_points(query: jax.Array, points: jax.Array, k: int) -> KNNResult:
    """k nearest neighbours of `query` in `points`.

    query: [b, n, d], points: [b, m, d] -> (dists [b, n, k], idx [b, n, k]),
    sorted ascending by distance; dists are squared (pytorch3d semantics,
    reference: Lib/loss_utils.py:32-34).
    """
    idx, pallas_nbrs = _knn_search(
        jax.lax.stop_gradient(query), jax.lax.stop_gradient(points), k
    )
    idx = jax.lax.stop_gradient(idx)
    if pallas_nbrs is not None:
        # kernel-produced coords (exact), differentiable via scatter VJP
        nbrs = _coords_gather(points, idx, jax.lax.stop_gradient(pallas_nbrs))
    else:
        nbrs = knn_gather(points, idx)  # [b, n, k, d]
    # Recompute the selected distances differentiably from the coords.
    diff = query[..., :, None, :] - nbrs
    dists = jnp.sum(diff * diff, axis=-1)
    return KNNResult(dists=dists, idx=idx, nbrs=nbrs)


@jax.custom_vjp
def knn_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbour features: points [b, m, c], idx [b, n, k] -> [b, n, k, c].

    Equivalent of pytorch3d's ``knn_gather`` (reference: Lib/loss_utils.py:58).
    Implemented as one flat `take` over the collapsed batch — ~2x faster than
    the 4D take_along_axis lowering on TPU. The backward routes 3-channel
    cotangents through the Pallas one-hot-matmul scatter when available
    (XLA's take-backward is a sort-based scatter-add, ~4 ms at the attack's
    [16, 1024, 16, 3] self-kNN shape — it dominated the lazy curvature-kNN
    path before this custom VJP).
    """
    return _knn_gather_take(points, idx)


def _knn_gather_take(points, idx):
    b, m, c = points.shape
    flat = (idx + (jnp.arange(b, dtype=idx.dtype) * m)[:, None, None]).reshape(-1)
    out = jnp.take(points.reshape(b * m, c), flat, axis=0)
    return out.reshape(idx.shape + (c,))


def _knn_gather_fwd(points, idx):
    return _knn_gather_take(points, idx), (idx, jax.lax.stop_gradient(points))


def _knn_gather_bwd(res, ct):
    idx, points = res
    g, _, _ = _coords_gather_bwd((idx, points), ct)
    return g, None


knn_gather.defvjp(_knn_gather_fwd, _knn_gather_bwd)
