"""Microbenchmark: masked-sum curvature vs the Pallas kNN-gather path.

The kappa computation (loss_utils.py:64-82 semantics) is an order-invariant
mean over the exact k-NN set, so it can be computed as a thresholded masked
reduction over the full distance matrix — no neighbour emission, no scatter
in the backward. This measures, on the real TPU:
  1. current path: knn_points (Pallas kernel) -> nbr coords -> kappa, fwd+bwd
  2. threshold costs: approx_min_k / lax.top_k on [b, n, n]
  3. masked path: D + threshold + masked |<v,n>|/||v|| reduction, fwd+bwd
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from geoa3_tpu import ops
from geoa3_tpu.ops.knn import pairwise_sqdist

B = int(os.environ.get("B", 16))
N = 1024
K = 16  # curv_loss_knn


def timed(name, fn, *args):
    import glob
    import gzip
    import json

    fn = jax.jit(fn)
    out = fn(*args)
    jax.block_until_ready(out)
    logdir = f"/tmp/kappa_trace_{name}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    dev_pids = {
        ev.get("pid") for ev in events
        if ev.get("ph") == "M" and ev.get("name") == "process_name"
        and "device:" in str(ev.get("args", {}).get("name", ""))
    }
    top = max((ev.get("dur", 0) for ev in events
               if ev.get("ph") == "X" and ev.get("pid") in dev_pids), default=0)
    print(f"{name}: {top/1e3:.3f} ms", flush=True)
    return out


key = jax.random.PRNGKey(time.time_ns() % (2**31))
kx, kn, kc = jax.random.split(key, 3)
x = jax.random.normal(kx, (B, N, 3), jnp.float32) * 0.5
nrm = jax.random.normal(kn, (B, N, 3), jnp.float32)
nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
ct = jax.random.normal(kc, (B, N), jnp.float32)


def kappa_gather(x, nrm):
    res = ops.knn_points(x, x, k=K + 1)
    nn_pts = res.nbrs[:, :, 1:, :]
    v = nn_pts - x[:, :, None, :]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return jnp.abs(jnp.sum(v * nrm[:, :, None, :], axis=-1)).mean(axis=-1)


def _kappa_masked_from_t(x, nrm, t):
    """Masked kappa given a per-point squared-distance threshold t [b, n].

    Exact iff t is the (K+1)-th smallest squared distance (self included)
    and distances below t are unique. The diagonal is excluded EXPLICITLY:
    g[p,p] is only roundoff-zero (difference of large einsums) while
    D[p,p] == 0, so |g|/sqrt(D) on the diagonal is garbage, and sqrt has no
    gradient at 0 — both are fixed by where-ing D before the sqrt.
    """
    D = pairwise_sqdist(x, x)  # [b, n(p), n(j)]
    n = x.shape[1]
    offdiag = ~jnp.eye(n, dtype=bool)
    mask = jax.lax.stop_gradient(
        ((D <= t[..., None]) & offdiag).astype(x.dtype)
    )
    # g[p, j] = <x_j - x_p, n_p>
    g = jnp.einsum("bjd,bpd->bpj", x, nrm) - jnp.sum(x * nrm, -1)[..., None]
    safe_D = jnp.where(offdiag & (D > 1e-24), D, 1.0)
    c = jnp.abs(g) * jax.lax.rsqrt(safe_D)
    return jnp.sum(mask * c, axis=-1) / K


def kappa_masked(x, nrm):
    t = jax.lax.stop_gradient(
        jax.lax.approx_min_k(
            pairwise_sqdist(x, x), K + 1, recall_target=1.0
        )[0][..., -1]
    )
    return _kappa_masked_from_t(x, nrm, t)


def kappa_masked_pallas_t(x, nrm):
    """Threshold from the Pallas kNN kernel's k-th distance; masked math."""
    t = jax.lax.stop_gradient(
        ops.knn_points(x, x, k=K + 1).dists[..., -1]
    )
    return _kappa_masked_from_t(x, nrm, t)


def knn_fwd_only(x):
    return ops.knn_points(x, x, k=K + 1).dists


def fwd_bwd(kfn):
    def f(x, nrm, ct):
        def loss(x):
            return jnp.sum(kfn(x, nrm) * ct)
        val, g = jax.value_and_grad(loss)(x)
        return val, g
    return f


VARIANTS = {
    "pairwise_D_only": lambda: timed(
        "pairwise_D_only", lambda x: pairwise_sqdist(x, x), x),
    "approx_min_k_thresh": lambda: timed(
        "approx_min_k_thresh", lambda x: jax.lax.approx_min_k(
            pairwise_sqdist(x, x), K + 1, recall_target=1.0)[0][..., -1], x),
    "topk_thresh": lambda: timed(
        "topk_thresh", lambda x: -jax.lax.top_k(
            -pairwise_sqdist(x, x), K + 1)[0][..., -1], x),
    "gather_fwd_bwd": lambda: timed(
        "gather_fwd_bwd", fwd_bwd(kappa_gather), x, nrm, ct),
    "masked_fwd_bwd": lambda: timed(
        "masked_fwd_bwd", fwd_bwd(kappa_masked), x, nrm, ct),
    "masked_pallas_t_fwd_bwd": lambda: timed(
        "masked_pallas_t_fwd_bwd", fwd_bwd(kappa_masked_pallas_t),
        x, nrm, ct),
    "knn_fwd_only": lambda: timed("knn_fwd_only", knn_fwd_only, x),
}

names = sys.argv[1:] or list(VARIANTS)
outs = {}
for name in names:
    outs[name] = VARIANTS[name]()
if "gather_fwd_bwd" in outs:
    o1 = outs["gather_fwd_bwd"]
    for other in ("masked_fwd_bwd", "masked_pallas_t_fwd_bwd"):
        if other in outs:
            o2 = outs[other]
            print(f"{other} vs gather — kappa-loss diff:",
                  float(jnp.abs(o1[0] - o2[0]).max()),
                  "grad max diff:", float(jnp.abs(o1[1] - o2[1]).max()),
                  flush=True)
print("KAPPA BENCH DONE", flush=True)
