"""TPU numeric check for the fused kappa kernel: forward values and input
gradients vs the composed path (knn_points -> normalize -> abs-dot-mean),
both running on the real TPU. Interpret-mode tests can't catch Mosaic
codegen issues; this can. Expected agreement: ~1e-3 relative (expansion-vs-
direct norm + lane-order mean, see kappa_kernel.py docstring)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from geoa3_tpu import ops
from geoa3_tpu.ops.pallas.kappa_kernel import kappa_pallas


def composed(cloud, nrm, k):
    res = ops.knn_points(cloud, cloud, k=k + 1)
    nn_pts = res.nbrs[:, :, 1:, :]
    v = nn_pts - cloud[:, :, None, :]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return jnp.abs(jnp.sum(v * nrm[:, :, None, :], axis=-1)).mean(axis=-1)


rng = np.random.RandomState(int(time.time()) % 10000)
b, n, k = 8, 1024, 16
cloud = rng.randn(b, n, 3).astype(np.float32)
cloud /= np.abs(cloud).max()
nrm = rng.randn(b, n, 3).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
cloud, nrm = jnp.asarray(cloud), jnp.asarray(nrm)
w = jnp.asarray(rng.randn(b, n).astype(np.float32))

f_kernel = jax.jit(lambda c: jnp.sum(kappa_pallas(c, nrm, k, 256) * w))
f_comp = jax.jit(lambda c: jnp.sum(composed(c, nrm, k) * w))

kv, gk = jax.value_and_grad(f_kernel)(cloud)
cv, gc = jax.value_and_grad(f_comp)(cloud)
kv, gk, cv, gc = map(np.asarray, (kv, gk, cv, gc))

kap_k = np.asarray(jax.jit(lambda c: kappa_pallas(c, nrm, k, 256))(cloud))
kap_c = np.asarray(jax.jit(lambda c: composed(c, nrm, k))(cloud))

rel = np.abs(kap_k - kap_c) / np.maximum(np.abs(kap_c), 1e-6)
grel = np.abs(gk - gc) / np.maximum(np.abs(gc).max(), 1e-6)
print(f"kappa: max rel diff {rel.max():.2e} (mean {rel.mean():.2e})")
print(f"loss:  kernel {kv:.6f} composed {cv:.6f}")
print(f"grad:  max diff/|g|max {grel.max():.2e}; "
      f"|g| ranges kernel [{np.abs(gk).min():.2e}, {np.abs(gk).max():.2e}] "
      f"composed [{np.abs(gc).min():.2e}, {np.abs(gc).max():.2e}]")
ok = rel.max() < 5e-3 and grel.max() < 5e-3
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
