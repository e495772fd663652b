"""TPU smoke for the fully-fused SA kernel: Mosaic-compile the SSG and MSG
victims' fused eval forward + input grad at production shapes and compare
against the previous path (GEOA3_DISABLE_PALLAS=safused) run in a child
process. Usage: python runs/check_sa_fused_tpu.py [arch]"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

ARCH = sys.argv[1] if len(sys.argv) > 1 else "PointNetPP"

from geoa3_tpu.models.registry import build_model  # noqa: E402

model = build_model(ARCH, 40, 1024)
rng = np.random.RandomState(0)
pc = jnp.asarray(rng.randn(2, 1024, 3).astype(np.float32) * 0.5)
variables = model.init({"params": jax.random.PRNGKey(0)}, pc, train=False)


@jax.jit
def fwd(p):
    return model.apply(variables, p, train=False)


@jax.jit
def grad(p):
    return jax.grad(lambda q: jnp.sum(fwd(q) ** 2))(p)


t0 = time.time()
logits = np.asarray(fwd(pc))
g = np.asarray(grad(pc))
print(f"[{ARCH}] fused fwd+grad OK in {time.time()-t0:.1f}s "
      f"logits[0,:3]={logits[0, :3]} |g|={np.abs(g).sum():.4f}", flush=True)
assert np.abs(g).sum() > 0, "zero grad through fused path"

if os.environ.get("GEOA3_SA_CHECK_CHILD"):
    np.save("/tmp/sa_check_ref.npy", logits)
    np.save("/tmp/sa_check_ref_g.npy", g)
    sys.exit(0)

env = dict(os.environ)
env["GEOA3_DISABLE_PALLAS"] = "safused"
env["GEOA3_SA_CHECK_CHILD"] = "1"
subprocess.run([sys.executable, __file__, ARCH], env=env, check=True)
ref = np.load("/tmp/sa_check_ref.npy")
ref_g = np.load("/tmp/sa_check_ref_g.npy")
dl = np.abs(logits - ref).max()
dg = np.abs(g - ref_g).max() / (np.abs(ref_g).max() + 1e-12)
print(f"[{ARCH}] fused-vs-previous: max |dlogits| {dl:.2e}, "
      f"rel max |dgrad| {dg:.2e}", flush=True)
