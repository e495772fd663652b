"""Real-TPU accuracy check: fused pool path vs unfused, both against a
matmul-precision-HIGHEST oracle.

On TPU the unfused XLA path lowers f32 dots to bf16 by default, so
fused-vs-unfused diffs conflate kernel error with baseline error. This
measures each against the HIGHEST-precision unfused forward: the fused
path passes if its error is no worse than ~2x the default unfused path's.
Max-pool tie flips (different rounding -> different argmax winners) make
grad comparisons noisy at isolated points; we report the 99.9th percentile
as the robust metric alongside the max."""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from geoa3_tpu.models.pointnet import PointNet
from geoa3_tpu.models.pointnetpp import PointNet2ClassificationSSG

def logits_and_grad(model, variables, pc):
    def f(p):
        return model.apply(variables, p, train=False)
    lg = f(pc)
    g = jax.grad(lambda p: jnp.sum(f(p) ** 2))(pc)
    return np.asarray(lg), np.asarray(g)

def err(a, b, scale):
    d = np.abs(a - b)
    return d.max() / scale, np.percentile(d, 99.9) / scale

def run(model, name, b, n):
    rng = np.random.RandomState(0)
    pc = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pc, train=False)
    os.environ["GEOA3_DISABLE_PALLAS"] = "pool,groupmlp"
    with jax.default_matmul_precision("highest"):
        lo, go = logits_and_grad(model, variables, pc)
    lu, gu = logits_and_grad(model, variables, pc)
    os.environ.pop("GEOA3_DISABLE_PALLAS", None)
    lf, gf = logits_and_grad(model, variables, pc)
    ls, gs = np.abs(lo).max(), np.abs(go).max()
    for tag, l, g in (("unfused-default", lu, gu), ("fused", lf, gf)):
        lm, lp = err(l, lo, ls)
        gm, gp = err(g, go, gs)
        print(f"{name} {tag}: logits max/p999 = {lm:.2e}/{lp:.2e} "
              f"grad max/p999 = {gm:.2e}/{gp:.2e}", flush=True)
    fl, _ = err(lf, lo, ls)
    ul, _ = err(lu, lo, ls)
    _, fgp = err(gf, go, gs)
    _, ugp = err(gu, go, gs)
    assert fl <= 2 * ul + 1e-4 and fgp <= 2 * ugp + 1e-4, (name, fl, ul, fgp, ugp)

run(PointNet(classes=40, npoint=1024), "PointNet b=25 n=1024", 25, 1024)
run(PointNet2ClassificationSSG(classes=40), "PN++SSG b=16 n=1024", 16, 1024)
print("POOL FUSED TPU PARITY OK", flush=True)
