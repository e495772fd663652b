"""Standalone reproducer: XLA:TPU zeroes the bf16 PointNet input gradient.

Minimal form of the bug documented in RESULTS.md ("bf16 post-mortem"): the
bf16 victim backward compiles to an EXACTLY-zero input gradient at some
batch shapes (b=4 healthy, b>=8 zero on the v5e used in round 2), while
every sub-op probed healthy in isolation — a fusion-level codegen bug.
f32 at the same shape is always healthy, which is the control.

Run on a TPU backend:  python runs/bf16_zero_grad_repro.py [b ...]
Prints one line per (dtype, batch): max|dL/dx| — any 0.0e+00 under bf16
with a non-zero f32 control is the bug. On CPU both are non-zero.

The shipped guard: geoa3_tpu.models.registry.bf16_grad_healthcheck runs
this exact probe at the attack CLI's padded batch shape and the CLI
refuses --victim_dtype bfloat16 when it trips (cli/main_attack.py).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from geoa3_tpu.models.registry import build_model, init_variables, make_eval_fn

N = 1024
batches = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 25]

model = build_model("PointNet", classes=40, npoint=N)
variables = init_variables(model, jax.random.PRNGKey(0), n=N)
x0 = jax.random.normal(jax.random.PRNGKey(1), (max(batches), N, 3), jnp.float32)

print(f"backend: {jax.default_backend()}", flush=True)
for dtype in (None, jnp.bfloat16):
    fn = make_eval_fn(model, variables, dtype=dtype)
    grad = jax.jit(jax.grad(lambda p: fn(p).sum()))
    for b in batches:
        g = grad(x0[:b])
        name = "bf16" if dtype is not None else "f32 "
        print(f"{name} b={b:3d}  max|dL/dx| = {float(jnp.abs(g).max()):.3e}",
              flush=True)
