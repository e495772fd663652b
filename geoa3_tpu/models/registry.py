"""Model registry + eval-closure factory shared by CLI / attack / defense."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from geoa3_tpu.models.pointnet import PointNet
from geoa3_tpu.models.pointnetpp import (
    PointNet2ClassificationMSG,
    PointNet2ClassificationSSG,
)

ARCHS = ("PointNet", "PointNetPP", "PointNetPP_MSG")


def build_model(arch: str, classes: int = 40, npoint: int = 1024):
    """Build a victim module by reference arch name (reference main_attack.py:135-142)."""
    if arch == "PointNet":
        return PointNet(classes=classes, npoint=npoint)
    if arch == "PointNetPP":
        return PointNet2ClassificationSSG(
            use_xyz=True, use_normal=False, classes=classes
        )
    if arch == "PointNetPP_MSG":
        return PointNet2ClassificationMSG(
            use_xyz=True, use_normal=False, classes=classes
        )
    raise ValueError(f"Not support such arch: {arch}")


def init_variables(model, key: jax.Array, n: int = 1024) -> dict:
    """Initialise {params, batch_stats} for a victim on dummy input."""
    dummy = jnp.zeros((1, n, 3), jnp.float32)
    return model.init({"params": key}, dummy, train=False)


def make_eval_fn(
    model, variables: dict, dtype=None, pinned: bool = False
) -> Callable[[jax.Array], jax.Array]:
    """Return logits_fn(pc [b, n, 3]) -> [b, classes] in eval mode.

    BatchNorm running stats are baked in as constants (the attack only ever
    sees the victim in eval mode, reference main_attack.py:146).
    `dtype=jnp.bfloat16` runs the victim matmuls in bf16 (logits returned
    in f32) — EXPERIMENTAL on this backend: XLA:TPU can compile the bf16
    PointNet backward to a zero input gradient at some shapes (see the
    remat note below and RESULTS.md); success must always be judged by the
    f32 victim (engine eval_logits_fn).
    `pinned=True` bakes composed-XLA dispatch into the program
    (ops/dispatch.py) — required wherever the argmax feeds a SELECTION
    decision (attack-set distillation, reference gen_data_mat.py:250-263),
    so the selected set never shifts with the round's kernel defaults.
    """
    if dtype is not None:
        variables = jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            variables,
        )

    def logits_fn(pc: jax.Array) -> jax.Array:
        if dtype is not None:
            pc = pc.astype(dtype)
        if pinned:
            from geoa3_tpu.ops.dispatch import pinned_composed

            with pinned_composed():  # trace-time: pins dispatch decisions
                out = model.apply(variables, pc, train=False)
        else:
            out = model.apply(variables, pc, train=False)
        return out.astype(jnp.float32) if dtype is not None else out

    if dtype is not None and type(model).__name__ == "PointNet":
        # XLA:TPU mislowers the bf16 full-victim backward for PointNet at
        # b>=8: the input gradient compiles to EXACTLY zero (b=4 is fine,
        # every sub-op probed healthy in isolation — a fusion-level codegen
        # bug). jax.checkpoint rematerialises the forward inside the
        # backward, which restructures the fusions around the bug for SOME
        # shapes (grad norm 0.56 vs 0.0 at b=16 x 100 steps) but NOT all
        # (b=25 x 500 steps stays zero) — hence the mode is experimental.
        # Scoped to PointNet: PN++ bf16 gradients were never observed to
        # zero, and remat there costs ~3 ms/step of FPS/ball-query
        # recompute for nothing.
        logits_fn = jax.checkpoint(logits_fn)

    return logits_fn


def bf16_grad_healthcheck(logits_fn: Callable, b: int, n: int) -> bool:
    """True iff d(sum logits)/d(input) is non-zero at shape [b, n, 3].

    Guard for the XLA:TPU bf16 codegen bug (zero input gradient at some
    batch/fusion shapes — see runs/bf16_zero_grad_repro.py and RESULTS.md).
    Run at the CLI's ACTUAL padded batch shape before any bf16 attack; a
    zero gradient means every attack step would be a no-op, so the caller
    must refuse the mode, not warn.
    """
    x = jax.random.normal(jax.random.PRNGKey(17), (b, n, 3), jnp.float32)
    g = jax.jit(jax.grad(lambda p: logits_fn(p).sum()))(x)
    return bool(jnp.max(jnp.abs(g)) > 0)


def make_apply_fn(model) -> Callable[[dict, jax.Array], jax.Array]:
    """Return logits_fn(variables, pc) for cases where params are traced."""

    def logits_fn(variables: dict, pc: jax.Array) -> jax.Array:
        return model.apply(variables, pc, train=False)

    return logits_fn
