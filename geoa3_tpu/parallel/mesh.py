"""Device mesh + sharding for attack and training.

The reference's only parallelism is single-process DataParallel
(reference main_train.py:184-185); attack/defense are single-GPU. The
TPU-native equivalent (SURVEY §2.3): one `jax.sharding.Mesh` with
  * a `data` axis — attack batch (instances x targets) / train batch sharded
    across chips; gradient and metric reductions ride ICI as XLA-inserted
    psums;
  * an optional `model` axis — tensor-parallel sharding of the wide victim
    layers (>=512 output features) for headroom on big victims, replicated
    otherwise.

Everything here is GSPMD: annotate shardings, jit, let XLA place collectives.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data * n_model} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with their leading (batch) dim sharded over 'data'."""
    out = tuple(
        jax.device_put(a, NamedSharding(mesh, P("data")))
        for a in arrays
    )
    return out if len(out) > 1 else out[0]


# alias with the attack-centric name used in docs
shard_attack_batch = shard_batch


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. victim params) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def _param_spec(path_leaf_shape, min_tp_dim: int = 512) -> P:
    """TP rule: shard the last (output-features) dim of wide kernels."""
    shape = path_leaf_shape
    if len(shape) >= 2 and shape[-1] >= min_tp_dim:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_shardings(mesh: Mesh, params, tensor_parallel: bool = False):
    """A NamedSharding pytree for victim params (TP over 'model' if asked)."""
    if not tensor_parallel:
        return jax.tree.map(lambda x: NamedSharding(mesh, P()), params)
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _param_spec(np.shape(x))), params
    )


def make_sharded_attack_fn(
    logits_fn: Callable, cfg, mesh: Mesh, eval_logits_fn: Callable = None
) -> Callable:
    """Jit the attack program with the batch sharded over the mesh data axis.

    The attack is embarrassingly parallel over (instances x targets); the only
    cross-chip communication is the scalar loss mean inside the Adam step
    (one psum per step over ICI). The batch size must divide by the data-axis
    size.
    """
    from geoa3_tpu.attack.engine import make_attack_fn

    fn = make_attack_fn(logits_fn, cfg, eval_logits_fn=eval_logits_fn)
    batch = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(batch, batch, batch, batch, rep),
        out_shardings=None,
    )


def make_sharded_train_step(
    cfg, mesh: Mesh, tensor_parallel: bool = False
) -> Callable:
    """Jit the training step with dp (batch over 'data') + optional tp
    (wide kernels over 'model'). Gradients all-reduce over ICI via GSPMD."""
    from geoa3_tpu.train import TrainState, make_train_step

    step = make_train_step(cfg)
    batch = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def place(state: TrainState) -> TrainState:
        pspec = param_shardings(mesh, state.params, tensor_parallel)
        params = jax.tree.map(jax.device_put, state.params, pspec)
        # optimizer moments shard like their params
        opt_state = jax.tree.map(
            lambda x: jax.device_put(
                x,
                NamedSharding(mesh, _param_spec(np.shape(x)))
                if tensor_parallel and hasattr(x, "shape") and np.ndim(x) >= 2
                else NamedSharding(mesh, P()),
            ),
            state.opt_state,
        )
        stats = replicate(mesh, state.batch_stats)
        return TrainState(params, stats, opt_state, jax.device_put(state.step, rep))

    def sharded_step(state, pc, target, rng):
        pc, target = shard_batch(mesh, pc, target)
        return step(state, pc, target, rng)

    return sharded_step, place
