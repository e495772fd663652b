"""Checkpoint save/load (rebuild of reference main_train.py:107-110,167-178
and Lib/utility.py:579-639).

Uses flax msgpack serialisation (single-file, dependency-light, works on any
backend); layout mirrors the reference: `checkpoint.msgpack` every epoch plus
a `model_best.msgpack` copy (reference writes checkpoint.pth.tar /
model_best.pth.tar).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

CKPT_NAME = "checkpoint.msgpack"
BEST_NAME = "model_best.msgpack"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def restore_into(target, state_dict):
    """Restore a loaded checkpoint dict into a typed pytree (e.g. optax state)."""
    return serialization.from_state_dict(target, state_dict)


def save_checkpoint(
    modeldir: str, state: Dict[str, Any], is_best: bool, filename: str = CKPT_NAME
) -> str:
    """Save epoch state; copy to model_best on improvement (reference :107-110)."""
    os.makedirs(modeldir, exist_ok=True)
    path = os.path.join(modeldir, filename)
    # to_state_dict turns tuples/namedtuples (optax states) into msgpack-able dicts
    payload = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_host(state))
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    if is_best:
        shutil.copyfile(path, os.path.join(modeldir, BEST_NAME))
    return path


def load_checkpoint(
    path_or_dir: str, best: bool = False
) -> Optional[Dict[str, Any]]:
    """Load a checkpoint file or the dir's checkpoint/model_best
    (reference main_train.py:167-178)."""
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, BEST_NAME if best else CKPT_NAME)
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_victim_variables(path_or_dir: str, arch: str = "PointNet") -> dict:
    """Load victim weights for attack/defense from either a native msgpack
    checkpoint or a reference torch `.pth.tar` (auto-converted).

    Mirrors the reference victim-loading contract
    (main_attack.py:133-147, defense.py:69-82).
    """
    if os.path.isdir(path_or_dir):
        for cand in (BEST_NAME, CKPT_NAME, "model_best.pth.tar",
                     "checkpoint.pth.tar"):
            p = os.path.join(path_or_dir, cand)
            if os.path.isfile(p):
                path_or_dir = p
                break
    path = path_or_dir
    if not os.path.isfile(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    if path.endswith((".pth.tar", ".pth", ".pt", ".tar")):
        from geoa3_tpu.models.convert import (
            convert_pointnet_state_dict,
            convert_pointnetpp_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        if arch == "PointNet":
            return convert_pointnet_state_dict(sd)
        return convert_pointnetpp_state_dict(sd)
    state = load_checkpoint(path)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}
