"""PyTorch checkpoint -> JAX parameter conversion.

The reference ships victims trained with torch and loads
`Pretrained/{arch}/{npoint}/model_best.pth.tar` (reference: main_attack.py:134,
main_train.py:107-110). This module maps those state_dicts onto the flax
parameter pytrees of geoa3_tpu.models so torch-trained weights run unchanged
on TPU. Conversion is pure numpy — torch is only needed to unpickle
`.pth.tar` files (optional import).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray -> np.ndarray (no torch import needed)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference `.pth.tar` checkpoint into a flat numpy state_dict."""
    import torch  # local import: only needed for unpickling

    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    # strip DataParallel "module." prefixes (reference main_train.py:324-331)
    return {k.removeprefix("module."): _np(v) for k, v in state.items()}


def _dense(sd: Mapping[str, np.ndarray], name: str, bias: bool = True) -> dict:
    """torch Linear/Conv1d(k=1) -> flax Dense {kernel [in,out], bias}."""
    w = _np(sd[f"{name}.weight"])
    if w.ndim == 3:  # Conv1d kernel-1: [out, in, 1]
        assert w.shape[-1] == 1, f"{name}: expected 1x1 conv"
        w = w[..., 0]
    elif w.ndim == 4:  # Conv2d 1x1: [out, in, 1, 1]
        assert w.shape[-1] == w.shape[-2] == 1
        w = w[..., 0, 0]
    out = {"kernel": w.T.copy()}
    if bias:
        out["bias"] = _np(sd[f"{name}.bias"]).copy()
    return out


def _conv1d_k(sd: Mapping[str, np.ndarray], name: str) -> dict:
    """torch Conv1d kernel-k [out, in, k] -> flax Conv {kernel [k, in, out], bias}."""
    w = _np(sd[f"{name}.weight"])
    return {
        "kernel": np.transpose(w, (2, 1, 0)).copy(),
        "bias": _np(sd[f"{name}.bias"]).copy(),
    }


def _bn(sd: Mapping[str, np.ndarray], name: str) -> Tuple[dict, dict]:
    """torch BatchNorm -> (flax params {scale,bias}, batch_stats {mean,var})."""
    params = {
        "scale": _np(sd[f"{name}.weight"]).copy(),
        "bias": _np(sd[f"{name}.bias"]).copy(),
    }
    stats = {
        "mean": _np(sd[f"{name}.running_mean"]).copy(),
        "var": _np(sd[f"{name}.running_var"]).copy(),
    }
    return params, stats


def _convert_transform_net(sd: Mapping[str, np.ndarray], prefix: str):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for layer in ("conv1", "conv2", "conv3", "fc1", "fc2", "fc3"):
        params[layer] = _dense(sd, f"{prefix}.{layer}")
    for b in ("bn1", "bn2", "bn3", "bn4", "bn5"):
        params[b], stats[b] = _bn(sd, f"{prefix}.{b}")
    return params, stats


def convert_pointnet_state_dict(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference PointNet state_dict -> flax variables {params, batch_stats}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for tn in ("input_transform", "feature_transform"):
        params[tn], stats[tn] = _convert_transform_net(sd, tn)

    for layer in ("conv1", "conv2", "conv3", "conv4"):
        params[layer] = _dense(sd, layer)
    params["conv5"] = _conv1d_k(sd, "conv5")  # kernel-3 conv (PointNet.py:110)
    for layer in ("fc1", "fc2", "fc3"):
        params[layer] = _dense(sd, layer)
    for b in ("bn1", "bn2", "bn3", "bn4", "bn5", "bn6", "bn7"):
        params[b], stats[b] = _bn(sd, b)

    return {"params": params, "batch_stats": stats}


def convert_pointnetpp_state_dict(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, Any]:
    """Reference PointNet2ClassificationSSG/MSG state_dict -> flax variables.

    torch naming: SA_modules.{i}.mlps.{j}.{3k}/(3k+1) for Conv2d/BN pairs
    (build_shared_mlp interleaves Conv,BN,ReLU — reference
    pointnet2_modules.py:9-19), fc_layer.{0,1,3,4,7} for the head
    (reference PointNetPP_ssg.py:89-98).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # --- SA modules ---
    n_sa = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("SA_modules.")
    )
    for i in range(n_sa):
        sa_p: Dict[str, Any] = {}
        sa_s: Dict[str, Any] = {}
        scales = {
            int(k.split(".")[3])
            for k in sd
            if k.startswith(f"SA_modules.{i}.mlps.")
        }
        for j in sorted(scales):
            mlp_p: Dict[str, Any] = {}
            mlp_s: Dict[str, Any] = {}
            prefix = f"SA_modules.{i}.mlps.{j}"
            layer_ids = sorted(
                {
                    int(k[len(prefix) + 1 :].split(".")[0])
                    for k in sd
                    if k.startswith(prefix + ".")
                }
            )
            convs = [l for l in layer_ids if l % 3 == 0]
            for k_idx, conv_id in enumerate(sorted(convs)):
                mlp_p[f"conv{k_idx}"] = _dense(
                    sd, f"{prefix}.{conv_id}", bias=False
                )
                bn_p, bn_s = _bn(sd, f"{prefix}.{conv_id + 1}")
                mlp_p[f"bn{k_idx}"] = bn_p
                mlp_s[f"bn{k_idx}"] = bn_s
            sa_p[f"mlp{j}"] = mlp_p
            sa_s[f"mlp{j}"] = mlp_s
        params[f"SA{i}"] = sa_p
        stats[f"SA{i}"] = sa_s

    # --- FC head ---
    head_p: Dict[str, Any] = {}
    head_s: Dict[str, Any] = {}
    head_p["fc0"] = _dense(sd, "fc_layer.0", bias=False)
    head_p["bn0"], head_s["bn0"] = _bn(sd, "fc_layer.1")
    head_p["fc1"] = _dense(sd, "fc_layer.3", bias=False)
    head_p["bn1"], head_s["bn1"] = _bn(sd, "fc_layer.4")
    head_p["fc2"] = _dense(sd, "fc_layer.7")
    params["head"] = head_p
    stats["head"] = head_s

    return {"params": params, "batch_stats": stats}
