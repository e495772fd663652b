"""Analytic FLOP accounting for the fused attack step -> MFU.

The driver's perf north-star is MFU on the headline benchmark
(BASELINE.md:19-23); the reference publishes no throughput numbers, so an
invented wall-clock denominator is not a defensible perf claim — model FLOP
utilisation against the chip's peak is.

Conventions (documented so the number is reproducible):
  * FLOPs = 2 x MACs for every matmul/conv; elementwise/BN/ReLU/pool work is
    NOT counted (it is free beside the MXU terms and inflating MFU with VPU
    flops would be flattery).
  * Backward counts input-gradient matmuls only — the victim is frozen
    (params behind stop_gradient, reference main_attack.py:146 eval mode),
    so no dW matmuls exist in the program.
  * Geometry terms count the ALGORITHMIC minimum matmul work (one [n, n]
    distance expansion each for the dual-1NN and kappa kernels, the payload
    / scatter one-hot contractions at their logical widths) — not the
    kernels' internal precision-split pass counts. A kernel that runs 2x
    passes for exactness gets no MFU credit for the second pass.
  * Peak = bf16 MXU peak of the chip: the victim's f32 dots lower to the
    platform default (single-pass bf16 with f32 accumulate) and the fused
    kernels match it (see ops/pallas/pool_matmul_kernel.platform_f32_exact).

PointNet layer inventory mirrors models/pointnet.py (reference
Model/PointNet.py:96-179): T-Net(3) -> bmm -> conv1/2 -> T-Net(64) -> bmm ->
conv3/4 -> conv5 (kernel-3!) -> pool -> FC head.
"""

from __future__ import annotations

from typing import Optional


def _tnet_macs(n: int, K: int) -> int:
    """TransformNet MACs per instance (models/pointnet.py:130-162)."""
    per_point = K * 64 + 64 * 128 + 128 * 1024
    fc = 1024 * 512 + 512 * 256 + 256 * K * K
    return n * per_point + fc


def pointnet_forward_macs(n: int, classes: int = 40) -> int:
    """Per-instance forward MACs of the 1024-wide PointNet victim."""
    macs = _tnet_macs(n, 3) + n * 3 * 3  # input T-Net + bmm
    macs += n * (3 * 64 + 64 * 64)  # conv1, conv2
    macs += _tnet_macs(n, 64) + n * 64 * 64  # feature T-Net + bmm
    macs += n * (64 * 64 + 64 * 128)  # conv3, conv4
    macs += n * 3 * 128 * 1024  # conv5: kernel-3 conv (reference :110)
    macs += 1024 * 512 + 512 * 256 + 256 * classes  # FC head
    return macs


def pointnet_input_grad_macs(n: int, classes: int = 40) -> int:
    """Per-instance input-gradient MACs (frozen victim: dX terms only).

    Every dense/conv dX = dY W^T costs the same MACs as its forward; the two
    feature bmms additionally produce dT (feat^T dY, n*K^2 each) because the
    transforms are themselves functions of the input.
    """
    return pointnet_forward_macs(n, classes) + n * (3 * 3 + 64 * 64)


def attack_geometry_macs(n: int, k: int = 16) -> int:
    """Per-instance matmul MACs of the fused loss geometry, per step.

    Terms (algorithmic minimum, not kernel pass counts):
      * dual-1NN distance expansion (adv @ ori^T), one [n, n] x 3 matrix
        serving both chamfer directions + hausdorff
        (ops/pallas/nn1_kernel.py)          -> n^2 * 3
      * 8 constant payload planes via one-hot contractions
        (nn1 payload planes)                -> n^2 * 8
      * o2a chamfer gather backward via the one-hot scatter matmul
        (ops/pallas/scatter_kernel.py)      -> n^2 * 3
      * kappa forward distance expansion + masked |(q-p).n| reduction
        (ops/pallas/kappa_kernel.py)        -> n^2 * 3 + n^2 * 3
      * kappa analytic backward: mask-weighted thin matmuls (dA/dp terms)
        (kappa_kernel VJP)                  -> n^2 * 6
    The k-round selection loops are VPU compare/select work — no MFU credit.
    """
    del k  # selection rounds carry no matmul credit
    return n * n * (3 + 8 + 3 + 6 + 6)


def attack_step_flops(batch: int, n: int, k: int = 16, classes: int = 40) -> dict:
    """FLOPs of ONE fused attack inner step at batch x n (see module doc)."""
    fwd = 2 * pointnet_forward_macs(n, classes) * batch
    bwd = 2 * pointnet_input_grad_macs(n, classes) * batch
    geo = 2 * attack_geometry_macs(n, k) * batch
    return {
        "victim_fwd": fwd,
        "victim_bwd": bwd,
        "geometry": geo,
        "total": fwd + bwd + geo,
    }


# bf16 MXU peak per chip by device_kind substring (public spec sheets)
_PEAK_BF16 = (
    ("v5 lite", 197e12),  # v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),  # Trillium
    ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s for a jax device (None when unknown/CPU)."""
    if device is None:
        import jax

        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = str(getattr(device, "device_kind", "")).lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return None


def mfu(ms_per_step: float, batch: int, n: int, k: int = 16,
        peak: Optional[float] = None) -> Optional[dict]:
    """{'tflops', 'mfu', 'peak_tflops'} for a measured step time, or None
    when the chip's peak is unknown (e.g. CPU test runs)."""
    peak = peak if peak is not None else device_peak_flops()
    total = attack_step_flops(batch, n, k)["total"]
    achieved = total / (ms_per_step / 1e3)
    out = {"tflops": round(achieved / 1e12, 2)}
    if peak:
        out["mfu"] = round(achieved / peak, 4)
        out["peak_tflops"] = round(peak / 1e12, 1)
    return out
