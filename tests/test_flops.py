"""Analytic FLOP model (utils/flops.py) vs XLA's own cost analysis.

The MFU number in bench.py is only defensible if the analytic count tracks
what the compiler itself counts for the matmul-bearing parts.
"""

import jax
import jax.numpy as jnp
import pytest

from geoa3_tpu.utils import flops as F


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


@pytest.mark.parametrize("n", [256, 1024])
def test_pointnet_forward_matches_xla(n):
    from geoa3_tpu.models.registry import build_model, make_eval_fn

    b = 2
    model = build_model("PointNet", classes=40, npoint=n)
    var = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, n, 3)), train=False
    )
    lf = make_eval_fn(model, var)
    xla = _xla_flops(lf, jnp.zeros((b, n, 3))) / b
    analytic = 2 * F.pointnet_forward_macs(n)
    # analytic counts matmuls only; XLA adds elementwise/BN work on top
    assert analytic <= xla * 1.005
    assert analytic > 0.95 * xla


def test_pointnet_grad_matches_xla():
    from geoa3_tpu.models.registry import build_model, make_eval_fn

    b, n = 2, 512
    model = build_model("PointNet", classes=40, npoint=n)
    var = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, n, 3)), train=False
    )
    lf = make_eval_fn(model, var)
    xla = _xla_flops(jax.grad(lambda p: lf(p).sum()), jnp.zeros((b, n, 3))) / b
    analytic = 2 * (F.pointnet_forward_macs(n) + F.pointnet_input_grad_macs(n))
    assert 0.90 * xla < analytic <= xla * 1.005


def test_attack_step_flops_structure():
    d = F.attack_step_flops(32, 1024)
    assert d["total"] == d["victim_fwd"] + d["victim_bwd"] + d["geometry"]
    # victim dominates at 1024 points; geometry is the smaller term
    assert d["geometry"] < 0.1 * d["total"]
    # scales linearly in batch
    assert F.attack_step_flops(64, 1024)["total"] == pytest.approx(
        2 * d["total"]
    )


def test_mfu_known_peak():
    out = F.mfu(4.0, 32, 1024, peak=197e12)
    assert out["peak_tflops"] == 197.0
    assert 0 < out["mfu"] < 1
    assert out["tflops"] == pytest.approx(
        F.attack_step_flops(32, 1024)["total"] / 4e-3 / 1e12, rel=0.01
    )


def test_mfu_unknown_peak_reports_tflops_only():
    out = F.mfu(4.0, 32, 1024, peak=0)
    assert "tflops" in out and "mfu" not in out
