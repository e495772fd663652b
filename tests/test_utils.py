"""Tests for meters, records, naming, and profiling utilities."""

import os

import numpy as np
import scipy.io as sio

from geoa3_tpu.attack.config import AttackConfig
from geoa3_tpu.utils import (
    AverageMeter,
    ConvergeIterRecorder,
    LossIterRecorder,
    attack_exp_dirname,
    format_time,
    natural_sort,
)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.count == 3
    assert abs(m.avg - 2.0) < 1e-9
    m.reset()
    assert m.count == 0


def test_format_time():
    assert format_time(0.0005) == "0ms"
    assert format_time(65) == "1m5s"
    assert format_time(3600 * 25 + 60) == "1D1h"


def test_natural_sort():
    assert natural_sort(["a10", "a2", "a1"]) == ["a1", "a2", "a10"]


def test_attack_exp_dirname_contract():
    """The directory naming is public API (defense consumes it) —
    reference main_attack.py:36-83."""
    cfg = AttackConfig(
        arch="PointNet", npoint=1024, attack_label="All",
        binary_max_steps=10, iter_max_steps=500, optim="adam", lr=0.01,
        initial_const=10, cls_loss_type="CE", dis_loss_type="CD",
        dis_loss_weight=1.0, hd_loss_weight=0.1, curv_loss_weight=1.0,
        curv_loss_knn=16,
    )
    d = attack_exp_dirname(cfg, attack="GeoA3", run_id=0)
    assert d == (
        "Exps/PointNet_npoint1024/All/GeoA3_0_BiStep10_IterStep500_Optadam"
        "_Lr0.01_Initcons10_CE_CDLoss1.0_HDLoss0.1_CurLoss1.0_k16"
    )
    # optional suffixes
    cfg2 = AttackConfig(
        arch="PointNet", attack_label="Untarget", hd_loss_weight=0.0,
        curv_loss_weight=0.0, is_use_lr_scheduler=True, is_pro_grad=True,
        is_real_offset=True, cc_linf=0.1,
    )
    d2 = attack_exp_dirname(cfg2, attack="GeoA3", run_id=3)
    assert "_LRExp" in d2 and "_ProGradRO" in d2 and "_cclinf0.1" in d2
    assert "HDLoss" not in d2 and "CurLoss" not in d2
    # eval mode
    d3 = attack_exp_dirname(cfg2, attack=None, run_id=1)
    assert d3.endswith("Evaluating_1")


def test_converge_iter_recorder(tmp_path):
    rec = ConvergeIterRecorder(str(tmp_path))
    rec.record([3, -1, 7, 12])
    rec.record([5])
    rec.save()
    data = sio.loadmat(str(tmp_path / "converge_iter.mat"))
    assert sorted(data["attack_step_list"].reshape(-1).tolist()) == [3, 5, 7, 12]
    rec.plot()  # smoke (matplotlib optional)


def test_loss_iter_recorder(tmp_path, rng):
    rec = LossIterRecorder(str(tmp_path))
    rec.record(rng.randn(20, 4))
    rec.record(rng.randn(20, 2))
    rec.save()
    data = sio.loadmat(str(tmp_path / "loss_iter.mat"))
    assert data["loss"].shape == (20, 6)
    rec.plot()
    assert os.path.isfile(str(tmp_path / "loss_iter.png")) or True


def test_profiling_helpers():
    import jax.numpy as jnp

    from geoa3_tpu.utils.profiling import annotate, debug_nans, timed

    with annotate("test-region"):
        pass
    with debug_nans(False):
        pass
    out, dt = timed(lambda x: jnp.asarray(x) * 2, 21.0)
    assert float(out) == 42.0 and dt >= 0
