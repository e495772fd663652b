"""Training-loop tests: a tiny PointNet must learn synthetic shapes, and the
checkpoint/resume machinery must round-trip."""

import numpy as np
import pytest

import jax

from geoa3_tpu.data.modelnet_train import SyntheticTrainDataset
from geoa3_tpu.train import (
    TrainConfig,
    bn_momentum_for_epoch,
    evaluate,
    init_state,
    lr_for_epoch,
    make_train_step,
    smoothing_cross_entropy,
    train,
)
from geoa3_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_lr_schedule():
    # reference: lr * 0.7^(epoch//20), floor 1e-5 (main_train.py:112-116)
    assert lr_for_epoch(1e-3, 0) == 1e-3
    assert lr_for_epoch(1e-3, 19) == 1e-3
    assert abs(lr_for_epoch(1e-3, 20) - 7e-4) < 1e-12
    assert lr_for_epoch(1e-3, 2000) == 1e-5


def test_bn_momentum_schedule():
    assert bn_momentum_for_epoch(0.5, 0) == 0.5
    assert bn_momentum_for_epoch(0.5, 20) == 0.25
    assert bn_momentum_for_epoch(0.5, 2000) == 0.01


def test_smoothing_ce_matches_manual(rng):
    import jax.numpy as jnp

    logits = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    target = jnp.asarray([0, 1, 2, 3])
    got = float(smoothing_cross_entropy(logits, target, 5, 0.2))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=1))
    onehot = np.eye(5)[np.asarray(target)] * 0.8 + 0.2 / 5
    want = float((-onehot * lp).sum(1).mean())
    assert abs(got - want) < 1e-5


@pytest.mark.slow
def test_pointnet_learns_synthetic_shapes(tmp_path):
    cfg = TrainConfig(
        arch="PointNet",
        classes=4,
        npoint=64,
        batch_size=16,
        epochs=4,
        lr=1e-3,
        seed=0,
    )
    train_ds = SyntheticTrainDataset(
        num_per_class=24, classes=4, batch_size=16, npoints=64, seed=0
    )
    test_ds = SyntheticTrainDataset(
        num_per_class=8, classes=4, batch_size=16, npoints=64, split="test", seed=0
    )
    state, result = train(
        cfg, train_ds, test_ds, modeldir=str(tmp_path), log=lambda s: None
    )
    assert result["best_prec"] > 60.0  # 4 easy classes, random = 25%
    # result.txt written with the reference line structure
    lines = open(tmp_path / "result.txt").read().strip().splitlines()
    assert len(lines) == 4
    assert "train-acc" in lines[0] and "test:" in lines[0]
    # checkpoints exist and restore
    ckpt = load_checkpoint(str(tmp_path))
    assert ckpt is not None and ckpt["epoch"] == 4
    best = load_checkpoint(str(tmp_path), best=True)
    assert best is not None


def test_train_step_updates_params():
    cfg = TrainConfig(arch="PointNet", classes=4, npoint=32, batch_size=4, epochs=1)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, epoch=1)
    pc = np.random.RandomState(0).randn(4, 32, 3).astype(np.float32)
    tgt = np.asarray([0, 1, 2, 3])
    import jax.numpy as jnp

    new_state, metrics = step(
        state, jnp.asarray(pc), jnp.asarray(tgt), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params moved and batch_stats updated
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
        state.params,
        new_state.params,
    )
    assert sum(jax.tree.leaves(diff)) > 0
    sdiff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
        state.batch_stats,
        new_state.batch_stats,
    )
    assert sum(jax.tree.leaves(sdiff)) > 0


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "epoch": 3,
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "best_prec": 91.5,
    }
    save_checkpoint(str(tmp_path), tree, is_best=True)
    back = load_checkpoint(str(tmp_path))
    assert back["epoch"] == 3
    np.testing.assert_allclose(back["params"]["w"], tree["params"]["w"])
    best = load_checkpoint(str(tmp_path), best=True)
    assert abs(best["best_prec"] - 91.5) < 1e-9


def test_torch_checkpoint_loading_via_victim_loader(tmp_path):
    """load_victim_variables converts a torch .pth.tar transparently."""
    torch = pytest.importorskip("torch")
    import sys
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, "/root/reference/Model")
    try:
        from PointNet import PointNet as TorchPointNet
    except ImportError:
        pytest.skip("reference model not importable")
    net = TorchPointNet(40, npoint=1024)
    path = str(tmp_path / "model_best.pth.tar")
    torch.save({"state_dict": net.state_dict(), "epoch": 1}, path)

    from geoa3_tpu.utils.checkpoint import load_victim_variables

    variables = load_victim_variables(str(tmp_path), arch="PointNet")
    assert "params" in variables and "batch_stats" in variables


@pytest.mark.slow
def test_resume_continues_training(tmp_path):
    """--resume restores epoch/best and continues (reference :167-178)."""
    import jax.numpy as jnp

    cfg = TrainConfig(arch="PointNet", classes=4, npoint=32, batch_size=8, epochs=2)
    ds = SyntheticTrainDataset(num_per_class=8, classes=4, batch_size=8, npoints=32)
    ds_test = SyntheticTrainDataset(
        num_per_class=4, classes=4, batch_size=8, npoints=32, split="test"
    )
    state1, _ = train(cfg, ds, ds_test, modeldir=str(tmp_path), log=lambda s: None)
    cfg3 = TrainConfig(arch="PointNet", classes=4, npoint=32, batch_size=8, epochs=3)
    logs = []
    state2, _ = train(
        cfg3, ds, ds_test, modeldir=str(tmp_path), log=logs.append,
        resume=str(tmp_path),
    )
    assert any("loaded checkpoint" in l for l in logs)
    # only epoch 3 ran after resume
    assert sum("epoch [" in l for l in logs) == 1
    ckpt = load_checkpoint(str(tmp_path))
    assert ckpt["epoch"] == 3


@pytest.mark.slow
def test_epoch_retry_on_transient_failure(tmp_path, monkeypatch):
    """A mid-epoch device failure is retried from the last good host snapshot
    (TPU-worker-restart resilience; the attack CLI has the same guard
    per batch)."""
    import geoa3_tpu.train as T

    cfg = TrainConfig(arch="PointNet", classes=4, npoint=32, batch_size=8, epochs=3)
    ds = SyntheticTrainDataset(num_per_class=8, classes=4, batch_size=8, npoints=32)
    ds_test = SyntheticTrainDataset(
        num_per_class=4, classes=4, batch_size=8, npoints=32, split="test"
    )

    real_make = T.make_train_step
    # the step fn is cached across epochs with unchanged lr/BN momentum, so
    # inject by call count: fail twice starting mid-epoch-2 (4 batches/epoch)
    calls = {"n": 0}
    boom = {"armed": 2}

    def flaky_make(cfg_, epoch):
        step = real_make(cfg_, epoch)

        def wrapped(state, pc, target, rng):
            calls["n"] += 1
            if calls["n"] >= 6 and boom["armed"] > 0:
                boom["armed"] -= 1
                raise RuntimeError("injected transient device failure")
            return step(state, pc, target, rng)

        return wrapped

    monkeypatch.setattr(T, "make_train_step", flaky_make)
    logs = []
    state, result = T.train(
        cfg, ds, ds_test, modeldir=str(tmp_path), log=logs.append
    )
    warns = [l for l in logs if "retrying from last good state" in l]
    assert len(warns) == 2
    # all three epochs completed despite the two injected failures
    assert sum("epoch [" in l for l in logs) == 3
    ckpt = load_checkpoint(str(tmp_path))
    assert ckpt["epoch"] == 3


def test_epoch_retry_exhaustion_raises(tmp_path, monkeypatch):
    import geoa3_tpu.train as T

    cfg = TrainConfig(
        arch="PointNet", classes=4, npoint=32, batch_size=8, epochs=2,
        max_epoch_retries=1,
    )
    ds = SyntheticTrainDataset(num_per_class=8, classes=4, batch_size=8, npoints=32)
    ds_test = SyntheticTrainDataset(
        num_per_class=4, classes=4, batch_size=8, npoints=32, split="test"
    )

    def always_fail(cfg_, epoch):
        def wrapped(state, pc, target, rng):
            raise RuntimeError("permanent failure")

        return wrapped

    monkeypatch.setattr(T, "make_train_step", always_fail)
    with pytest.raises(RuntimeError, match="permanent failure"):
        T.train(cfg, ds, ds_test, modeldir=str(tmp_path), log=lambda s: None)
