"""Multi-chip tests on the virtual 8-device CPU mesh.

Validate that (a) the sharded attack program compiles + runs with the batch
split over the data axis and matches the single-device result, and (b) the
dp(+tp) training step runs over a real Mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoa3_tpu import parallel
from geoa3_tpu.attack import AttackConfig
from geoa3_tpu.attack.engine import make_attack_fn


def _victim(seed=0, classes=8, scale=2.0):
    W = jax.random.normal(jax.random.PRNGKey(seed), (3, classes))

    def logits_fn(pc):
        return scale * jnp.max(jnp.einsum("bnd,dc->bnc", pc, W), axis=1)

    return logits_fn


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = parallel.make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = parallel.make_mesh(n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_attack_matches_single_device(rng):
    logits_fn = _victim()
    b, n = 8, 32
    pc = rng.randn(b, n, 3).astype(np.float32) * 0.3
    normal = rng.randn(b, n, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    gt = np.argmax(np.asarray(logits_fn(jnp.asarray(pc))), -1).astype(np.int32)
    cfg = AttackConfig(
        attack_label="Untarget",
        classes=8,
        npoint=n,
        binary_max_steps=1,
        iter_max_steps=10,
        curv_loss_knn=4,
    )
    key = jax.random.PRNGKey(0)

    single = make_attack_fn(logits_fn, cfg)(
        jnp.asarray(pc), jnp.asarray(normal), jnp.asarray(gt), jnp.asarray(gt), key
    )

    mesh = parallel.make_mesh()
    sharded_fn = parallel.make_sharded_attack_fn(logits_fn, cfg, mesh)
    spc, snormal, sgt, _ = parallel.shard_batch(
        mesh, pc, normal, gt, gt.copy()
    )
    sharded = sharded_fn(spc, snormal, sgt, sgt, key)

    # identical program, identical RNG -> results must agree across shardings
    np.testing.assert_allclose(
        np.asarray(single.best_loss), np.asarray(sharded.best_loss), rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(single.success), np.asarray(sharded.success)
    )
    np.testing.assert_allclose(
        np.asarray(single.best_attack),
        np.asarray(sharded.best_attack),
        atol=1e-4,
    )


def test_sharded_attack_with_separate_eval_fn(rng):
    """The bf16-mode eval split (grad victim != success judge) must also
    compile and judge correctly through the sharded path."""
    grad_fn = _victim(seed=0)
    judge_fn = _victim(seed=0, scale=2.5)  # same argmax, different scale
    b, n = 8, 32
    pc = rng.randn(b, n, 3).astype(np.float32) * 0.3
    normal = rng.randn(b, n, 3).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    gt = np.argmax(np.asarray(grad_fn(jnp.asarray(pc))), -1).astype(np.int32)
    cfg = AttackConfig(
        attack_label="Untarget", classes=8, npoint=n,
        binary_max_steps=1, iter_max_steps=10, curv_loss_knn=4,
    )
    mesh = parallel.make_mesh()
    fn = parallel.make_sharded_attack_fn(
        grad_fn, cfg, mesh, eval_logits_fn=judge_fn
    )
    spc, snormal, sgt, _ = parallel.shard_batch(mesh, pc, normal, gt, gt.copy())
    res = fn(spc, snormal, sgt, sgt, jax.random.PRNGKey(0))
    # judged by judge_fn: every recorded success must hold under it
    preds = np.argmax(
        np.asarray(judge_fn(res.best_attack)), -1
    )
    succ = np.asarray(res.success)
    assert (preds[succ] != gt[succ]).all()


@pytest.mark.parametrize("tp", [False, True])
def test_sharded_train_step(tp, rng):
    from geoa3_tpu.train import TrainConfig, init_state

    cfg = TrainConfig(arch="PointNet", classes=4, npoint=32, batch_size=8)
    state = init_state(cfg, jax.random.PRNGKey(0))
    mesh = parallel.make_mesh(n_model=2) if tp else parallel.make_mesh()
    step, place = parallel.make_sharded_train_step(cfg, mesh, tensor_parallel=tp)
    state = place(state)
    pc = rng.randn(8, 32, 3).astype(np.float32)
    tgt = np.arange(8) % 4
    new_state, metrics = step(
        state, jnp.asarray(pc), jnp.asarray(tgt), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    if tp:
        # wide kernels really sharded over the model axis
        k = new_state.params["conv5"]["kernel"]  # [3, 128, 1024]
        shard_shape = k.sharding.shard_shape(k.shape)
        assert shard_shape[-1] == 512  # 1024 / 2


def test_replicate_params(rng):
    mesh = parallel.make_mesh()
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = parallel.replicate(mesh, tree)
    assert rep["w"].sharding.is_fully_replicated


def test_bench_mesh_harness():
    """bench.py --mesh N measures the sharded attack program and reports
    scaling efficiency; smoked here on the virtual 8-CPU mesh so the real
    v5e-8 run is one command the day the hardware exists."""
    import sys

    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.pop(0)

    out = bench.run_mesh(8, batch_per_chip=2, steps=8, npoint=64)
    assert out["metric"] == "attacks_per_sec_scaling"
    assert out["mesh"] == 8
    assert out["value"] > 0
    assert out["virtual"] is True  # CPU smoke, not an ICI measurement
    assert "scaling_efficiency" in out
    # FLOOR (catches collective regressions on CPU): the sharded program's
    # total device work must stay comparable to N independent copies —
    # an accidental per-step full-batch all-gather would crater this.
    # (Wall-clock scaling_efficiency is meaningless on the virtual mesh:
    # this host has ONE core, so the 8 virtual devices serialize; measured
    # work_efficiency here is ~1.1-2.2 across trials, floor set well below.)
    assert out["work_efficiency"] > 0.5, out
