"""The GeoA3 attack engine as one compiled XLA program.

TPU-native redesign of reference Attacker/geoA3_attack.py:100-386. The
reference runs 10 binary-search steps x 500 Adam steps as a Python loop with
TWO victim forwards per step (a no-grad eval pass per instance, then a grad
pass) plus host-side best-tracking. Here the whole attack is a single
`lax.scan(binary) o lax.scan(inner)` program:

  * the eval pass and the grad pass share ONE forward (value_and_grad with
    aux logits) whenever jitter/subsampling is off — halving victim FLOPs;
  * best-tracking is a `jnp.where` over carried (best_loss, best_attack,
    best_step) — no host sync inside the 5000-step loop;
  * the batch dimension is (instances x targets), vmappable and shardable
    over a device mesh by the caller (pure function of its inputs).

Documented deviations from reference behaviour (all strictly saner; flagged
here for the parity audit):
  1. Best-tracking uses the CURRENT step's constrain loss; the reference
     reuses the previous iteration's value (geoA3_attack.py:301 reads
     `constrain_loss` computed by the previous `_forward_step`).
  2. The binary-search success test is per-instance "succeeded at least once
     this search step" (iter_best_score != -1); the reference additionally
     ANDs a stale `output_label` from the final step of the LAST instance in
     the batch (geoA3_attack.py:375) — a bug.
  3. RNG is explicit (JAX keys) instead of global torch seeds.
  4. The CLI re-evaluates every saved cloud with the f32 victim and gates
     saving on engine-success AND re-eval success (the reference gates on
     the engine indicator alone, main_attack.py:249-261) — required on a
     backend where the optimised victim may be lower-precision than the
     deployed one. Exception: in subsample mode with eval_num > 1 the
     engine's FPS-ensemble vote is the verdict (a single stochastic CLI
     FPS draw would drop genuinely successful attacks to resampling noise).
  5. On TPU, adv_kappa rides the fused kappa kernel
     (ops/pallas/kappa_kernel.py): the selected neighbour SET is
     bit-identical, but the unit-vector norm comes from the distance
     expansion instead of a direct difference and the mean is a masked lane
     reduction, so the curvature term agrees with the reference composition
     to ~1e-3 relative, not bitwise (loss_utils.py:70-85 semantics
     preserved; e2e success/CD/HD re-certified in RESULTS.md). Off-TPU the
     composed bit-exact path runs.
  6. On TPU, the chamfer/Hausdorff 1-NN argmins default to PACKED
     single-reduction selection (ops/pallas/nn1_kernel.py,
     GEOA3_NN1_SELECT): distance keys quantised to ~2^-13 relative with
     the lane index packed into the truncated mantissa, so near-tie
     nearest neighbours can swap vs the reference's exact argmin
     (loss_utils.py:32-58 semantics). The loss VALUE is recomputed exactly
     from the chosen coordinates; e2e recert measured IDENTICAL quality to
     exact mode (250/250, CD/HD unchanged — RESULTS.md round-4 table) at
     ~3% step-time win. GEOA3_NN1_SELECT=exact restores bit-exact
     selection. (The analogous kappa-packed mode measurably degrades CD/HD
     and stays opt-in: it changes the curvature statistic's membership
     mask, not just a gather index.)
  7. The attack CLI defaults --curv_knn_refresh_every to 10: the curvature
     loss's self-kNN selection is recomputed once per 10 Adam steps and
     held fixed inside the block (the reference re-selects every call,
     loss_utils.py:70-85). On TPU the cached object is the kappa kernel's
     selection MASK and the in-block forward skips the knockout loop
     entirely (~25% of the PointNet step). E2e recertified at K=10 on all
     three victims at the full budget: success 250/250 and CD/HD within
     regeneration noise of the exact-mode certs (RESULTS.md round-4
     refresh table; PointNet and SSG additionally certified at K=4).
     --curv_knn_refresh_every 1 restores exact per-step reference
     semantics (and is the library/AttackConfig default, so every loss
     parity test runs exact).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from geoa3_tpu import losses as L
from geoa3_tpu import ops
from geoa3_tpu.attack.config import AttackConfig
from geoa3_tpu.attack.project import (
    estimate_perpendicular,
    find_offset,
    lp_clip,
    offset_proj,
)

_INF = 1e10


class AttackResult(NamedTuple):
    best_attack: jax.Array  # [b, n, 3]
    target: jax.Array  # [b]
    success: jax.Array  # [b] bool (best_loss < 1e10, reference :386)
    best_attack_step: jax.Array  # [b] int32
    best_attack_bs_idx: jax.Array  # [b] int32
    best_loss: jax.Array  # [b]
    all_loss: jax.Array  # [iter_max_steps, b] — last binary step's losses


class _Aux(NamedTuple):
    logits: jax.Array
    loss_n: jax.Array
    cls_loss: jax.Array
    dis_loss: jax.Array
    hd_loss: jax.Array
    curv_loss: jax.Array
    constrain_loss: jax.Array


def _compare(output: jax.Array, target: jax.Array, gt: jax.Array, targeted: bool):
    """Success predicate (reference Lib/utility.py:151-155)."""
    return (output == target) if targeted else (output != gt)


def _cls_loss(
    logits: jax.Array, target: jax.Array, cfg: AttackConfig
) -> jax.Array:
    """Margin / CE / None classification loss (reference geoA3_attack.py:105-127)."""
    targeted = cfg.targeted
    if cfg.cls_loss_type == "Margin":
        onehot = jax.nn.one_hot(target, cfg.classes, dtype=logits.dtype)
        fake = jnp.sum(onehot * logits, axis=1)
        other = jnp.max((1.0 - onehot) * logits - onehot * 10000.0, axis=1)
        if targeted:
            return jnp.maximum(other - fake + cfg.confidence, 0.0)
        return jnp.maximum(fake - other + cfg.confidence, 0.0)
    if cfg.cls_loss_type == "CE":
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, target)
        return ce if targeted else -ce
    if cfg.cls_loss_type == "None":
        return jnp.zeros(logits.shape[0], logits.dtype)
    raise AssertionError("Not support such clssification loss")


def forward_losses(
    logits_fn: Callable[[jax.Array], jax.Array],
    pc_ori: jax.Array,
    input_curr: jax.Array,
    normal_ori: jax.Array,
    kappa_ori: Optional[jax.Array],
    target: jax.Array,
    scale_const: jax.Array,
    cfg: AttackConfig,
    self_idx: Optional[jax.Array] = None,
    kappa_mask: Optional[jax.Array] = None,
) -> tuple[jax.Array, _Aux]:
    """One loss evaluation (reference `_forward_step`, geoA3_attack.py:100-180).

    Loss values are bit-equal to composing geoa3_tpu.losses, but the geometry
    is FUSED for the hot path: the reference recomputes the adv->ori 1-NN four
    times per step (chamfer, hausdorff, kappa_adv, curvature — loss_utils.py
    :32,48,70,92) and the ori->adv 1-NN once more; here ONE pairwise-distance
    matmul feeds both argmin directions and every 1-NN consumer, and the
    adv self-kNN runs once through the Pallas kernel.
    """
    b = input_curr.shape[0]
    logits = logits_fn(input_curr)
    cls_loss = _cls_loss(logits, target, cfg)

    need_a2o = (
        cfg.dis_loss_type == "CD"
        or cfg.hd_loss_weight != 0
        or cfg.curv_loss_weight != 0
    )
    if need_a2o:
        # both 1-NN directions from ONE fused distance pass (the [n, m]
        # matrix never hits HBM on TPU); o2a is only consumed by two-sided
        # CD. The a2o-side CONSTANT row lookups (nearest ori point, its
        # borrowed normal, its kappa) ride the same kernel as exact
        # payload-plane copies — they were ~0.7 ms/step of XLA dynamic-row
        # gathers at b=32 (loop-invariant payload: XLA hoists the pack).
        with_curv = cfg.curv_loss_weight != 0
        pay_rows = [jnp.swapaxes(jax.lax.stop_gradient(pc_ori), 1, 2)]
        if with_curv:
            pay_rows.append(
                jnp.swapaxes(jax.lax.stop_gradient(normal_ori), 1, 2)
            )
            pay_rows.append(jax.lax.stop_gradient(kappa_ori)[:, None, :])
        pay = jnp.concatenate(pay_rows, axis=1)
        pad = 8 - pay.shape[1]
        pay = jnp.concatenate(
            [pay, jnp.zeros((b, pad, pay.shape[2]), pay.dtype)], axis=1
        )
        a2o_idx, o2a_idx, gp, op = ops.nn1_dual_payload(
            input_curr, pc_ori, pay
        )
        # differentiable squared 1-NN distances, shared by CD / HD —
        # computed per coordinate plane (gp rows are constants, so the
        # backward is pure elementwise: no gather, no scatter)
        d_a2o = (
            (input_curr[..., 0] - gp[:, 0]) ** 2
            + (input_curr[..., 1] - gp[:, 1]) ** 2
            + (input_curr[..., 2] - gp[:, 2]) ** 2
        )  # [b, n_adv]

    if cfg.dis_loss_type == "CD":
        if cfg.is_cd_single_side:
            dis_loss = d_a2o.mean(axis=-1)
        else:
            # o2a-side coords come as kernel payload planes (no XLA row
            # gather); differentiable via the Pallas-scatter backward
            # (XLA's take-backward is a sort-based scatter-add,
            # ~0.3 ms/step at b=32)
            opg = ops.o2a_coord_planes(input_curr, o2a_idx, op)
            d_o2a = (
                (pc_ori[..., 0] - opg[:, 0]) ** 2
                + (pc_ori[..., 1] - opg[:, 1]) ** 2
                + (pc_ori[..., 2] - opg[:, 2]) ** 2
            )  # [b, n_ori]
            dis_loss = d_a2o.mean(axis=-1) + d_o2a.mean(axis=-1)
        constrain = cfg.dis_loss_weight * dis_loss
    elif cfg.dis_loss_type == "L2":
        assert cfg.hd_loss_weight == 0
        dis_loss = L.norm_l2_loss(input_curr, pc_ori)
        constrain = cfg.dis_loss_weight * dis_loss
    elif cfg.dis_loss_type == "None":
        dis_loss = jnp.zeros(b, input_curr.dtype)
        constrain = jnp.zeros(b, input_curr.dtype)
    else:
        raise AssertionError("Not support such distance loss")

    if cfg.hd_loss_weight != 0:
        hd_loss = d_a2o.max(axis=-1)
        constrain = constrain + cfg.hd_loss_weight * hd_loss
    else:
        hd_loss = jnp.zeros(b, input_curr.dtype)

    if cfg.curv_loss_weight != 0:
        k = cfg.curv_loss_knn
        # kappa_adv: normal borrowed from the nearest ORI point — payload
        # rows 3..5 from the fused 1-NN kernel (no XLA gather); neighbour
        # coords come from the Pallas kNN kernel, or — with
        # curv_knn_refresh_every > 1 — from a gather at cached indices
        normal = jnp.stack([gp[:, 3], gp[:, 4], gp[:, 5]], axis=-1)
        if kappa_mask is not None:
            # cached selection MASK (kappa-kernel lazy path): the knockout
            # loop ran once per refresh block in the outer scan; this step
            # pays ONE fused kernel computing the loss term and its
            # gradient planes from a single matrix build (the backward is
            # a per-instance scalar multiply — ops.curv_term_from_mask)
            curv_loss = ops.curv_term_from_mask(
                input_curr, normal, gp[:, 6], kappa_mask, k
            )
        elif self_idx is not None:
            nn_pts = ops.knn_gather(input_curr, self_idx[..., 1:])
            vectors = nn_pts - input_curr[:, :, None, :]
            vectors = vectors / jnp.maximum(
                jnp.linalg.norm(vectors, axis=-1, keepdims=True), 1e-12
            )
            adv_kappa = jnp.abs(
                jnp.sum(vectors * normal[:, :, None, :], axis=-1)
            ).mean(axis=-1)
        else:
            # fused selection + masked kappa reduction + analytic backward
            # (no [b, n, k, 3] neighbour block, no scatter-add); off-TPU
            # this composes the exact pre-fusion math
            adv_kappa = ops.knn_kappa(input_curr, normal, k)
        if kappa_mask is None:
            onenn_ori_kappa = gp[:, 6]  # payload row 6 (exact copy)
            curv_loss = jnp.mean((adv_kappa - onenn_ori_kappa) ** 2, axis=-1)
        constrain = constrain + cfg.curv_loss_weight * curv_loss
    else:
        curv_loss = jnp.zeros(b, input_curr.dtype)

    if cfg.uniform_loss_weight != 0:
        constrain = constrain + cfg.uniform_loss_weight * L.uniform_loss(input_curr)

    loss_n = cls_loss + scale_const * constrain
    loss = loss_n.mean()
    aux = _Aux(logits, loss_n, cls_loss, dis_loss, hd_loss, curv_loss, constrain)
    return loss, aux


def _make_optimizer(cfg: AttackConfig):
    """Adam/SGD + optional exponential LR decay (reference :264-277)."""
    if cfg.is_use_lr_scheduler:
        lr = optax.exponential_decay(
            cfg.lr, transition_steps=1, decay_rate=cfg.lr_gamma
        )
    else:
        lr = cfg.lr
    if cfg.optim == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.optim == "sgd":
        momentum = 0.9 if cfg.is_partial_var else None  # reference :252-253 / :272
        return optax.sgd(lr, momentum=momentum)
    raise AssertionError("Not support such optimizer.")


def _ensemble_eval(
    logits_fn, input_all, target, gt_target, cfg: AttackConfig, key
):
    """FPS-resample ensemble vote for oversized clouds (reference :290-295)."""
    e = cfg.eval_num
    b, n, _ = input_all.shape
    keys = jax.random.split(key, e)
    pcs = jax.vmap(lambda k: ops.farthest_points_sample(input_all, cfg.npoint, k))(
        keys
    )  # [e, b, npoint, 3]
    logits = logits_fn(pcs.reshape(e * b, cfg.npoint, 3))
    preds = jnp.argmax(logits.reshape(e, b, -1), axis=-1)  # [e, b]
    succ = _compare(preds, target[None], gt_target[None], cfg.targeted)
    success = jnp.sum(succ, axis=0) > 0.5 * e
    counts = jax.nn.one_hot(preds, cfg.classes).sum(axis=0)  # [b, classes]
    output_label = jnp.argmax(counts, axis=-1)  # mode
    return success, output_label


class _Best(NamedTuple):
    loss: jax.Array  # [b]
    attack: jax.Array  # [b, n, 3]
    step: jax.Array  # [b]
    bs_idx: jax.Array  # [b]


def make_attack_fn(
    logits_fn: Callable[[jax.Array], jax.Array],
    cfg: AttackConfig,
    host_binary_loop: bool = False,
    eval_logits_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    debug_callback: Optional[Callable] = None,
) -> Callable[..., AttackResult]:
    """Build the whole-attack program for a fixed config.

    `logits_fn(pc [b, n, 3]) -> [b, classes]` must close over victim params
    (eval mode). The returned function is pure and jit/shard-friendly:

        attack_fn(pc_ori [b,n,3], normal_ori [b,n,3],
                  gt_target [b], target [b], key) -> AttackResult

    `host_binary_loop=True` drives the binary search from the host (ONE jitted
    program per search step, identical math): state stays on device between
    calls, so the only cost is binary_max_steps dispatches — but each device
    program is bounded to iter_max_steps, which matters on runtimes that kill
    long-running executions. Do not wrap the result in an outer jax.jit.

    `eval_logits_fn` (optional) replaces `logits_fn` for the SUCCESS /
    best-tracking eval pass only; the grad pass keeps `logits_fn`. This is
    how `--victim_dtype bfloat16` stays honest: a C&W binary search drives
    perturbations to the decision BOUNDARY, so an attack that flips the
    bf16 victim sits close enough to the boundary that the f32 victim
    disagrees on ~half the instances (measured: 137/250 on SSG) — success
    must therefore be judged by the deployment-precision victim every
    step, while the gradient forward can stay MXU-native bf16. Costs one
    extra f32 forward per step (eval is fwd-only, no grad).
    """
    cfg = cfg.validate()
    targeted = cfg.targeted
    if debug_callback is not None and (not host_binary_loop or cfg.is_partial_var):
        # the reference's is_debug observability (geoA3_attack.py:334-370)
        # needs the host between search steps; inside one fused scan∘scan
        # program there is no host to call — fail loudly, never silently
        raise ValueError(
            "debug_callback (--is_debug) requires host_binary_loop=True "
            "and is not supported in partial-var mode"
        )
    if eval_logits_fn is None:
        eval_logits_fn = logits_fn
        separate_eval = False
    else:
        separate_eval = True

    def make_binary_step(pc_ori, normal_ori, gt_target, target, kappa_ori):
        """Returns binary_step(carry, bs_idx) -> (carry, loss_ys); closes over
        the batch tensors (used inside jit/scan where they are tracers)."""
        b, n, _ = pc_ori.shape
        subsample = cfg.is_subsample_opt and (not cfg.is_partial_var) and (
            n > cfg.npoint
        )
        tx = _make_optimizer(cfg)

        lazy_knn = (
            cfg.curv_loss_weight != 0
            and cfg.curv_knn_refresh_every > 1
            and not subsample  # subsampled clouds change point sets per step
        )
        # With the fused kappa kernel available, the lazy cache is the
        # selection MASK (the kernel backward's only selection input) and
        # the inner steps run the mask-consuming forward — no knockout
        # loop, no index gather. Otherwise cache kNN indices + gather
        # (the composed path). Trace-time decision like every kernel gate.
        lazy_mask = lazy_knn and ops.kappa_mask_path_available(n)

        def loss_of_offset(
            offset, periodical_pc, jitter_noise, scale_const, fps_key, self_idx
        ):
            input_all = periodical_pc + offset
            if subsample:
                input_curr = ops.farthest_points_sample(
                    input_all, cfg.npoint, fps_key
                )
            else:
                input_curr = input_all
            if cfg.is_pre_jitter_input:
                input_curr = input_curr + jax.lax.stop_gradient(jitter_noise)
            return forward_losses(
                logits_fn,
                pc_ori,
                input_curr,
                normal_ori,
                kappa_ori,
                target,
                scale_const,
                cfg,
                self_idx=self_idx if (lazy_knn and not lazy_mask) else None,
                kappa_mask=self_idx if lazy_mask else None,
            )

        grad_fn = jax.value_and_grad(loss_of_offset, has_aux=True)

        def run_inner(best, periodical_pc, scale_const, bs_idx, key):
            """One full inner optimisation (iter_max_steps Adam steps)."""

            def inner_step(carry, step):
                (offset, opt_state, best, it_loss, it_score, jitter, self_idx,
                 key) = carry
                key, k_jit, k_fps, k_eval = jax.random.split(key, 4)
                input_all = periodical_pc + offset

                # --- tangent jitter refresh every K steps (reference :312-317) ---
                if cfg.is_pre_jitter_input:
                    # Reference estimates the jitter from the CURRENT (post-
                    # subsample) cloud (geoA3_attack.py:311-316); with
                    # subsample on, re-derive it with the same fps_key the
                    # loss pass uses so both see the same point set.
                    if subsample:
                        jitter_src = ops.farthest_points_sample(
                            jax.lax.stop_gradient(input_all),
                            cfg.npoint,
                            k_fps,
                        )
                    else:
                        jitter_src = input_all
                    jitter = jax.lax.cond(
                        step % cfg.calculate_project_jitter_noise_iter == 0,
                        lambda: estimate_perpendicular(
                            k_jit,
                            jitter_src,
                            cfg.jitter_k,
                            cfg.jitter_sigma,
                            cfg.jitter_clip,
                        ),
                        lambda: jitter,
                    )

                # --- fused forward+grad ---
                (_, aux), grads = grad_fn(
                    offset, periodical_pc, jitter, scale_const, k_fps, self_idx
                )

                # --- eval / best tracking (reference :288-310) ---
                if subsample:
                    success, output_label = _ensemble_eval(
                        eval_logits_fn, input_all, target, gt_target, cfg,
                        k_eval,
                    )
                elif cfg.is_pre_jitter_input or separate_eval:
                    # grad pass saw jittered input (or ran at a different
                    # precision); eval must see the clean cloud through the
                    # eval victim
                    logits_eval = eval_logits_fn(input_all)
                    output_label = jnp.argmax(logits_eval, axis=-1)
                    success = _compare(output_label, target, gt_target, targeted)
                else:
                    output_label = jnp.argmax(aux.logits, axis=-1)
                    success = _compare(output_label, target, gt_target, targeted)

                metric = aux.constrain_loss
                better = success & (metric < best.loss)
                best = _Best(
                    loss=jnp.where(better, metric, best.loss),
                    attack=jnp.where(better[:, None, None], input_all, best.attack),
                    step=jnp.where(better, step, best.step),
                    bs_idx=jnp.where(better, bs_idx, best.bs_idx),
                )
                it_better = success & (metric < it_loss)
                it_loss = jnp.where(it_better, metric, it_loss)
                it_score = jnp.where(
                    it_better, output_label.astype(jnp.int32), it_score
                )

                # --- optimizer step ---
                updates, opt_state = tx.update(grads, opt_state)
                offset = optax.apply_updates(offset, updates)

                # --- projections (reference :341-352) ---
                if cfg.is_pro_grad:
                    if cfg.is_real_offset:
                        offset = find_offset(pc_ori, periodical_pc + offset)
                    offset = offset_proj(offset, pc_ori, normal_ori)
                if cfg.cc_linf != 0:
                    offset = lp_clip(offset, cfg.cc_linf)

                return (
                    offset, opt_state, best, it_loss, it_score, jitter,
                    self_idx, key,
                ), aux.loss_n

            k_init, k_scan = jax.random.split(key)
            offset0 = 1e-3 * jax.random.normal(k_init, (b, n, 3), pc_ori.dtype)
            opt_state0 = tx.init(offset0)
            it_loss0 = jnp.full((b,), _INF, pc_ori.dtype)
            it_score0 = jnp.full((b,), -1, jnp.int32)
            n_jit = cfg.npoint if subsample else n
            # a scalar placeholder when jitter is off: a [b, n, 3] zeros
            # carry costs a dead per-step copy inside the scan
            jitter0 = (
                jnp.zeros((b, n_jit, 3), pc_ori.dtype)
                if cfg.is_pre_jitter_input
                else jnp.zeros((), pc_ori.dtype)
            )
            if lazy_mask:
                self_idx0 = jnp.zeros((b, n, n), jnp.int8)
            elif lazy_knn:
                self_idx0 = jnp.zeros((b, n, cfg.curv_loss_knn + 1), jnp.int32)
            else:
                self_idx0 = jnp.zeros((), jnp.int32)  # placeholder carry leaf
            carry0 = (
                offset0, opt_state0, best, it_loss0, it_score0, jitter0,
                self_idx0, k_scan,
            )
            if lazy_knn:
                # lazy self-kNN refresh (TPU perf option, exact when 1):
                # a NESTED scan — the adversarial self-kNN is recomputed once
                # per block of `curv_knn_refresh_every` steps and held fixed
                # inside the block. A per-step `lax.cond` measured SLOWER
                # than exact (the cond breaks XLA fusion in the hot body);
                # the nested scan keeps every inner step cond-free.
                K = cfg.curv_knn_refresh_every

                def outer_step(carry, blk):
                    input_all = jax.lax.stop_gradient(
                        periodical_pc + carry[0]
                    )
                    if lazy_mask:
                        self_idx = ops.kappa_select_mask(
                            input_all, cfg.curv_loss_knn
                        )
                    else:
                        self_idx = ops.knn_points(
                            input_all, input_all, k=cfg.curv_loss_knn + 1
                        ).idx
                    carry = carry[:6] + (self_idx,) + carry[7:]
                    return jax.lax.scan(
                        lambda c, i: inner_step(c, blk * K + i),
                        carry,
                        jnp.arange(K),
                    )

                carry, loss_ys = jax.lax.scan(
                    outer_step, carry0, jnp.arange(cfg.iter_max_steps // K)
                )
                loss_ys = loss_ys.reshape(cfg.iter_max_steps, b)
            else:
                carry, loss_ys = jax.lax.scan(
                    inner_step, carry0, jnp.arange(cfg.iter_max_steps)
                )
            best, it_score = carry[2], carry[4]
            return best, it_score, loss_ys

        def binary_step(carry, bs_idx):
            lower, upper, const, best, key = carry
            key, k_run = jax.random.split(key)
            best, it_score, loss_ys = run_inner(best, pc_ori, const, bs_idx, k_run)

            # --- C&W const update (reference :374-384; see deviation note 2) ---
            success = it_score != -1
            new_lower = jnp.where(success, jnp.maximum(lower, const), lower)
            new_upper = jnp.where(success, upper, jnp.minimum(upper, const))
            const_success = jnp.where(
                new_upper < 1e9, (new_lower + new_upper) * 0.5, const * 2
            )
            const_fail = jnp.where(
                new_upper < 1e9, (new_lower + new_upper) * 0.5, const
            )
            new_const = jnp.where(success, const_success, const_fail)
            return (new_lower, new_upper, new_const, best, key), loss_ys

        return binary_step

    def _init_carry(pc_ori, key):
        b, n, _ = pc_ori.shape
        lower0 = jnp.zeros((b,), pc_ori.dtype)
        upper0 = jnp.full((b,), _INF, pc_ori.dtype)
        const0 = jnp.full((b,), cfg.initial_const, pc_ori.dtype)
        best0 = _Best(
            loss=jnp.full((b,), _INF, pc_ori.dtype),
            attack=jnp.ones((b, n, 3), pc_ori.dtype),  # reference :226
            step=jnp.full((b,), -1, jnp.int32),
            bs_idx=jnp.full((b,), -1, jnp.int32),
        )
        return (lower0, upper0, const0, best0, key)

    def _kappa(pc_ori, normal_ori):
        if cfg.curv_loss_weight != 0:
            return L.get_kappa_ori(pc_ori, normal_ori, cfg.curv_loss_knn)
        return jnp.zeros(pc_ori.shape[:2], pc_ori.dtype)

    def _result(best, target, all_loss):
        return AttackResult(
            best_attack=best.attack,
            target=target,
            success=best.loss < _INF,
            best_attack_step=best.step,
            best_attack_bs_idx=best.bs_idx,
            best_loss=best.loss,
            all_loss=all_loss,  # reference returns the last search step's
        )

    def attack_fn(pc_ori, normal_ori, gt_target, target, key) -> AttackResult:
        if cfg.is_partial_var:
            return _attack_partial_var(
                logits_fn, cfg, pc_ori, normal_ori, gt_target, target, key,
                eval_logits_fn=eval_logits_fn if separate_eval else None,
            )
        kappa_ori = _kappa(pc_ori, normal_ori)
        binary_step = make_binary_step(
            pc_ori, normal_ori, gt_target, target, kappa_ori
        )
        carry, all_loss = jax.lax.scan(
            binary_step,
            _init_carry(pc_ori, key),
            jnp.arange(cfg.binary_max_steps),
        )
        return _result(carry[3], target, all_loss[-1])

    if not host_binary_loop:
        return attack_fn

    # ---- host-driven binary search: one jitted program per search step ----
    @jax.jit
    def one_step(pc_ori, normal_ori, gt_target, target, kappa_ori, carry, bs_idx):
        binary_step = make_binary_step(
            pc_ori, normal_ori, gt_target, target, kappa_ori
        )
        return binary_step(carry, bs_idx)

    kappa_jit = jax.jit(_kappa)

    def attack_fn_host(pc_ori, normal_ori, gt_target, target, key) -> AttackResult:
        if cfg.is_partial_var:
            return _attack_partial_var(
                logits_fn, cfg, pc_ori, normal_ori, gt_target, target, key,
                eval_logits_fn=eval_logits_fn if separate_eval else None,
            )
        pc_ori = jnp.asarray(pc_ori)
        normal_ori = jnp.asarray(normal_ori)
        gt_target = jnp.asarray(gt_target)
        target = jnp.asarray(target)
        kappa_ori = kappa_jit(pc_ori, normal_ori)
        carry = _init_carry(pc_ori, key)
        loss_ys = None
        for bs_idx in range(cfg.binary_max_steps):
            carry, loss_ys = one_step(
                pc_ori, normal_ori, gt_target, target, kappa_ori, carry,
                jnp.int32(bs_idx),
            )
            if debug_callback is not None:
                # per-search-step observability (reference geoA3_attack.py
                # :334-370 dumps per-50-inner-steps; here the host only
                # exists between search steps): current best cloud + the
                # full per-step loss curve of this search step
                debug_callback(bs_idx, carry[3].attack, loss_ys)
        return _result(carry[3], target, loss_ys)

    return attack_fn_host


def _attack_partial_var(
    logits_fn, cfg: AttackConfig, pc_ori, normal_ori, gt_target, target, key,
    eval_logits_fn=None,
) -> AttackResult:
    """Partial-variable mode: optimise offsets on a kNN patch, re-picked every
    `partial_reinit_every` steps (reference geoA3_attack.py:239-262,279-281).

    Parity notes: the random patch seed index is shared across the batch
    (reference :243 uses one np.random.randint); each phase keeps the previous
    phase's LAST pre-update cloud as its base (`periodical_pc`, :259-262);
    the reference's pro_grad/cc_linf writes are dead in this mode (they write
    a tensor that is rebuilt from part_offset next step), so they are not
    applied here.
    """
    targeted = cfg.targeted
    b, n, _ = pc_ori.shape
    kr = cfg.knn_range
    reinit = cfg.partial_reinit_every
    assert cfg.iter_max_steps % reinit == 0, (
        "iter_max_steps must be a multiple of partial_reinit_every in "
        "partial-var mode"
    )
    n_phases = cfg.iter_max_steps // reinit

    kappa_ori = (
        L.get_kappa_ori(pc_ori, normal_ori, cfg.curv_loss_knn)
        if cfg.curv_loss_weight != 0
        else None
    )
    tx = _make_optimizer(cfg)
    batch_rows = jnp.arange(b)[:, None]

    def pad_offset(part_offset, nbr_idx):
        full = jnp.zeros((b, n, 3), pc_ori.dtype)
        return full.at[batch_rows, nbr_idx].set(part_offset)

    def loss_of_part(part_offset, nbr_idx, periodical_pc, scale_const):
        input_all = periodical_pc + pad_offset(part_offset, nbr_idx)
        loss, aux = forward_losses(
            logits_fn,
            pc_ori,
            input_all,
            normal_ori,
            kappa_ori,
            target,
            scale_const,
            cfg,
        )
        return loss, (aux, input_all)

    grad_fn = jax.value_and_grad(loss_of_part, has_aux=True)

    def binary_step(carry, bs_idx):
        lower, upper, const, best, key = carry

        def phase_step(ph_carry, phase_idx):
            periodical_pc, best, it_loss, it_score, key = ph_carry
            key, k_pt, k_off, k_scan = jax.random.split(key, 4)
            # pick a patch: kNN of one random seed point (reference :243-245)
            seed_idx = jax.random.randint(k_pt, (), 0, n)
            q = jax.lax.dynamic_slice_in_dim(pc_ori, seed_idx, 1, axis=1)
            nbr_idx = ops.knn_points(q, pc_ori, kr + 1).idx[:, 0, 1:]  # [b, kr]
            part0 = 1e-3 * jax.random.normal(k_off, (b, kr, 3), pc_ori.dtype)
            opt_state0 = tx.init(part0)

            def inner(in_carry, i):
                part, opt_state, best, it_loss, it_score, last_input = in_carry
                step = phase_idx * reinit + i
                (_, (aux, input_all)), grads = grad_fn(
                    part, nbr_idx, periodical_pc, const
                )
                if eval_logits_fn is not None:
                    output_label = jnp.argmax(eval_logits_fn(input_all), axis=-1)
                else:
                    output_label = jnp.argmax(aux.logits, axis=-1)
                success = _compare(output_label, target, gt_target, targeted)
                metric = aux.constrain_loss
                better = success & (metric < best.loss)
                best = _Best(
                    loss=jnp.where(better, metric, best.loss),
                    attack=jnp.where(better[:, None, None], input_all, best.attack),
                    step=jnp.where(better, step, best.step),
                    bs_idx=jnp.where(better, bs_idx, best.bs_idx),
                )
                it_better = success & (metric < it_loss)
                it_loss = jnp.where(it_better, metric, it_loss)
                it_score = jnp.where(
                    it_better, output_label.astype(jnp.int32), it_score
                )
                updates, opt_state = tx.update(grads, opt_state)
                part = optax.apply_updates(part, updates)
                return (part, opt_state, best, it_loss, it_score, input_all), (
                    aux.loss_n
                )

            in0 = (part0, opt_state0, best, it_loss, it_score, periodical_pc)
            (part, _, best, it_loss, it_score, last_input), loss_ys = jax.lax.scan(
                inner, in0, jnp.arange(reinit)
            )
            # next phase bases off the last PRE-update cloud (reference :260)
            return (last_input, best, it_loss, it_score, key), loss_ys

        it_loss0 = jnp.full((b,), _INF, pc_ori.dtype)
        it_score0 = jnp.full((b,), -1, jnp.int32)
        (_, best, it_loss, it_score, key), loss_ys = jax.lax.scan(
            phase_step,
            (pc_ori, best, it_loss0, it_score0, key),
            jnp.arange(n_phases),
        )
        loss_ys = loss_ys.reshape(cfg.iter_max_steps, b)

        success = it_score != -1
        new_lower = jnp.where(success, jnp.maximum(lower, const), lower)
        new_upper = jnp.where(success, upper, jnp.minimum(upper, const))
        const_success = jnp.where(
            new_upper < 1e9, (new_lower + new_upper) * 0.5, const * 2
        )
        const_fail = jnp.where(new_upper < 1e9, (new_lower + new_upper) * 0.5, const)
        new_const = jnp.where(success, const_success, const_fail)
        return (new_lower, new_upper, new_const, best, key), loss_ys

    lower0 = jnp.zeros((b,), pc_ori.dtype)
    upper0 = jnp.full((b,), _INF, pc_ori.dtype)
    const0 = jnp.full((b,), cfg.initial_const, pc_ori.dtype)
    best0 = _Best(
        loss=jnp.full((b,), _INF, pc_ori.dtype),
        attack=jnp.ones((b, n, 3), pc_ori.dtype),
        step=jnp.full((b,), -1, jnp.int32),
        bs_idx=jnp.full((b,), -1, jnp.int32),
    )
    (_, _, _, best, _), all_loss = jax.lax.scan(
        binary_step,
        (lower0, upper0, const0, best0, key),
        jnp.arange(cfg.binary_max_steps),
    )
    return AttackResult(
        best_attack=best.attack,
        target=target,
        success=best.loss < _INF,
        best_attack_step=best.step,
        best_attack_bs_idx=best.bs_idx,
        best_loss=best.loss,
        all_loss=all_loss[-1],
    )


def attack(
    logits_fn: Callable[[jax.Array], jax.Array],
    pc_ori: jax.Array,
    normal_ori: jax.Array,
    gt_target: jax.Array,
    target: jax.Array,
    cfg: AttackConfig,
    key: jax.Array,
    jit: bool = True,
) -> AttackResult:
    """Convenience one-shot entry (reference `attack`, geoA3_attack.py:182-386).

    pc_ori/normal_ori are channel-last [b, n, 3]; gt_target/target are [b]
    int labels. For `Untarget`, pass target == gt_target.
    """
    fn = make_attack_fn(logits_fn, cfg)
    if jit:
        fn = jax.jit(fn)
    return fn(
        jnp.asarray(pc_ori),
        jnp.asarray(normal_ori),
        jnp.asarray(gt_target),
        jnp.asarray(target),
        key,
    )
