"""Jitted training / evaluation steps.

One fused device program per (curriculum phase, time bucket): SST encode,
context build, TSRM, decoder teacher-forcing, losses, grads, per-element
clip, dual-Adam update — no host round trips inside a step (the reference
crosses host<->device every step and runs Python loops per proposal,
train.py:273-279, SURVEY §3.2).

Phases mirror the reference curriculum (train.py:26-66, 291-331):
  'tap'        — TAP loss only, update TAP.
  'cg'         — caption loss on GT proposals, update captioner only.
  'gt_tap_cg'  — caption loss on GT proposals, update captioner AND let
                 gradients flow into the TAP encoder.
  'tap_cg'     — lambda1*tap + lambda2*cg on sampled proposals, update both.

Data parallelism: the batched step vmaps over a leading video axis; under
jit with the batch sharded over the mesh "data" axis, XLA turns the loss
mean into an ICI psum — the entire distributed backend the reference lacks.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from echr_tpu import losses
from echr_tpu.config import Config
from echr_tpu.data.batcher import VideoBatch
from echr_tpu.models.captioner import (
    ProposalBatch,
    captioner_sample,
    captioner_train_forward,
    captioner_train_loss,
)
from echr_tpu.models.sst import sst_forward
from echr_tpu.ops.core import cast_compute_dtype


def _cast(params, cfg: "Config"):
    """Mixed precision: cast matrix weights to the runtime compute dtype
    inside the jitted step (master weights stay fp32 in the state)."""
    return cast_compute_dtype(params, cfg.runtime.compute_dtype)

Array = jax.Array


class TrainState(NamedTuple):
    tap_params: Any
    cg_params: Any
    tap_opt: Any
    cg_opt: Any
    step: Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Per-element clip -> weight decay -> Adam -> -lr, matching the
    reference order (clip_gradient before optimizer.step, train.py:293;
    torch Adam applies weight_decay inside the step)."""
    t = cfg.train

    def clip() -> optax.GradientTransformation:
        def update(updates, state, params=None):
            return losses.clip_grads_elementwise(updates, t.grad_clip), state

        return optax.GradientTransformation(lambda p: optax.EmptyState(), update)

    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            clip(),
            optax.add_decayed_weights(t.weight_decay) if t.weight_decay else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=t.optim_epsilon),
            optax.scale(-1.0),
            optax.scale_by_learning_rate(learning_rate, flip_sign=False),
        )
    )(learning_rate=t.lr)


def init_train_state(cfg: Config, tap_params, cg_params) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        tap_params=tap_params,
        cg_params=cg_params,
        tap_opt=opt.init(tap_params),
        cg_opt=opt.init(cg_params),
        step=jnp.zeros((), jnp.int32),
    )


def set_lr(state: TrainState, lr: float) -> TrainState:
    """Epoch step-decay LR injection (reference: utils.set_lr + train.py:232-240)."""
    tap_opt = state.tap_opt
    cg_opt = state.cg_opt
    tap_opt = tap_opt._replace(hyperparams={**tap_opt.hyperparams, "learning_rate": jnp.asarray(lr)})
    cg_opt = cg_opt._replace(hyperparams={**cg_opt.hyperparams, "learning_rate": jnp.asarray(lr)})
    return state._replace(tap_opt=tap_opt, cg_opt=cg_opt)


UPDATES_TAP = ("tap", "tap_cg", "gt_tap_cg")
UPDATES_CG = ("cg", "gt_tap_cg", "tap_cg", "LP_cg")


def decompress_batch(batch: VideoBatch) -> VideoBatch:
    """Undo the host->device transfer compression
    (engine.train._compress_batch): bf16 features and uint8 binary grids
    come back as f32 — exact for the {0,1} grids, bf16-quantised for
    features (a no-op under a bf16 compute_dtype, see
    RuntimeConfig.transfer_dtype).  Uncompressed batches pass through
    untouched; the casts fuse into the first consumer under jit."""

    def up(x):
        if x.dtype in (jnp.bfloat16, jnp.uint8):
            return x.astype(jnp.float32)
        return x

    return jax.tree.map(up, batch)


def _vmapped_decode_cfg(cfg: Config, T: int) -> Config:
    """Window-sort policy for VMAPPED decode pipelines (round 4,
    experiments/probe_decode_sort2.py, interleaved best-of-8 on TPU).

    Per-VIDEO callers keep sort_ctxs_by_window's ceiling raise to
    pallas_decode_t_max_sorted: the sorted tile-skipping kernel wins
    clearly there (-7% wall at T=512 even under the relay RTT).  Under
    vmap the picture inverts: the win shrinks to ~2% at T<=384 and FLIPS
    to a ~5% LOSS at T=512 — XLA's batch-fused jnp scores path beats the
    vmapped kernel past the unsorted crossover.  So batched callers
    (1) never raise the decode T ceiling and (2) skip the sort's
    argsort/gather cost entirely when the kernel can't fire anyway
    (sort costs ~3% for nothing on the jnp path).  Bit-exactness is
    unaffected — the sort is an output-invariant permutation either way."""
    from echr_tpu.ops.pallas_attention import _TILE_T

    rt = cfg.runtime
    return cfg.replace_in(
        "runtime",
        pallas_decode_t_max_sorted=rt.pallas_decode_t_max,
        # kernel-can-fire gate: the ceiling AND the kernel's T tile rule
        # (supported() also needs T % _TILE_T == 0 — buckets 64/192 would
        # otherwise pay the sort while the jnp path runs, review r4)
        sort_decode_props=bool(
            rt.sort_decode_props and T <= rt.pallas_decode_t_max
            and T % _TILE_T == 0),
    )


def _select_props(batch: VideoBatch, phase: str) -> Tuple[ProposalBatch, Array, Array]:
    """GT proposals for 'cg'/'gt_tap_cg', sampled good proposals otherwise —
    including 'LP_cg', which trains the captioner on sampled proposals
    (reference: train.py:265-271,312)."""
    if phase in ("cg", "gt_tap_cg"):
        props = ProposalBatch(batch.gts_ind, batch.gts_soi, batch.gts_mask)
        return props, batch.gts_cg_labels, batch.gts_cg_masks
    props = ProposalBatch(batch.ind_select, batch.soi, batch.prop_mask)
    return props, batch.cg_labels, batch.cg_masks


def _one_video_losses(
    tap_params,
    cg_params,
    cfg: Config,
    batch: VideoBatch,
    phase: str,
    rng: Optional[Array],
    train: bool,
    ss_prob: float,
) -> Dict[str, Array]:
    r_tap = r_cg = None
    if rng is not None:
        r_tap, r_cg = jax.random.split(rng)
    tap_feats, scores = sst_forward(
        tap_params, batch.feats, train=train, rng=r_tap,
        dropout_rate=cfg.tap.rnn_dropout,
    )
    tap_l = losses.tap_loss(scores, batch.tap_masks, batch.tap_labels, batch.w1, batch.n_frames)
    out = {"tap_loss": tap_l}
    if phase != "tap":
        props, cg_labels, cg_masks = _select_props(batch, phase)
        if cfg.runtime.fused_loss_head and ss_prob == 0.0:
            # fused loss head: logit matmul hoisted out of the scan, loss
            # computed without storing [N, L, V+1] logprobs (same math)
            cg_l = captioner_train_loss(
                cg_params, cfg, tap_feats, batch.feats, batch.lda, cg_labels,
                cg_masks, props, frame_mask=batch.frame_mask, train=train,
                rng=r_cg,
            )
        else:
            logprobs = captioner_train_forward(
                cg_params, cfg, tap_feats, batch.feats, batch.lda, cg_labels, props,
                frame_mask=batch.frame_mask, train=train, rng=r_cg, ss_prob=ss_prob,
            )
            cg_l = losses.language_model_loss(logprobs, cg_labels[:, 1:], cg_masks[:, 1:])
        out["cg_loss"] = cg_l
        out["total_loss"] = cfg.train.lambda1 * tap_l + cfg.train.lambda2 * cg_l
    return out


def _phase_loss(metrics: Dict[str, Array], phase: str, cfg: Config) -> Array:
    if phase == "tap":
        return metrics["tap_loss"]
    if phase in ("cg", "gt_tap_cg", "LP_cg"):
        return metrics["cg_loss"]
    return metrics["total_loss"]


@functools.partial(
    jax.jit, static_argnames=("cfg", "phase", "ss_prob", "update_tap", "update_cg"),
    donate_argnames=("state",),  # reuse param/optimizer buffers in place
)
def train_step(
    state: TrainState,
    batch: VideoBatch,  # leaves with leading [B] axis
    rng: Array,
    cfg: Config,
    phase: str,
    ss_prob: float = 0.0,
    update_tap: bool = True,
    update_cg: bool = True,
) -> Tuple[TrainState, Dict[str, Array]]:
    """One data-parallel training step over a [B]-video batch."""
    batch = decompress_batch(batch)
    B = batch.feats.shape[0]
    opt = make_optimizer(cfg)

    def loss_fn(tap_params, cg_params):
        tap_c, cg_c = _cast(tap_params, cfg), _cast(cg_params, cfg)
        rngs = jax.random.split(rng, B)
        m = jax.vmap(
            lambda b, r: _one_video_losses(
                tap_c, cg_c, cfg, b, phase, r, True, ss_prob
            )
        )(batch, rngs)
        m = jax.tree.map(lambda x: jnp.mean(x), m)
        return _phase_loss(m, phase, cfg), m

    (loss, metrics), (tap_g, cg_g) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.tap_params, state.cg_params)

    new_state = state
    if update_tap and phase in UPDATES_TAP:
        upd, tap_opt = opt.update(tap_g, state.tap_opt, state.tap_params)
        tap_params = optax.apply_updates(state.tap_params, upd)
        new_state = new_state._replace(tap_params=tap_params, tap_opt=tap_opt)
    if update_cg and phase in UPDATES_CG:
        upd, cg_opt = opt.update(cg_g, new_state.cg_opt, new_state.cg_params)
        cg_params = optax.apply_updates(new_state.cg_params, upd)
        new_state = new_state._replace(cg_params=cg_params, cg_opt=cg_opt)
    new_state = new_state._replace(step=state.step + 1)
    metrics["loss"] = loss
    return new_state, metrics


@functools.partial(
    jax.jit, static_argnames=("cfg", "phase", "mesh", "ss_prob",
                              "update_tap", "update_cg"),
    donate_argnames=("state",),  # reuse param/optimizer buffers like train_step
)
def train_step_shard_map(
    state: TrainState,
    batch: VideoBatch,  # leaves with leading [B] axis, sharded over "data"
    rng: Array,
    cfg: Config,
    phase: str,
    mesh,
    ss_prob: float = 0.0,
    update_tap: bool = True,
    update_cg: bool = True,
) -> Tuple[TrainState, Dict[str, Array]]:
    """Explicit-SPMD variant of train_step (runtime.spmd_mode="shard_map"):
    each device computes loss/grads over ITS batch rows at local shapes and
    the gradients are psum'd over the data axis — numerically the same
    global-batch mean as train_step's auto-partitioned form (row i keeps the
    identical rng split), with two practical differences:

      * collectives are explicit (the scaling-book shard_map recipe) rather
        than inserted by the GSPMD partitioner;
      * the per-device program sees LOCAL shapes, so Pallas kernels
        (runtime.use_pallas_train) fire inside the mesh — the partitioner
        would otherwise treat the opaque custom call as replicated.

    dp-only meshes (model axis must be 1: tensor-parallel params need the
    auto-partitioned path's sharding rules)."""
    if mesh.shape["model"] != 1:
        raise ValueError("spmd_mode='shard_map' supports dp-only meshes; "
                         "use the auto-partitioned path for tensor parallelism")
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape["data"]
    opt = make_optimizer(cfg)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P("data"), batch), P()),
        out_specs=(P(), P()),
        # the model's scans start carries from replicated zeros that turn
        # varying once sharded inputs enter — skip the static VMA checker
        # instead of pcast-ing every scan carry (outputs are made
        # replicated explicitly: grads psum'd, metrics pmean'd)
        check_vma=False,
    )
    def run(state, local, rng):
        local = decompress_batch(local)
        Bl = local.feats.shape[0]
        my = jax.lax.axis_index("data")
        # row i of the GLOBAL batch consumes split(rng, B)[i], exactly like
        # train_step — shard k holds contiguous rows [k*Bl, (k+1)*Bl)
        # (*rng.shape keeps this correct for both raw uint32 [2] keys and
        # typed key arrays)
        rngs = jax.random.split(rng, dp * Bl).reshape(dp, Bl, *rng.shape)[my]

        def loss_fn(tap_params, cg_params):
            tap_c, cg_c = _cast(tap_params, cfg), _cast(cg_params, cfg)
            m = jax.vmap(
                lambda b, r: _one_video_losses(
                    tap_c, cg_c, cfg, b, phase, r, True, ss_prob
                )
            )(local, rngs)
            m = jax.tree.map(lambda x: jnp.mean(x), m)
            m = jax.lax.pmean(m, "data")  # global-batch mean
            return _phase_loss(m, phase, cfg), m

        (loss, metrics), (tap_g, cg_g) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.tap_params, state.cg_params)
        # pmean's VJP hands each shard cotangent 1/dp, so per-shard grads
        # are (1/dp) d(local mean)/dθ; their psum is the global-mean grad
        tap_g = jax.tree.map(lambda g: jax.lax.psum(g, "data"), tap_g)
        cg_g = jax.tree.map(lambda g: jax.lax.psum(g, "data"), cg_g)

        new_state = state
        if update_tap and phase in UPDATES_TAP:
            upd, tap_opt = opt.update(tap_g, state.tap_opt, state.tap_params)
            new_state = new_state._replace(
                tap_params=optax.apply_updates(state.tap_params, upd),
                tap_opt=tap_opt,
            )
        if update_cg and phase in UPDATES_CG:
            upd, cg_opt = opt.update(cg_g, new_state.cg_opt, new_state.cg_params)
            new_state = new_state._replace(
                cg_params=optax.apply_updates(new_state.cg_params, upd),
                cg_opt=cg_opt,
            )
        new_state = new_state._replace(step=state.step + 1)
        metrics["loss"] = loss
        return new_state, metrics

    return run(state, batch, rng)


@functools.partial(jax.jit, static_argnames=("cfg", "phase", "ss_prob"))
def grad_step(
    state: TrainState,
    batch: VideoBatch,
    rng: Array,
    cfg: Config,
    phase: str,
    ss_prob: float = 0.0,
):
    """Gradients only — for m_batch accumulation (reference sums grads over
    m_batch backward passes before stepping, train.py:281-283,294)."""
    batch = decompress_batch(batch)
    B = batch.feats.shape[0]

    def loss_fn(tap_params, cg_params):
        tap_c, cg_c = _cast(tap_params, cfg), _cast(cg_params, cfg)
        rngs = jax.random.split(rng, B)
        m = jax.vmap(
            lambda b, r: _one_video_losses(tap_c, cg_c, cfg, b, phase, r, True, ss_prob)
        )(batch, rngs)
        m = jax.tree.map(lambda x: jnp.mean(x), m)
        return _phase_loss(m, phase, cfg), m

    (loss, metrics), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
        state.tap_params, state.cg_params
    )
    metrics["loss"] = loss
    return grads, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "phase"))
def apply_grads(state: TrainState, tap_g, cg_g, cfg: Config, phase: str) -> TrainState:
    """Apply (possibly accumulated) gradients with the per-phase optimizers."""
    opt = make_optimizer(cfg)
    new_state = state
    if phase in UPDATES_CG:
        upd, cg_opt = opt.update(cg_g, state.cg_opt, state.cg_params)
        new_state = new_state._replace(
            cg_params=optax.apply_updates(state.cg_params, upd), cg_opt=cg_opt
        )
    if phase in UPDATES_TAP:
        upd, tap_opt = opt.update(tap_g, new_state.tap_opt, new_state.tap_params)
        new_state = new_state._replace(
            tap_params=optax.apply_updates(new_state.tap_params, upd), tap_opt=tap_opt
        )
    return new_state._replace(step=state.step + 1)


# ---------------------------------------------------------------------------
# self-critical (SCST) steps — single video
# ---------------------------------------------------------------------------


def _rl_prepare(tap_params, cg_params, cfg: Config, batch: VideoBatch,
                phase: str, rng: Array):
    """The encode + train-mode context half of the SCST rollout forward:
    everything up to (but excluding) the sampled decode.  Returns
    (tap_l, tap_feats, ctxs, r_sample) with the exact rng splits
    _rl_forward consumes, so a caller that decodes ctxs with r_sample
    reproduces _rl_forward's draws and dropout masks bit-for-bit."""
    from echr_tpu.models.captioner import make_contexts

    tap_params = _cast(tap_params, cfg)
    cg_params = _cast(cg_params, cfg)
    r_tap, r_ctx, r_sample = jax.random.split(rng, 3)
    tap_feats, scores = sst_forward(
        tap_params, batch.feats, train=True, rng=r_tap,
        dropout_rate=cfg.tap.rnn_dropout,
    )
    tap_l = losses.tap_loss(scores, batch.tap_masks, batch.tap_labels, batch.w1,
                            batch.n_frames)
    props, _, _ = _select_props(batch, phase)
    ctxs = make_contexts({"fusion": cg_params.get("fusion")}, cfg, tap_feats,
                         batch.feats, batch.lda, props,
                         frame_mask=batch.frame_mask, train=True, rng=r_ctx)
    return tap_l, tap_feats, ctxs, r_sample


def _rl_forward(tap_params, cg_params, cfg: Config, batch: VideoBatch, phase: str,
                rng: Array, forced=None, early_exit=None):
    """Train-mode rollout with deterministic rng splits.  Called twice with
    the same rng: once to sample (forced=None), once to replay the sampled
    tokens differentiably (forced=gen_seq) — dropout masks are identical.
    Params are cast to runtime.compute_dtype like every other step, so the
    SCST phase runs the same mixed precision as the decode path whose
    captions it optimizes."""
    from echr_tpu.models.decoder import decoder_sample

    tap_l, tap_feats, ctxs, r_sample = _rl_prepare(
        tap_params, cg_params, cfg, batch, phase, rng)
    gen_seq, gen_logps, _ = decoder_sample(
        _cast(cg_params, cfg)["decoder"], cfg, ctxs, greedy=False,
        rng=r_sample, train=True, forced_tokens=forced, early_exit=early_exit,
    )
    return tap_l, tap_feats, gen_seq, gen_logps


@functools.partial(jax.jit, static_argnames=("cfg", "phase"))
def rl_rollout_step(tap_params, cg_params, batch: VideoBatch, cfg: Config,
                    phase: str, rng: Array):
    """Sample a train-mode rollout + an eval-mode greedy baseline
    (reference: CaptionGenerator mode='train_rl', :32-38)."""
    from echr_tpu.models.captioner import make_contexts
    from echr_tpu.models.decoder import decoder_sample

    batch = decompress_batch(batch)
    tap_l, _, gen_seq, gen_logps = _rl_forward(
        tap_params, cg_params, cfg, batch, phase, rng
    )
    # greedy baseline: eval mode, no dropout (cast like the decode path)
    tap_c, cg_c = _cast(tap_params, cfg), _cast(cg_params, cfg)
    tap_feats_eval, _ = sst_forward(tap_c, batch.feats, train=False)
    props, _, _ = _select_props(batch, phase)
    ctxs_eval = make_contexts({"fusion": cg_c.get("fusion")}, cfg,
                              tap_feats_eval, batch.feats, batch.lda, props,
                              frame_mask=batch.frame_mask, train=False)
    greedy_seq, _, _ = decoder_sample(cg_c["decoder"], cfg, ctxs_eval,
                                      greedy=True, train=False)
    return tap_l, gen_seq, greedy_seq


@functools.partial(jax.jit, static_argnames=("cfg", "phase"))
def rl_rollout_step_batched(tap_params, cg_params, batch: VideoBatch,
                            cfg: Config, phase: str, rng: Array):
    """SCST rollout (sampled + greedy baseline) vmapped over a [B]-video
    batch (net-new — the reference's SCST is broken AND per-video,
    train.py:241-245,303-308).  Row i consumes jax.random.split(rng, B)[i],
    the exact split rl_update_step_batched replays, so the update's forced
    re-decode reproduces the rollout's dropout masks and samples."""
    from echr_tpu.models.captioner import make_contexts
    from echr_tpu.models.decoder import decoder_sample

    batch = decompress_batch(batch)
    # vmapped greedy baseline: batched window-sort policy (the sampled
    # rollout never sorts — forced/categorical rng is row-positional)
    cfg = _vmapped_decode_cfg(cfg, batch.frame_mask.shape[-1])
    B = batch.feats.shape[0]
    rngs = jax.random.split(rng, B)
    tap_c, cg_c = _cast(tap_params, cfg), _cast(cg_params, cfg)

    if cfg.runtime.decode_early_exit_batched:
        # Batch-global early exit for BOTH rollout decodes (the no-grad
        # half of every SCST step; the update keeps its scan — while_loop
        # has no reverse rule).  SCST runs on stage-1-3-trained models
        # whose captions end at 8-15 of L=30 tokens, so the two 30-step
        # decode scans (~40% of the step, docs/BENCH_NOTES.md) shrink to
        # the batch's real longest caption.  Sampled tokens are
        # bit-identical to the scan form (per-step keys are derived by
        # step index from the same r_sample split), so the update replays
        # the same trajectories — pinned in test_decode_early_exit.py.
        from echr_tpu.models.decoder import decoder_sample_batched

        def prep(b, r):
            tap_l, _, ctxs, r_sample = _rl_prepare(
                tap_params, cg_params, cfg, b, phase, r)
            tap_feats_eval, _ = sst_forward(tap_c, b.feats, train=False)
            props, _, _ = _select_props(b, phase)
            ctxs_eval = make_contexts({"fusion": cg_c.get("fusion")}, cfg,
                                      tap_feats_eval, b.feats, b.lda, props,
                                      frame_mask=b.frame_mask, train=False)
            return tap_l, ctxs, r_sample, ctxs_eval

        tap_l, ctxs_b, r_sample_b, ctxs_eval_b = jax.vmap(prep)(batch, rngs)
        gen_seq, _, _ = decoder_sample_batched(
            cg_c["decoder"], cfg, ctxs_b, greedy=False, rngs=r_sample_b,
            train=True)
        greedy_seq, _, _ = decoder_sample_batched(
            cg_c["decoder"], cfg, ctxs_eval_b, greedy=True)
        return tap_l, gen_seq, greedy_seq

    def one(b, r):
        # early_exit=False like every vmapped pipeline: under vmap the
        # while_loop runs to the LAST-finishing row and just costs its
        # per-step condition (see decoder_sample)
        tap_l, _, gen_seq, _ = _rl_forward(
            tap_params, cg_params, cfg, b, phase, r, early_exit=False
        )
        tap_feats_eval, _ = sst_forward(tap_c, b.feats, train=False)
        props, _, _ = _select_props(b, phase)
        ctxs_eval = make_contexts({"fusion": cg_c.get("fusion")}, cfg,
                                  tap_feats_eval, b.feats, b.lda, props,
                                  frame_mask=b.frame_mask, train=False)
        greedy_seq, _, _ = decoder_sample(cg_c["decoder"], cfg, ctxs_eval,
                                          greedy=True, train=False,
                                          early_exit=False)
        return tap_l, gen_seq, greedy_seq

    return jax.vmap(one)(batch, rngs)


@functools.partial(jax.jit, static_argnames=("cfg", "phase"),
                   donate_argnames=("state",))  # reuse buffers like train_step
def rl_update_step_batched(state: TrainState, batch: VideoBatch, cfg: Config,
                           phase: str, rng: Array, gen_seq: Array,
                           reward: Array):
    """Policy-gradient update over a [B]-video batch: per-video reward
    losses mean-reduced exactly like train_step, one dual-Adam update."""
    batch = decompress_batch(batch)
    B = batch.feats.shape[0]
    opt = make_optimizer(cfg)

    def loss_fn(tap_params, cg_params):
        rngs = jax.random.split(rng, B)

        def one(b, r, gs, rw):
            tap_l, _, _, logps = _rl_forward(
                tap_params, cg_params, cfg, b, phase, r, forced=gs
            )
            pm = _select_props(b, phase)[0].prop_mask
            rl_l = losses.reward_loss(logps, gs, rw, prop_mask=pm)
            n_real = jnp.maximum(jnp.sum(pm), 1.0)
            return {
                "tap_loss": tap_l, "cg_loss": rl_l,
                "total_loss": cfg.train.lambda1 * tap_l + cfg.train.lambda2 * rl_l,
                # mean reward over REAL proposals (padded rows carry 0)
                "avg_reward": jnp.sum(rw[:, 0] * pm) / n_real,
            }

        m = jax.vmap(one)(batch, rngs, gen_seq, reward)
        m = jax.tree.map(lambda x: jnp.mean(x), m)
        return _phase_loss(m, phase, cfg), m

    (loss, metrics), (tap_g, cg_g) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.tap_params, state.cg_params)

    new_state = state
    if phase in ("tap_cg", "gt_tap_cg"):
        upd, tap_opt = opt.update(tap_g, state.tap_opt, state.tap_params)
        new_state = new_state._replace(
            tap_params=optax.apply_updates(state.tap_params, upd), tap_opt=tap_opt
        )
    upd, cg_opt = opt.update(cg_g, new_state.cg_opt, new_state.cg_params)
    new_state = new_state._replace(
        cg_params=optax.apply_updates(new_state.cg_params, upd), cg_opt=cg_opt,
        step=state.step + 1,
    )
    metrics["loss"] = loss
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "phase"),
                   donate_argnames=("state",))  # reuse buffers like train_step
def rl_update_step(state: TrainState, batch: VideoBatch, cfg: Config, phase: str,
                   rng: Array, gen_seq: Array, reward: Array):
    """Policy-gradient update on the replayed rollout."""
    batch = decompress_batch(batch)
    opt = make_optimizer(cfg)

    def loss_fn(tap_params, cg_params):
        tap_l, _, _, logps = _rl_forward(
            tap_params, cg_params, cfg, batch, phase, rng, forced=gen_seq
        )
        pm = _select_props(batch, phase)[0].prop_mask
        rl_l = losses.reward_loss(logps, gen_seq, reward, prop_mask=pm)
        n_real = jnp.maximum(jnp.sum(pm), 1.0)
        metrics = {"tap_loss": tap_l, "cg_loss": rl_l,
                   "total_loss": cfg.train.lambda1 * tap_l + cfg.train.lambda2 * rl_l,
                   # mean reward over REAL proposals (padded rows carry 0)
                   "avg_reward": jnp.sum(reward[:, 0] * pm) / n_real}
        return _phase_loss(metrics, phase, cfg), metrics

    (loss, metrics), (tap_g, cg_g) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.tap_params, state.cg_params)

    new_state = state
    if phase in ("tap_cg", "gt_tap_cg"):
        upd, tap_opt = opt.update(tap_g, state.tap_opt, state.tap_params)
        new_state = new_state._replace(
            tap_params=optax.apply_updates(state.tap_params, upd), tap_opt=tap_opt
        )
    upd, cg_opt = opt.update(cg_g, new_state.cg_opt, new_state.cg_params)
    new_state = new_state._replace(
        cg_params=optax.apply_updates(new_state.cg_params, upd), cg_opt=cg_opt,
        step=state.step + 1,
    )
    metrics["loss"] = loss
    return new_state, metrics


# ---------------------------------------------------------------------------
# Resident-VJP SCST (net-new; VERDICT r3 weak-6 follow-through)
#
# The two-program SCST structure (rollout jit -> host METEOR reward ->
# update jit) forces the update to re-run the rollout's forward as a
# teacher-forced replay before its backward — jax.checkpoint-style remat
# across the host boundary, ~13 ms of the 65 ms step at B=8 flagship dims
# (docs/BENCH_NOTES.md "SCST device-path decomposition").  Host callbacks
# hang through the axon relay (same doc), so a single program is out; but
# the residuals themselves can stay device-resident: run the SAMPLED decode
# under jax.vjp (token draws are integer outputs with zero tangent, so the
# gradient equals the forced replay's exactly), export the vjp closure's
# residual arrays with jax.closure_convert as rollout outputs, and hand
# them — never fetched to host — to a pullback+Adam update program.
#
# The update re-traces the same forward at the same avals to recover the
# SAME converted jaxpr (tracing is deterministic), discards its traced
# residuals (dead code — XLA DCE removes the forward), and applies the
# converted pullback to the rollout's residuals.  A trace-time shape/dtype
# check fails loudly if the two traces ever diverge.
# ---------------------------------------------------------------------------


def _rl_vjp_fwd(tap_params, cg_params, cfg: Config, phase: str,
                batch: VideoBatch, rng: Array):
    """The differentiable half of the batched SCST rollout: vmapped
    train-mode sampled decode (dropout + categorical draws exactly as
    rl_rollout_step_batched row i).  Traced identically by the rollout
    (under jax.vjp, residuals exported) and the update (dead re-trace,
    DCE'd) — any edit here changes BOTH traces together, which is what
    keeps the residual layout contract intact."""
    batch = decompress_batch(batch)
    B = batch.feats.shape[0]
    rngs = jax.random.split(rng, B)

    def one(b, r):
        tap_l, _, gen_seq, logps = _rl_forward(
            tap_params, cg_params, cfg, b, phase, r, early_exit=False
        )
        return tap_l, logps, gen_seq

    tap_l, logps, gen_seq = jax.vmap(one)(batch, rngs)
    return (tap_l, logps), gen_seq


def _rl_vjp_pair(tap_params, cg_params, cfg: Config, phase: str,
                 batch: VideoBatch, rng: Array):
    """(primals, converted pullback, residual arrays, gen_seq) for the
    sampled rollout — shared by both programs below."""
    def f(tp, cp):
        return _rl_vjp_fwd(tp, cp, cfg, phase, batch, rng)

    (tap_l, logps), f_vjp, gen_seq = jax.vjp(f, tap_params, cg_params,
                                             has_aux=True)
    ct_example = (jnp.zeros_like(tap_l), jnp.zeros_like(logps))
    converted, res = jax.closure_convert(f_vjp, ct_example)
    return (tap_l, logps), converted, res, gen_seq


@functools.partial(jax.jit, static_argnames=("cfg", "phase"))
def rl_rollout_vjp_step_batched(tap_params, cg_params, batch: VideoBatch,
                                cfg: Config, phase: str, rng: Array):
    """rl_rollout_step_batched + device-resident VJP residuals.

    Returns (tap_l [B], logps [B, N, L], gen_seq, greedy_seq, res): identical
    sampled rollout and greedy baseline to the two-program rollout (same
    per-row rng splits), plus the sampled pass's pullback residuals for
    rl_pullback_update_step_batched.  res never crosses to host."""
    (tap_l, logps), _, res, gen_seq = _rl_vjp_pair(
        tap_params, cg_params, cfg, phase, batch, rng
    )
    # greedy baseline: eval mode, no dropout — exactly rl_rollout_step_batched
    from echr_tpu.models.captioner import make_contexts
    from echr_tpu.models.decoder import decoder_sample

    batch_d = decompress_batch(batch)
    # vmapped greedy baseline: batched window-sort policy (the VJP'd
    # sampled forward above never sorts, so residual layout is untouched)
    cfg = _vmapped_decode_cfg(cfg, batch_d.frame_mask.shape[-1])
    tap_c, cg_c = _cast(tap_params, cfg), _cast(cg_params, cfg)

    def baseline(b):
        tap_feats_eval, _ = sst_forward(tap_c, b.feats, train=False)
        props, _, _ = _select_props(b, phase)
        ctxs_eval = make_contexts({"fusion": cg_c.get("fusion")}, cfg,
                                  tap_feats_eval, b.feats, b.lda, props,
                                  frame_mask=b.frame_mask, train=False)
        greedy_seq, _, _ = decoder_sample(cg_c["decoder"], cfg, ctxs_eval,
                                          greedy=True, train=False,
                                          early_exit=False)
        return greedy_seq

    greedy_seq = jax.vmap(baseline)(batch_d)
    return tap_l, logps, gen_seq, greedy_seq, tuple(res)


@functools.partial(jax.jit, static_argnames=("cfg", "phase"),
                   donate_argnames=("state", "res"))
def rl_pullback_update_step_batched(state: TrainState, batch: VideoBatch,
                                    cfg: Config, phase: str, rng: Array,
                                    gen_seq: Array, reward: Array,
                                    tap_l: Array, logps: Array, res):
    """Policy-gradient update from resident rollout residuals: loss-head
    cotangents (jax.grad over the tiny reward/tap loss head — exact for any
    head, no linearity assumption) -> converted pullback -> dual Adam.
    Identical update math to rl_update_step_batched minus its re-decode
    forward; the re-trace needed to rebuild the pullback structure is dead
    code (its outputs are unused) and is removed by XLA DCE."""
    _, converted, res_dead, _ = _rl_vjp_pair(
        state.tap_params, state.cg_params, cfg, phase, batch, rng
    )
    got = [(r.shape, r.dtype) for r in res]
    want = [(r.shape, r.dtype) for r in res_dead]
    if got != want:
        raise RuntimeError(
            "resident-vjp SCST: the update's re-trace produced a different "
            f"residual layout than the rollout ({len(want)} arrays {want[:4]}... "
            f"vs {len(got)} {got[:4]}...) — the two traces diverged; disable "
            "runtime.scst_resident_vjp or align the traces"
        )
    batch_d = decompress_batch(batch)

    def head(tap_l_v, logps_v):
        def one(tl, lp, b, gs, rw):
            pm = _select_props(b, phase)[0].prop_mask
            rl_l = losses.reward_loss(lp, gs, rw, prop_mask=pm)
            n_real = jnp.maximum(jnp.sum(pm), 1.0)
            return {
                "tap_loss": tl, "cg_loss": rl_l,
                "total_loss": cfg.train.lambda1 * tl + cfg.train.lambda2 * rl_l,
                "avg_reward": jnp.sum(rw[:, 0] * pm) / n_real,
            }

        m = jax.vmap(one)(tap_l_v, logps_v, batch_d, gen_seq, reward)
        m = jax.tree.map(lambda x: jnp.mean(x), m)
        return _phase_loss(m, phase, cfg), m

    (loss, metrics), (ct_tap, ct_logps) = jax.value_and_grad(
        head, argnums=(0, 1), has_aux=True
    )(tap_l, logps)
    tap_g, cg_g = converted((ct_tap, ct_logps), *res)

    opt = make_optimizer(cfg)
    new_state = state
    if phase in ("tap_cg", "gt_tap_cg"):
        upd, tap_opt = opt.update(tap_g, state.tap_opt, state.tap_params)
        new_state = new_state._replace(
            tap_params=optax.apply_updates(state.tap_params, upd), tap_opt=tap_opt
        )
    upd, cg_opt = opt.update(cg_g, new_state.cg_opt, new_state.cg_params)
    new_state = new_state._replace(
        cg_params=optax.apply_updates(new_state.cg_params, upd), cg_opt=cg_opt,
        step=state.step + 1,
    )
    metrics["loss"] = loss
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_step(tap_params, batch: VideoBatch, cfg: Config):
    """Eval-mode SST encode for one video (no batch axis)."""
    return sst_forward(_cast(tap_params, cfg), batch.feats, train=False)


@functools.partial(jax.jit, static_argnames=("cfg", "phase"))
def val_loss_step(
    tap_params, cg_params, batch: VideoBatch, cfg: Config, phase: str = "tap_cg"
) -> Dict[str, Array]:
    """Eval-mode losses for one video (reference: eval_utils.py:139-155)."""
    return _one_video_losses(_cast(tap_params, cfg), _cast(cg_params, cfg), cfg,
                             batch, phase, None, False, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg", "phase"))
def val_loss_step_batched(
    tap_params, cg_params, batch: VideoBatch, cfg: Config, phase: str = "tap_cg"
) -> Dict[str, Array]:
    """Eval-mode losses for a [B, ...] video batch (vmapped
    _one_video_losses) — gives the fast eval pipeline the same val-loss
    bookkeeping as eval_split (reference: eval_utils.py:139-155)."""
    tp, cp = _cast(tap_params, cfg), _cast(cg_params, cfg)
    return jax.vmap(
        lambda b: _one_video_losses(tp, cp, cfg, b, phase, None, False, 0.0)
    )(batch)


@functools.partial(jax.jit, static_argnames=("topN", "nb"))
def select_topk_batched(
    pred_props: Array,  # [B, T, K] sigmoid scores
    n_frames: Array,  # [B] valid frame counts
    topN: int,
    nb: int,  # static output slots (>= host bucket cap)
    val_score_thres: float = 0.0,
):
    """Device-side vectorized `gettop1000` — selection-identical to
    engine.proposals.top_proposals (reference: eval_utils.py:259-287),
    including its quirks: threshold = topN-th largest masked score of the
    [n_frames, K] grid, selection = every anchor >= max(threshold,
    val_score_thres) with the t >= k guard (which re-admits zero-score
    anchors when the threshold is 0), row-major (t, k) order, truncated to
    nb slots.  Pass nb = the proposal-bucket CEILING (PROP_BUCKETS[-1]),
    not _prop_bucket(topN): threshold ties can push the count past topN,
    and the DECODE (tap_cg) host path truncates at _prop_bucket(max_n) <=
    ceiling — with nb = ceiling the device truncation is identical for
    every decode path.  For flag_eval_what='tap' the host path emits the
    full UNBOUNDED selection (no bucket truncation), so a >nb tie storm
    would lose proposals; 'tap' callers therefore use the two-pass
    contract (round 4): trust this selection when count <= nb and fall
    back to fetching the [T, K] grid only when count overflows — see
    eval_split_batched.stage_b and eval_split's device_select path in
    engine/evaluate.py (equality vs the host path pinned in
    tests/test_device_select.py).
    Returns (flat_idx [B, nb] into the [T, K] grid with T*K fill,
    count [B], confidence [B, nb]) — a ~256 KB fetch instead of the
    [B, T, K] score grid."""
    B, T, K = pred_props.shape
    t = jnp.arange(T)[:, None]
    k = jnp.arange(K)[None, :]
    amask = (k < jnp.minimum(K, t)).astype(pred_props.dtype)  # anchor_mask

    def one(pp, nf):
        valid_t = (jnp.arange(T) < nf)[:, None]
        masked = pp * amask * valid_t
        flat = masked.reshape(-1)
        # scores are sigmoid >= 0 and frames >= nf are zeroed, so the
        # topN-th largest over T*K equals the host's over nf*K (extra
        # zeros only displace zeros)
        thr = jnp.maximum(jax.lax.top_k(flat, min(topN, T * K))[0][-1],
                          val_score_thres)
        sel = (masked >= thr) & (t >= k) & valid_t
        idx = jnp.nonzero(sel.reshape(-1), size=nb, fill_value=T * K)[0]
        conf = jnp.where(idx < T * K, flat[jnp.minimum(idx, T * K - 1)], 0.0)
        return idx.astype(jnp.int32), jnp.sum(sel).astype(jnp.int32), conf

    return jax.vmap(one)(pred_props, n_frames)


def unpack_topk_selection(idx_row, count, nb: int, K: int, n_frames: int,
                          duration: float, featstamp_to_time, conf_row):
    """Host-side decode of one video's select_topk_batched row into the
    (ind, soi, timestamps, confidence) lists the eval/serving paths use —
    the single place that knows the flat row-major (t*K + k) layout.
    Timestamp conversion is vectorized (labels.featstamps_to_times); the
    `featstamp_to_time` arg is kept for signature stability but unused."""
    import numpy as np

    from echr_tpu.data.labels import featstamps_to_times

    n = int(min(count, nb))
    flat = np.asarray(idx_row)[:n].astype(np.int64)
    tt, kk = flat // K, flat % K
    ind = tt.tolist()
    soi_np = np.stack([tt - kk, tt + 1], axis=1)
    ts = featstamps_to_times(soi_np, n_frames, duration).tolist()
    tp = np.asarray(conf_row)[:n].astype(float).tolist()
    return ind, soi_np.tolist(), ts, tp


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_step_batched(tap_params, feats: Array, cfg: Config):
    """Eval-mode SST encode over a [B, T, D] video batch — B videos fill the
    MXU sublanes that a single video leaves idle."""
    from echr_tpu.models.sst import sst_forward_batched

    return sst_forward_batched(_cast(tap_params, cfg), feats, train=False)


@functools.partial(jax.jit, static_argnames=("cfg", "greedy"))
def decode_step_batched(
    cg_params,
    cfg: Config,
    tap_feats: Array,  # [B, T, H]
    feats: Array,  # [B, T, D]
    lda: Array,  # [B, lda_dim]
    frame_mask: Array,  # [B, T]
    props: ProposalBatch,  # leaves with leading [B]
    greedy: bool = True,
    temperature: float = 1.0,
    rng: Optional[Array] = None,
):
    """Decode B videos' proposals in one program (vmapped captioner).

    PER-VIDEO early exit is forced off: under vmap the while_loop would run
    until the LAST unfinished caption of the whole batch, so it almost never
    fires on real data while costing ~12% vs scan (docs/BENCH_NOTES.md).
    Both greedy rng-free calls (every eval/serving decode) and multinomial
    calls (sample_max=0 eval) instead route through decoder_sample_batched —
    ONE batch-global while_loop (vmap inside the loop body, not around it)
    whose exit condition is "every video in the batch finished", the
    reference's break-when-all-finished (OldModel_NEW.py:173-181) at batch
    scope.  Exact same outputs — the multinomial form's per-step keys are
    derived by step index, so its draws match the scan's bit-for-bit; gated
    by runtime.decode_early_exit_batched."""
    cfg = _vmapped_decode_cfg(cfg, frame_mask.shape[-1])
    cg_c = _cast(cg_params, cfg)
    B = tap_feats.shape[0]

    early = cfg.runtime.decode_early_exit_batched and (
        (greedy and rng is None) or (not greedy and rng is not None))
    if early:
        from echr_tpu.models.captioner import make_contexts
        from echr_tpu.models.decoder import decoder_sample_batched

        rngs_dec = None
        if rng is not None:
            # the scan path's captioner_sample splits each video's key into
            # (r_ctx, r_dec) and eval-mode contexts consume nothing — feed
            # the decoder the same r_dec rows for bit-identical draws
            rngs_dec = jax.vmap(
                lambda r: jax.random.split(r)[1])(jax.random.split(rng, B))

        def mk(th, f, l, fm, pr):
            return make_contexts(cg_c, cfg, th, f, l, pr, frame_mask=fm,
                                 train=False)

        ctxs_b = jax.vmap(mk)(tap_feats, feats, lda, frame_mask, props)
        return decoder_sample_batched(cg_c["decoder"], cfg, ctxs_b,
                                      greedy=greedy, temperature=temperature,
                                      rngs=rngs_dec)

    rngs = jax.random.split(rng, B) if rng is not None else None

    def one(th, f, l, fm, pr, r=None):
        # stream_head=False like early_exit: the pallas head call must sit
        # OUTSIDE a vmap (decoder_sample_batched flattens B*N rows instead)
        return captioner_sample(
            cg_c, cfg, th, f, l, pr, frame_mask=fm, greedy=greedy,
            temperature=temperature, rng=r, early_exit=False,
            stream_head=False,
        )

    if rngs is None:
        return jax.vmap(one)(tap_feats, feats, lda, frame_mask, props)
    return jax.vmap(one)(tap_feats, feats, lda, frame_mask, props, rngs)


@functools.partial(jax.jit, static_argnames=("cfg", "beam_size", "length_alpha"))
def beam_decode_step_batched(
    cg_params,
    cfg: Config,
    tap_feats: Array,  # [B, T, H]
    feats: Array,  # [B, T, D]
    lda: Array,  # [B, lda_dim]
    frame_mask: Array,  # [B, T]
    props: ProposalBatch,  # leaves with leading [B]
    beam_size: int,
    length_alpha: float = 0.0,
):
    """Beam decode B videos per program (vmapped beam search).

    PER-VIDEO early exit is off under vmap (see decode_step_batched); the
    batch-global while_loop form (models.beam.beam_search_batched) routes
    here instead when runtime.decode_early_exit_batched — beam search is
    deterministic/rng-free so every batched beam call qualifies."""
    from echr_tpu.models.beam import beam_search, beam_search_batched
    from echr_tpu.models.captioner import make_contexts

    cfg = _vmapped_decode_cfg(cfg, frame_mask.shape[-1])
    cg_c = _cast(cg_params, cfg)

    if cfg.runtime.decode_early_exit_batched:
        def mk(th, f, l, fm, pr):
            return make_contexts(cg_c, cfg, th, f, l, pr, frame_mask=fm,
                                 train=False)

        ctxs_b = jax.vmap(mk)(tap_feats, feats, lda, frame_mask, props)
        res = beam_search_batched(cg_c["decoder"], cfg, ctxs_b, beam_size,
                                  length_alpha)
        return res.seq, res.logprob

    def one(th, f, l, fm, pr):
        ctxs = make_contexts(cg_c, cfg, th, f, l, pr, frame_mask=fm, train=False)
        # early_exit off under vmap (see decode_step_batched)
        res = beam_search(cg_c["decoder"], cfg, ctxs, beam_size, length_alpha,
                          early_exit=False)
        return res.seq, res.logprob

    return jax.vmap(one)(tap_feats, feats, lda, frame_mask, props)


class EvalSteps(NamedTuple):
    """The batched eval step functions with mesh routing resolved — one
    place decides auto vs shard_map so call sites can't drift (see
    eval_steps_for)."""

    encode: Any  # (tap_params, feats, cfg)
    select_topk: Any  # (pred_props, n_frames, topN=, nb=, val_score_thres=)
    val_loss: Any  # (tap_params, cg_params, batch, cfg, phase=)
    decode: Any  # (cg_params, cfg, tap_feats, feats, lda, fm, props, ...)
    beam: Any  # (cg_params, cfg, tap_feats, feats, lda, fm, props, beam_size, ...)
    shard_mapped: bool


def eval_steps_for(cfg: Config, mesh) -> EvalSteps:
    """Resolve the batched eval/serving steps for (cfg, mesh).

    runtime.spmd_mode="shard_map" on a dp-only mesh binds the explicit
    per-device variants (mesh pre-applied — Pallas kernels fire at local
    shapes); anything else returns the auto-partitioned steps with
    identical signatures.  The single router for eval_split_batched AND
    serve.CaptionService, so every step takes the same route."""
    use_sm = (mesh is not None and cfg.runtime.spmd_mode == "shard_map"
              and mesh.shape["model"] == 1)
    if not use_sm:
        return EvalSteps(encode_step_batched, select_topk_batched,
                         val_loss_step_batched, decode_step_batched,
                         beam_decode_step_batched, False)
    bind = functools.partial(functools.partial, mesh=mesh)
    return EvalSteps(
        bind(encode_step_batched_shard_map),
        bind(select_topk_batched_shard_map),
        bind(val_loss_step_batched_shard_map),
        bind(decode_step_batched_shard_map),
        bind(beam_decode_step_batched_shard_map),
        True,
    )


# --- explicit-SPMD (shard_map) variants of the batched eval steps -------
#
# runtime.spmd_mode="shard_map" under a dp mesh: every batched eval step
# becomes an explicit per-device program over its LOCAL video rows (rows
# are independent — no collectives at all), instead of one global program
# the GSPMD partitioner slices.  Outputs are identical to the auto
# variants (same per-row math, same per-row rng), but Pallas kernels
# (runtime.use_pallas decode attention) fire inside the mesh: to the
# partitioner a pallas_call is an opaque custom call it would otherwise
# replicate (docs/TODO.md "Open questions").  dp-only — eval params are
# replicated, so there is no tensor-parallel eval to lose.  The batch
# axis must be a multiple of mesh.shape["data"] (eval_split_batched pads
# every group to one).


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def encode_step_batched_shard_map(tap_params, feats: Array, cfg: Config, mesh):
    """encode_step_batched as an explicit per-device program (rows local)."""
    from jax.sharding import PartitionSpec as P

    from echr_tpu.models.sst import sst_forward_batched

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    def run(tp, f):
        return sst_forward_batched(_cast(tp, cfg), f, train=False)

    return run(tap_params, feats)


@functools.partial(
    jax.jit, static_argnames=("topN", "nb", "mesh"))
def select_topk_batched_shard_map(
    pred_props: Array, n_frames: Array, topN: int, nb: int, mesh,
    val_score_thres: float = 0.0,
):
    """select_topk_batched with each device selecting over its local rows."""
    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False,
    )
    def run(pp, nf):
        return select_topk_batched(pp, nf, topN=topN, nb=nb,
                                   val_score_thres=val_score_thres)

    return run(pred_props, n_frames)


@functools.partial(jax.jit, static_argnames=("cfg", "phase", "mesh"))
def val_loss_step_batched_shard_map(
    tap_params, cg_params, batch: VideoBatch, cfg: Config, mesh,
    phase: str = "tap_cg",
) -> Dict[str, Array]:
    """val_loss_step_batched over local rows (per-video [B] loss leaves)."""
    from jax.sharding import PartitionSpec as P

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), jax.tree.map(lambda _: P("data"), batch)),
        out_specs=P("data"), check_vma=False,
    )
    def run(tp, cp, local):
        tpc, cpc = _cast(tp, cfg), _cast(cp, cfg)
        return jax.vmap(
            lambda b: _one_video_losses(tpc, cpc, cfg, b, phase, None, False, 0.0)
        )(local)

    return run(tap_params, cg_params, batch)


@functools.partial(jax.jit, static_argnames=("cfg", "greedy", "mesh"))
def decode_step_batched_shard_map(
    cg_params,
    cfg: Config,
    tap_feats: Array,
    feats: Array,
    lda: Array,
    frame_mask: Array,
    props: ProposalBatch,
    mesh,
    greedy: bool = True,
    temperature: float = 1.0,
    rng: Optional[Array] = None,
):
    """decode_step_batched over local rows.  Row i's rng draw is
    split(rng, B_global)[i] exactly like the auto variant (the split
    happens at the global level, the [B] key array is then row-sharded),
    so multinomial sampling is trajectory-identical across spmd modes."""
    from jax.sharding import PartitionSpec as P

    cfg = _vmapped_decode_cfg(cfg, frame_mask.shape[-1])
    B = tap_feats.shape[0]
    rngs = jax.random.split(rng, B) if rng is not None else None
    prop_specs = jax.tree.map(lambda _: P("data"), props)

    def body(cp, th, f, l, fm, pr, r=None):
        cg_c = _cast(cp, cfg)

        early = cfg.runtime.decode_early_exit_batched and (
            (greedy and r is None) or (not greedy and r is not None))
        if early:
            # Per-DEVICE batch-global early exit (see decode_step_batched):
            # each device's while_loop exits when its own rows finish; no
            # collectives inside these eval steps, so uneven local trip
            # counts across devices are fine.  Multinomial rows feed the
            # decoder the same r_dec = split(key)[1] the scan form's
            # captioner_sample derives, so draws stay bit-identical.
            from echr_tpu.models.captioner import make_contexts
            from echr_tpu.models.decoder import decoder_sample_batched

            rngs_dec = None
            if r is not None:
                rngs_dec = jax.vmap(lambda rr: jax.random.split(rr)[1])(r)

            def mk(th1, f1, l1, fm1, pr1):
                return make_contexts(cg_c, cfg, th1, f1, l1, pr1,
                                     frame_mask=fm1, train=False)

            ctxs_b = jax.vmap(mk)(th, f, l, fm, pr)
            return decoder_sample_batched(cg_c["decoder"], cfg, ctxs_b,
                                          greedy=greedy,
                                          temperature=temperature,
                                          rngs=rngs_dec)

        def one(th1, f1, l1, fm1, pr1, r1=None):
            return captioner_sample(
                cg_c, cfg, th1, f1, l1, pr1, frame_mask=fm1, greedy=greedy,
                temperature=temperature, rng=r1, early_exit=False,
                stream_head=False,  # no pallas_call under vmap (see above)
            )

        if r is None:
            return jax.vmap(one)(th, f, l, fm, pr)
        return jax.vmap(one)(th, f, l, fm, pr, r)

    data_specs = (P(), P("data"), P("data"), P("data"), P("data"), prop_specs)
    if rngs is None:
        run = jax.shard_map(body, mesh=mesh, in_specs=data_specs,
                            out_specs=P("data"), check_vma=False)
        return run(cg_params, tap_feats, feats, lda, frame_mask, props)
    run = jax.shard_map(body, mesh=mesh, in_specs=data_specs + (P("data"),),
                        out_specs=P("data"), check_vma=False)
    return run(cg_params, tap_feats, feats, lda, frame_mask, props, rngs)


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "length_alpha", "mesh"))
def beam_decode_step_batched_shard_map(
    cg_params,
    cfg: Config,
    tap_feats: Array,
    feats: Array,
    lda: Array,
    frame_mask: Array,
    props: ProposalBatch,
    beam_size: int,
    mesh,
    length_alpha: float = 0.0,
):
    """beam_decode_step_batched over local rows."""
    from jax.sharding import PartitionSpec as P

    from echr_tpu.models.beam import beam_search, beam_search_batched
    from echr_tpu.models.captioner import make_contexts

    cfg = _vmapped_decode_cfg(cfg, frame_mask.shape[-1])
    prop_specs = jax.tree.map(lambda _: P("data"), props)

    def body(cp, th, f, l, fm, pr):
        cg_c = _cast(cp, cfg)

        if cfg.runtime.decode_early_exit_batched:
            # per-DEVICE batch-global early exit (see
            # decode_step_batched_shard_map): no collectives in these eval
            # steps, so uneven local trip counts across devices are fine
            def mk(th1, f1, l1, fm1, pr1):
                return make_contexts(cg_c, cfg, th1, f1, l1, pr1,
                                     frame_mask=fm1, train=False)

            ctxs_b = jax.vmap(mk)(th, f, l, fm, pr)
            res = beam_search_batched(cg_c["decoder"], cfg, ctxs_b,
                                      beam_size, length_alpha)
            return res.seq, res.logprob

        def one(th1, f1, l1, fm1, pr1):
            ctxs = make_contexts(cg_c, cfg, th1, f1, l1, pr1,
                                 frame_mask=fm1, train=False)
            res = beam_search(cg_c["decoder"], cfg, ctxs, beam_size,
                              length_alpha, early_exit=False)
            return res.seq, res.logprob

        return jax.vmap(one)(th, f, l, fm, pr)

    run = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), prop_specs),
        out_specs=P("data"), check_vma=False,
    )
    return run(cg_params, tap_feats, feats, lda, frame_mask, props)


@functools.partial(jax.jit, static_argnames=("cfg", "beam_size", "length_alpha"))
def beam_decode_step(
    cg_params,
    cfg: Config,
    tap_feats: Array,
    feats: Array,
    lda: Array,
    frame_mask: Array,
    props: ProposalBatch,
    beam_size: int,
    length_alpha: float = 0.0,
):
    """Beam-search decode of all proposals of one video (net-new; the
    reference only stubs beam search, OldModel_NEW.py:144-146)."""
    from echr_tpu.models.beam import beam_search
    from echr_tpu.models.captioner import make_contexts

    cg_c = _cast(cg_params, cfg)
    ctxs = make_contexts(cg_c, cfg, tap_feats, feats, lda, props,
                         frame_mask=frame_mask, train=False)
    res = beam_search(cg_c["decoder"], cfg, ctxs, beam_size, length_alpha)
    return res.seq, res.logprob


@functools.partial(jax.jit, static_argnames=("cfg", "greedy"))
def decode_step(
    cg_params,
    cfg: Config,
    tap_feats: Array,
    feats: Array,
    lda: Array,
    frame_mask: Array,
    props: ProposalBatch,
    greedy: bool = True,
    temperature: float = 1.0,
    rng: Optional[Array] = None,
):
    """Eval-mode decode of all proposals of one video.  greedy=False is the
    reference's sample_max=0 multinomial path at `temperature`
    (OldModel.sample :157-167); rng seeds the categorical draws."""
    return captioner_sample(
        _cast(cg_params, cfg), cfg, tap_feats, feats, lda, props,
        frame_mask=frame_mask, greedy=greedy, temperature=temperature, rng=rng,
    )
