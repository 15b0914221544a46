"""Typed configuration tree for echr_tpu.

Mirrors the reference flag surface (reference: opts.py:3-294) so the
published 3-stage experiment scripts translate 1:1, but as immutable
dataclasses instead of a mutable argparse namespace.  Derived dimensions
(the reference mutates `opt` at runtime, CaptionGenerator.py:56-84) are
computed by pure helpers here instead.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# Sub-configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths and label-synthesis knobs (reference: opts.py:17-65,90-106)."""

    dataset: str = "ActivityNet"
    video_json: str = "data/video_data_with_annotation.json"
    input_c3d_dir2: str = "data/c3d_npy"
    input_lda_path: str = "data/lda.h5"
    video_data_for_cg: str = "data/train_val_video_data.json"
    train_label_for_cg: str = "data/train_label_for_lm.h5"
    val_label_for_cg: str = "data/val_label_for_lm.h5"
    w1_json: str = "data/w1.json"
    SOTA_json: Optional[str] = None
    use_c3d_feature: bool = True
    use_2stream_feature: bool = False
    input_twostream_dir: str = "data/twostream"
    other_features: Tuple[str, ...] = ("lda",)
    lda_dim: int = 200
    shuffle: bool = True
    nthreads: int = 4
    # Prefetch-queue depth per split fetcher (reference BlobFetcher keeps a
    # small implicit buffer, dataloader.py:711-718).  Batched eval drains
    # batch_videos items per group in one burst, so pipelines that group
    # should run with depth >= 2*batch_videos or the consumer stalls on the
    # producer every group (see cli/eval and bench.py's e2e section).
    prefetch: int = 4
    dropsent_mode: str = "nodrop"  # nodrop | insert | truncate
    train_only: int = 0
    # --- TPU-native additions: static-shape bucketing ---
    # Videos are padded on the frame axis to the smallest bucket >= T so the
    # jitted step compiles once per bucket instead of once per video length.
    time_buckets: Tuple[int, ...] = (64, 128, 192, 256, 384, 512, 768, 1024)
    # Synthetic-data fallback (no ActivityNet assets in CI): see data/synthetic.py
    synthetic: bool = False
    synthetic_num_videos: int = 64
    synthetic_vocab_size: int = 3000
    synthetic_seq_length: int = 30
    synthetic_learnable: bool = False  # pattern-derived captions (learnable)
    # LRU cache of generated synthetic examples (entries; 0 disables).
    # get_example(ix) is deterministic, so repeat epochs can reuse the
    # ~2.5 ms/video feature synthesis — the synthetic analogue of the OS
    # page cache a real dataset's .npy re-reads get.  ~0.5 MB/entry at
    # flagship dims; hits return defensive copies (batcher paths may
    # mutate caption lists in place, e.g. dropsent insert/truncate).
    synthetic_cache_videos: int = 256

    @property
    def use_lda(self) -> bool:
        # reference: opts.py:282
        return "lda" in self.other_features


@dataclass(frozen=True)
class TAPConfig:
    """SST temporal-action-proposal model (reference: opts.py:69-101, sst_model.py)."""

    tap_model: str = "SST"
    tap_rnn_type: str = "LSTM"
    rnn_num_layers: int = 2
    rnn_dropout: float = 0.5
    video_dim: int = 500
    raw_input_dim: int = 10240
    reduce_input_dim_layer: int = 0
    hidden_dim: int = 512
    K: int = 256
    prop_sample_num: int = 64
    iou_threshold: float = 0.5
    iou_threshold_for_good_proposal: float = 0.8


@dataclass(frozen=True)
class FusionConfig:
    """TSRM cross-event relation attention (reference: opts.py:109-131)."""

    fusion_model: str = "TSRM8"
    use_posit: bool = True
    n_head: int = 16
    d_feats: int = 512
    d_o: int = 512
    fST_type: str = "fST0"  # fST0 multiply | fST1 add | fST2 log-add | fST3 pos-only


@dataclass(frozen=True)
class ContextConfig:
    """Hierarchical context composition strings (reference: opts.py:121-131)."""

    video_context_type: str = "VL+VC+VH"
    event_context_type: str = "EL+EC+EH+ER1+ER2+ER3"
    clip_context_type: str = "CC+CH"
    CG_input_feats_type: str = ""
    CG_init_feats_type: str = ""


@dataclass(frozen=True)
class DecoderConfig:
    """Caption generator (reference: opts.py:139-161)."""

    caption_model: str = "show_attend_tell"  # show_attend_tell | three_stream | ...
    CG_rnn_size: int = 512
    CG_num_layers: int = 1
    CG_rnn_type: str = "lstm"
    CG_input_encoding_size: int = 512
    CG_att_hid_size: int = 512
    CG_fc_feat_size: int = 512
    CG_drop_prob: float = 0.5
    # Filled from the dataset at build time (reference: train.py:152-153).
    CG_vocab_size: int = 0
    CG_seq_length: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule / curriculum (reference: opts.py:178-240)."""

    training_mode: str = "pre_tap+cotrain"
    tap_epochs: int = 3
    cg_epochs: int = 0
    tapcg_epochs: int = 20
    batch_size: int = 1
    m_batch: int = 1
    lr: float = 5e-5
    lambda1: float = 0.01
    lambda2: float = 1.0
    grad_clip: float = 100.0
    optim: str = "adam"
    optim_alpha: float = 0.9
    optim_beta: float = 0.999
    optim_epsilon: float = 1e-8
    weight_decay: float = 0.0
    scheduled_sampling_start: int = -1
    scheduled_sampling_increase_every: int = 5
    scheduled_sampling_increase_prob: float = 0.05
    scheduled_sampling_max_prob: float = 0.25
    learning_rate_decay_start: float = 8
    learning_rate_decay_every: float = 3
    learning_rate_decay_rate: float = 0.5
    self_critical_after: int = -1
    meteor_reward_weight: float = 1.0
    reverse_w0: bool = False
    seed: int = 0


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation options (reference: opts.py:259-278, eval.py:96-147)."""

    language_eval: bool = True
    num_vids_eval: int = 0
    beam_size: int = 1
    # sample_max=1 -> greedy argmax decode; 0 -> multinomial sampling at
    # `temperature` (reference: OldModel.sample :141-167, eval.py:119-125)
    sample_max: int = 1
    temperature: float = 1.0
    # GNMT length penalty exponent for beam ranking (net-new: the reference
    # only stubs beam search).  1.0 counters sum-logprob's short-caption
    # bias; 0.0 = raw sum-logprob ranking.
    beam_length_alpha: float = 1.0
    fast_eval_cg: bool = False
    topN: int = 1000
    val_score_thres: float = 0.0
    nms_threshold: float = 0.0
    reranking: bool = False
    val_all_metrics: bool = False
    references: Tuple[str, ...] = ()
    # >1 routes the in-training checkpoint-gating eval through
    # eval_split_batched with this many videos per device program
    # (prediction- and loss-identical to the per-video path, which remains
    # the 0/1 fallback; net-new vs the reference's one-video eval loop,
    # eval_utils.py:38)
    batch_videos: int = 8
    # Device-side top-N proposal selection (steps.select_topk_batched) for
    # the tap/tap_cg no-NMS paths: fetches [nb] indices instead of the
    # [T, K] score grid.  Selection-identical to the host path ('tap'
    # falls back to the host grid per video when the threshold-tie count
    # overflows the device slot cap, so its unbounded output is preserved).
    # False = always host selection (parity testing / non-TPU platforms).
    device_select: bool = True
    # Dispatched-but-uncollected device batches the batched eval pipeline
    # keeps in flight (hides decode round trips behind host work; raise on
    # high-latency links like the axon relay).
    eval_inflight: int = 3
    # Paths to METEOR 1.5 matcher data assets (jar-style formats, see
    # metrics/matchers.py).  Empty = exact+stem only (the oracle-pinned
    # default; the jar's WordNet/paraphrase assets are absent in this
    # environment).  Set both to enable the jar's full module stack
    # (reference: external_tool/densevid_eval/evaluate.py:16,61).
    meteor_synonyms: str = ""
    meteor_paraphrases: str = ""


@dataclass(frozen=True)
class SaveConfig:
    """Checkpointing / logging (reference: opts.py:244-255)."""

    checkpoint_path: str = "save"
    losses_log_every: int = 2000
    save_checkpoint_every: int = 10000
    save_all_checkpoint: bool = False
    min_epoch_when_save: int = -1
    start_from: Optional[str] = None
    start_from_mode: str = "last"
    no_exclude_opt: bool = False
    pretrain: str = ""
    pretrain_path: str = ""


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU-native runtime knobs — net-new vs the reference (single-GPU torch)."""

    # Compute dtype for matmuls/activations. Parity gates run "float32";
    # production runs "bfloat16" (fp32 accumulation is always used for
    # softmax/logits/losses).
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Host->device dtype for the C3D feature payload on the batched
    # eval/serving pipelines AND the training batch (which additionally
    # packs its {0,1} label/mask grids as uint8 — exact).  "bfloat16"
    # halves the dominant transfer (measured 512 -> ~220 ms per 32-video
    # eval group; train batch 2.11 -> 0.80 MB/video) and is BIT-IDENTICAL
    # whenever every feats consumer casts to a bf16 compute_dtype before
    # accumulating (sst dense, segment_mean, masked_mean, attention
    # precompute/weighted-sum all do); with f32 compute it differs only by
    # input quantisation.  Features are upcast to f32 on device so every
    # downstream dtype is unchanged.  Default f32 = exact byte-path.
    transfer_dtype: str = "float32"
    # Mesh axes: data-parallel over videos, model-parallel over
    # vocab/head-sharded matmuls.  (1, 1) = single chip.
    mesh_shape: Tuple[int, int] = (1, 1)
    mesh_axis_names: Tuple[str, str] = ("data", "model")
    # How device programs are distributed over the mesh:
    #   "auto"      — jit with NamedSharding inputs; the GSPMD partitioner
    #                 inserts the gradient psum.  Required for tensor
    #                 parallelism (model axis > 1).
    #   "shard_map" — explicit per-device programs over local batch rows
    #                 (the scaling-book recipe): the TRAIN step psums
    #                 grads explicitly, and the batched EVAL/serving steps
    #                 (encode/select/decode/beam/val-loss) run per-device
    #                 with no collectives at all (rows independent).
    #                 dp-only; identical math (same per-row rng), and
    #                 Pallas kernels (use_pallas_train, use_pallas) fire
    #                 inside the mesh because each device's program has
    #                 local shapes — GSPMD would replicate the opaque
    #                 pallas_call instead.
    spmd_mode: str = "auto"
    donate_step_args: bool = True
    use_pallas: bool = True
    # Training-path fused attention scores via the differentiable Pallas
    # kernel (custom VJP; the backward recomputes tanh tile-by-tile in
    # VMEM instead of round-tripping the [N, T, Hatt] intermediate through
    # HBM like the jax.checkpoint remat path).  Gradients equal the jnp
    # formulation (tests/test_pallas_attention.py).  Measured on the REAL
    # train_step at flagship dims, B=32: 170.5 -> 139.3 ms/step (+22%
    # videos/s; see BENCH_NOTES "Pallas differentiable attention").
    # Auto-disabled by train() under a multi-device mesh: a Pallas call is
    # an opaque custom call to the SPMD partitioner, which would replicate
    # it instead of sharding the batch axis.  Falls back to the remat jnp
    # path whenever kernel shape constraints don't hold (small tiles).
    use_pallas_train: bool = True
    # T ceiling for the NO-GRAD decode score kernel: the kernel wins below,
    # loses above (measured crossover on TPU v5e at H=512 — see
    # ops/pallas_attention._MAX_T_DECODE and docs/BENCH_NOTES.md "Pallas
    # score kernel T crossover").  Other TPU generations / hidden sizes
    # move the crossover; re-tune here without code changes
    # (experiments/probe_attention_T.py reproduces the sweep).  The
    # differentiable TRAINING kernel has no ceiling (wins at every bucket).
    pallas_decode_t_max: int = 384
    # Separate (higher) ceiling when the caller sorted proposals by window
    # start: the mask-aware tile-skipping kernel skips enough tanh tiles on
    # clustered windows to win at T=512 where the unsorted/dense kernel
    # loses (measured: 1.69-1.82 vs 2.10-2.17 ms/step dense at T=512
    # sorted; 2.7 unsorted — experiments/probe_tile_skip.py, round 4).
    # decoder_sample swaps this in for pallas_decode_t_max when its
    # window sort fires.  T=1024 still loses sorted; keep below that.
    pallas_decode_t_max_sorted: int = 512
    # Pipelined train loop (single-process, batch_size > 1): a producer
    # thread runs loader pulls + bucket collation + the H2D batch upload
    # while the device executes the previous step, and per-step metrics
    # are fetched in deferred batches instead of one blocking device_get
    # per iteration (engine/train._TrainPrep).  Bit-identical training
    # trajectory to the synchronous loop (same rng stream, same epoch/LR
    # schedule, same resume semantics via per-group loader-state
    # snapshots); the non-finite-loss warning lags by at most the flush
    # interval.  Measured (B=32 flagship dims, same-day A/B through the
    # axon relay): synchronous 31.8 videos/s -> pipelined 66.8 (2.1x) —
    # see docs/BENCH_NOTES.md "E2e train pipeline".
    train_pipeline: bool = True
    # Max dispatched-but-unfetched steps in the pipelined train loop: the
    # deferred metrics flush device_gets the oldest pending half, blocking
    # until those steps completed — the dispatch backpressure.  Default 2
    # (round 5): with the TWO-STAGE producer (device_put in its own upload
    # thread) the consumer became the wall, and at depth 1 the half-window
    # flush serializes step+fetch every update; the r5 interleaved A/B
    # measured depth 2 >= depth 1 in every round (69.3/54.7, 56.8/39.3,
    # 35.5/34.8 videos/s across relay phases) while depths 3-4 and beyond
    # re-enter the relay's slow-poll regime (r4: 19,140 ms/update at
    # depth 8).  The r4 depth-1 default was measured against the OLD
    # single-thread producer, where the blocking put dominated the cycle —
    # docs/BENCH_NOTES.md "Two-stage train producer".
    train_inflight: int = 2
    # Multi-process preemption: iterations between the COLLECTIVE
    # SIGTERM-flag allgathers (the stop decision must be collective —
    # partial signal delivery would otherwise wedge peers in the next
    # gradient psum, ADVICE r3).  Checking every iteration put a blocking
    # cross-host rendezvous in the hot loop (review r4); preemption is a
    # once-per-run event, so amortize: a signalled process keeps training
    # for at most N-1 extra iterations before everyone stops at the same
    # boundary.  Single-process runs check their local flag every
    # iteration regardless (no collective involved).
    preempt_check_every: int = 16
    # Greedy decode sorts proposals by window start inside decoder_sample
    # (bit-exact: every decoder op is row-independent in N, outputs are
    # unsorted back) so the mask-aware Pallas score kernel sees clustered
    # windows and skips fully-masked tanh tiles.  Only fires on the
    # greedy, non-replay path where the kernel runs (use_pallas).
    sort_decode_props: bool = True
    # Greedy/multinomial decode stops as soon as every sequence has emitted
    # its end token (the reference's break-when-all-finished,
    # OldModel_NEW.py:173-181) via lax.while_loop instead of a fixed-length
    # scan — exact same outputs, large wall-clock win on trained models
    # whose captions end well before CG_seq_length.  Disabled automatically
    # on differentiable paths (while_loop has no reverse-mode rule).
    decode_early_exit: bool = True
    # Batched (vmapped) pipelines historically forced the fixed scan: vmap
    # lowers a per-video while_loop to run until the LAST unfinished row
    # of the whole batch.  decoder_sample_batched_greedy inverts the
    # nesting (lax.while_loop OUTSIDE, jax.vmap(step) INSIDE) so one loop
    # serves the batch and exits when EVERY video is done — exact same
    # outputs as the vmapped scan, real saved steps on trained models
    # (captions typically end at 8-15 of L=30 tokens).  Covers greedy
    # rng-free batched decode (decode_step_batched), batched beam search
    # (beam_search_batched), multinomial batched decode (per-step keys are
    # derived by step index, so draws match the scan bit-for-bit), and the
    # SCST rollout's sampled + greedy decodes (the no-grad half of the RL
    # step; the update keeps its scan — while_loop has no reverse rule).
    decode_early_exit_batched: bool = True
    # Teacher-forced training computes the NLL with the logit head hoisted
    # OUT of the decode scan: the scan stores [N, L, core_width] outputs
    # instead of [N, L, V+1] logprobs (~8x smaller residual at flagship
    # dims) and one big post-scan matmul + fused (target-logit - logsumexp)
    # produces the loss, rematerialised in the backward pass.  Same math as
    # losses.language_model_loss over decoder_forward.  Auto-disabled when
    # scheduled sampling is active (the scan then needs per-step logprobs).
    fused_loss_head: bool = True
    # Batched SCST keeps the sampled rollout's VJP residuals DEVICE-RESIDENT
    # across the host METEOR-reward boundary (jax.vjp over the sampling scan
    # + closure_convert residual export), so the policy-gradient update is
    # pullback + Adam only — it skips the forced re-decode forward the
    # two-program structure otherwise forces (engine/steps.
    # rl_rollout_vjp_step_batched / rl_pullback_update_step_batched).
    # Exact: the sampled pass and the forced replay share one jaxpr modulo
    # where the token indices come from, so gradients match the two-program
    # path (tests/test_rl_vjp.py).  DEFAULT OFF — measured NET LOSS on the
    # axon TPU (117 vs 136 videos/s at B=8): the export materializes 2.2 GB
    # / 207 residual arrays per step, whose HBM write+read (~5.4 ms) plus
    # the 200+-array program interface costs more than the ~12 ms forward
    # it saves (EIGHTH negative result, docs/BENCH_NOTES.md).  May win on a
    # directly-attached TPU where dispatch is cheap; flip to re-measure.
    # Single-process only: under a mesh train() uses the two-program steps.
    scst_resident_vjp: bool = False
    # Streaming greedy decode head (ops/pallas_head): fuse the [R, C] x
    # [C, V+1] logit matmul with its argmax/max/logsumexp consumers so the
    # logits never reach HBM — the round-5 tile sweep measured -13.5% on
    # the head (1.41 vs 1.63 ms/step at R=4096, ~ties the pure-matmul
    # floor; experiments/probe_streaming_head2.py) where the round-4
    # (TR,TV)=(1024,512)-and-smaller attempts only tied.  Greedy,
    # non-forced, eval-mode, bf16-compute decode paths on a real TPU only:
    # argmax is bit-equal to the jnp head (greedy parity gate) and the
    # streamed lse matches to ~7e-6; f32 parity runs, CPU runs, sampling,
    # beam, and forced replays keep the jnp head.
    use_pallas_head: bool = True
    # Hang watchdog deadline for the long-running loops (train + batched
    # eval): if an iteration makes no progress for this many seconds, a
    # daemon thread logs a WARNING and dumps every thread's Python stack
    # to stderr (utils/watchdog.HangWatchdog), then re-arms.  Purely
    # observability — it never kills the run (relay outage phases recover;
    # a deadline-kill would trade a stall for lost work, and training owns
    # its own SIGTERM/checkpoint semantics).  BENCH_r04 was lost to a
    # silent relay wedge exactly this would have surfaced.  0 disables.
    hang_warn_s: float = 600.0


# ---------------------------------------------------------------------------
# Root config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    run_id: str = "default"
    comment: str = ""
    debug: bool = False
    data: DataConfig = field(default_factory=DataConfig)
    tap: TAPConfig = field(default_factory=TAPConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)
    context: ContextConfig = field(default_factory=ContextConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    save: SaveConfig = field(default_factory=SaveConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # -- derived dimensions (reference: CaptionGenerator.change_context_dim) --

    @property
    def video_context_dim(self) -> int:
        d = 0
        t = self.context.video_context_type
        if "VL" in t:
            d += self.data.lda_dim
        if "VC" in t:
            d += self.tap.video_dim
        if "VH" in t:
            d += self.tap.hidden_dim
        return d

    @property
    def event_context_dim(self) -> int:
        t = self.context.event_context_type
        if "ER" in t:
            return self.fusion.d_o
        d = 0
        if "EC" in t:
            d += self.tap.video_dim
        if "EH" in t:
            d += self.tap.hidden_dim
        return d

    @property
    def clip_context_dim(self) -> int:
        d = 0
        t = self.context.clip_context_type
        if "CC" in t:
            d += self.tap.video_dim
        if "CH" in t:
            d += self.tap.hidden_dim
        return d

    @property
    def tsrm_input_dim(self) -> int:
        # reference: MA_attention_8_NEW.py:13-20
        t = self.context.event_context_type
        if "ER1" in t:
            return self.tap.video_dim
        if "ER2" in t:
            return self.tap.hidden_dim
        if "ER3" in t:
            return self.tap.video_dim + self.tap.hidden_dim
        raise ValueError(f"event_context_type {t!r} selects no ER feature")

    @property
    def uses_tsrm(self) -> bool:
        # reference: CaptionGenerator.py:12-13
        return "TSRM" in self.fusion.fusion_model and "ER" in self.context.event_context_type

    def validate(self) -> "Config":
        if "L" in self.context.video_context_type:
            assert self.data.use_lda, "video_context_type uses LDA but lda not enabled"
        if self.decoder.caption_model == "three_stream":
            assert self.decoder.CG_num_layers == 3, "three_stream requires CG_num_layers==3"
        assert self.train.batch_size >= 1
        return self

    # -- (de)serialization ---------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        kw: Dict[str, Any] = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if dataclasses.is_dataclass(f.type) or f.name in _SUBCONFIGS:
                sub_cls = _SUBCONFIGS[f.name]
                sub_kw = {
                    sf.name: _coerce(sf, v[sf.name])
                    for sf in dataclasses.fields(sub_cls)
                    if sf.name in v
                }
                kw[f.name] = sub_cls(**sub_kw)
            else:
                kw[f.name] = v
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def replace_in(self, section: str, **kw: Any) -> "Config":
        """Return a new Config with fields of one sub-config replaced."""
        sub = dataclasses.replace(getattr(self, section), **kw)
        return dataclasses.replace(self, **{section: sub})


_SUBCONFIGS = {
    "data": DataConfig,
    "tap": TAPConfig,
    "fusion": FusionConfig,
    "context": ContextConfig,
    "decoder": DecoderConfig,
    "train": TrainConfig,
    "eval": EvalConfig,
    "save": SaveConfig,
    "runtime": RuntimeConfig,
}


def _coerce(f: dataclasses.Field, v: Any) -> Any:
    # JSON round-trips tuples as lists; coerce back.
    if isinstance(v, list):
        return tuple(v)
    return v


# ---------------------------------------------------------------------------
# CLI — same flag names as the reference (reference: opts.py)
# ---------------------------------------------------------------------------

# flag -> (section, field) for flags whose name matches the dataclass field
_FLAG_MAP: Dict[str, Tuple[str, str]] = {}
for _section, _cls in _SUBCONFIGS.items():
    for _f in dataclasses.fields(_cls):
        _FLAG_MAP.setdefault(_f.name, (_section, _f.name))

# reference flags with singular/plural or renamed spellings
_ALIASES = {
    "tap_epoch": ("train", "tap_epochs"),
    "cg_epoch": ("train", "cg_epochs"),
    "tapcg_epoch": ("train", "tapcg_epochs"),
    "other_feature": ("data", "other_features"),
    "id": (None, "run_id"),
    "save_all": ("save", "save_all_checkpoint"),
}

# reference flags that are DECLARED but never read anywhere in the
# reference (grep-verified: opts.py declares them, no module consumes
# them).  Accepted here as explicit no-ops so reference command lines
# translate 1:1; setting one logs a notice.
_DEAD_FLAGS = (
    "crit_type", "d_pos_emb", "data_type", "diff", "fast_eval_for_challenge",
    "lambda3", "lda_hidden_size", "lda_input_size", "lda_output_size",
    "num_samples", "use_bottomup_feature",
)

# flags the reference declares but unconditionally overwrites at runtime
# (CaptionGenerator.change_context_dim, CaptionGenerator.py:82-84, writes the
# derived dims back into opt) — here they are derived Config properties, so a
# passed value is accepted and ignored, matching the observable behavior
_OVERWRITTEN_FLAGS = (
    "video_context_dim", "event_context_dim", "clip_context_dim",
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("echr_tpu", allow_abbrev=False)
    p.add_argument("--id", type=str, default=None)
    p.add_argument("--comment", type=str, default=None)
    p.add_argument("--debug", action="store_true", default=None)
    p.add_argument("--config_json", type=str, default=None, help="load a Config JSON first")
    for flag, (section, name) in sorted(_FLAG_MAP.items()):
        cls = _SUBCONFIGS[section]
        f = next(sf for sf in dataclasses.fields(cls) if sf.name == name)
        default = getattr(cls(), name)
        if f.type in ("bool", bool) or isinstance(default, bool):
            # nargs="?" accepts both the reference's bare store_true
            # spelling (--fast_eval_cg, opts.py:268) and the valued one
            p.add_argument(f"--{flag}", type=int, nargs="?", const=1, default=None)
        elif isinstance(default, tuple):
            p.add_argument(f"--{flag}", type=str, nargs="+", default=None)
        elif f.type in ("float", float) or isinstance(default, float):
            # annotation wins over the default's Python type: a float field
            # with an int default (learning_rate_decay_start=8) must still
            # accept fractional values like the reference (opts.py:230,232)
            p.add_argument(f"--{flag}", type=float, default=None)
        elif isinstance(default, int):
            p.add_argument(f"--{flag}", type=int, default=None)
        else:
            p.add_argument(f"--{flag}", type=str, default=None)
    for alias, (section, name) in _ALIASES.items():
        if alias in ("id",):
            continue
        if alias == "save_all":
            p.add_argument("--save_all", action="store_true", default=None)
        elif alias == "other_feature":
            p.add_argument("--other_feature", type=str, nargs="+", default=None)
        else:
            p.add_argument(f"--{alias}", type=int, default=None)
    for dead in _DEAD_FLAGS + _OVERWRITTEN_FLAGS:
        # nargs="?" accepts both bare (--fast_eval_for_challenge, a
        # store_true in the reference, opts.py:269) and valued spellings
        p.add_argument(f"--{dead}", nargs="?", const="1", default=None,
                       help="accepted no-op (declared but never read, or "
                            "overwritten at runtime, in the reference)")
    return p


def parse_config(argv: Optional[Sequence[str]] = None) -> Config:
    """Parse a reference-style CLI into a Config (reference: opts.py:3-294)."""
    p = build_argparser()
    ns, _unknown = p.parse_known_args(argv)
    if _unknown:
        import logging

        logging.getLogger("echr_tpu.config").warning(
            "ignoring unknown flags: %s", _unknown)
    for dead in _DEAD_FLAGS:
        if getattr(ns, dead, None) is not None:
            import logging

            logging.getLogger("echr_tpu.config").info(
                "--%s is declared but never read in the reference; ignored", dead)
    for over in _OVERWRITTEN_FLAGS:
        if getattr(ns, over, None) is not None:
            import logging

            logging.getLogger("echr_tpu.config").info(
                "--%s is overwritten at runtime in the reference "
                "(change_context_dim); derived here — ignored", over)
    cfg = Config()
    if ns.config_json:
        with open(ns.config_json) as fh:
            cfg = Config.from_json(fh.read())

    updates: Dict[str, Dict[str, Any]] = {}
    top: Dict[str, Any] = {}

    def stage(section: Optional[str], name: str, value: Any) -> None:
        if section is None:
            top[name] = value
        else:
            updates.setdefault(section, {})[name] = value

    for flag, dest in list(_FLAG_MAP.items()) + list(_ALIASES.items()):
        v = getattr(ns, flag if flag != "id" else "id", None)
        if v is None:
            continue
        section, name = dest
        cls = _SUBCONFIGS.get(section) if section else None
        if cls is not None:
            f = next(sf for sf in dataclasses.fields(cls) if sf.name == name)
            default = getattr(cls(), name)
            if isinstance(default, bool):
                v = bool(v)
            elif isinstance(default, tuple):
                v = tuple(v) if isinstance(v, (list, tuple)) else (v,)
                if default and isinstance(default[0], int):
                    # tuple flags parse as strings (nargs="+"); int-typed
                    # tuples (mesh_shape, time_buckets) need real ints —
                    # '4' * '2' would blow up in build_mesh
                    v = tuple(int(x) for x in v)
        stage(section, name, v)

    if ns.id is not None:
        top["run_id"] = ns.id
    if ns.comment is not None:
        top["comment"] = ns.comment
    if ns.debug:
        top["debug"] = True

    for section, kw in updates.items():
        cfg = cfg.replace_in(section, **kw)
    if top:
        cfg = cfg.replace(**top)

    if cfg.debug:
        # reference: opts.py:288-293 — the --debug preset
        cfg = cfg.replace_in(
            "save", min_epoch_when_save=0, save_checkpoint_every=100, losses_log_every=50
        )
        cfg = cfg.replace_in("eval", num_vids_eval=10)
        cfg = cfg.replace_in("data", shuffle=False)
    return cfg.validate()


def flagship_config(**overrides: Any) -> Config:
    """The published ECHR stage-2 configuration (reference: experiments/train_ECHR.sh):
    three_stream decoder, TSRM over ER3 event features, VL video context, CC clips.
    """
    cfg = Config()
    cfg = cfg.replace_in("data", lda_dim=100)
    cfg = cfg.replace_in(
        "context",
        video_context_type="VL",
        event_context_type="ER3",
        clip_context_type="CC",
        CG_input_feats_type="",
        CG_init_feats_type="",
    )
    cfg = cfg.replace_in("decoder", caption_model="three_stream", CG_num_layers=3)
    cfg = cfg.replace_in("train", training_mode="pre_cg", tap_epochs=0, cg_epochs=30, tapcg_epochs=0)
    for k, v in overrides.items():
        if "." in k:
            section, name = k.split(".", 1)
            cfg = cfg.replace_in(section, **{name: v})
        else:
            cfg = cfg.replace(**{k: v})
    return cfg.validate()
