"""Training runtime: curriculum, epochs, LR schedule, eval-gated checkpoints.

Capability parity with the reference trainer (reference: train.py:26-508):
curriculum construction over 'tap'/'cg'/'gt_tap_cg'/'tap_cg' phases, two
independent Adam optimizers, epoch step-decay LR, bad-video skipping,
periodic eval selecting the best checkpoint by METEOR (CG phases) or
proposal F1 (TAP phase), full resume incl. mid-epoch data order.

TPU-native: the whole step is one jitted device program per (phase, time
bucket); host work is the prefetch pipeline and bookkeeping only.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from echr_tpu.config import Config
from echr_tpu.data.batcher import VideoBatch
from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine import checkpoint as ckpt
from echr_tpu.engine.evaluate import eval_split
from echr_tpu.engine.steps import TrainState, init_train_state, set_lr, train_step
from echr_tpu.models.registry import init_captioner, init_tap

log = logging.getLogger("echr_tpu.train")


def get_training_list(cfg: Config) -> List[str]:
    """Curriculum tags per epoch (reference: get_training_list, train.py:26-66)."""
    t = cfg.train
    mode = t.training_mode
    if mode == "pre_tap+cotrain":
        return ["tap"] * t.tap_epochs + ["cg"] * t.cg_epochs + ["tap_cg"] * t.tapcg_epochs
    if mode == "cotrain":
        assert t.tap_epochs == 0 and t.cg_epochs == 0
        return ["tap_cg"] * t.tapcg_epochs
    if mode == "pre_cg":
        assert t.tap_epochs == 0
        return ["cg"] * t.cg_epochs
    if mode == "pre_LP_cg":
        assert t.tap_epochs == 0
        return ["LP_cg"] * t.cg_epochs
    if mode == "gt_tap_cg":
        assert t.tap_epochs == 0
        return ["gt_tap_cg"] * t.cg_epochs
    if mode == "pre_tap":
        assert t.cg_epochs == 0
        return ["tap"] * t.tap_epochs
    if mode == "alter":
        assert t.cg_epochs == 0 and t.tap_epochs == 0
        return ["gt_tap_cg", "tap_cg"] * t.tapcg_epochs
    if mode == "alter2":
        # phase indexed by ITERATION, not epoch (reference: train.py:53-55,249-250)
        assert t.cg_epochs == 0 and t.tap_epochs == 0
        return (["gt_tap_cg"] * 500 + ["tap_cg"] * 500) * t.tapcg_epochs * 10
    if mode == "alter3":
        assert t.cg_epochs == 0 and t.tap_epochs == 0
        return ["gt_tap_cg"] * 5 * 10009 + (["gt_tap_cg"] * 500 + ["tap_cg"] * 500) * t.tapcg_epochs
    raise ValueError(f"training_mode {mode!r} is incorrect")


def current_lr(cfg: Config, epoch: int) -> float:
    """Epoch step decay (reference: train.py:232-240)."""
    t = cfg.train
    if epoch > t.learning_rate_decay_start >= 0:
        frac = (epoch - t.learning_rate_decay_start) // t.learning_rate_decay_every
        return t.lr * (t.learning_rate_decay_rate ** int(frac))
    return t.lr


def current_ss_prob(cfg: Config, epoch: int) -> float:
    """Scheduled-sampling ramp.  The reference defines the flags
    (opts.py:218-228) but never wires them into training; here they work."""
    t = cfg.train
    if t.scheduled_sampling_start < 0 or epoch < t.scheduled_sampling_start:
        return 0.0
    frac = (epoch - t.scheduled_sampling_start) // t.scheduled_sampling_increase_every
    return min(t.scheduled_sampling_increase_prob * (frac + 1), t.scheduled_sampling_max_prob)


def _stack_batch(batch: VideoBatch) -> VideoBatch:
    return jax.tree.map(lambda x: np.asarray(x)[None], batch)


# {0,1}-valued grids: exact in uint8 (engine.steps.decompress_batch restores f32)
_BINARY_FIELDS = ("tap_labels", "tap_masks", "frame_mask", "prop_mask",
                  "cg_masks", "gts_mask", "gts_cg_masks")


def _compress_batch(batch: VideoBatch, cfg: Config) -> VideoBatch:
    """Shrink the per-step host->device payload ~2.6x (2.11 -> 0.80
    MB/video at flagship dims) when runtime.transfer_dtype is bfloat16:
    features travel as bf16 (quantisation is a no-op under a bf16
    compute_dtype — every consumer casts before its matmul, same argument
    as the eval pipelines) and the {0,1} grids as uint8 (exact).
    steps.decompress_batch restores f32 inside the jitted step."""
    if cfg.runtime.transfer_dtype != "bfloat16":
        return batch
    import jax.numpy as jnp  # bf16 numpy dtype

    reps = {"feats": np.asarray(batch.feats).astype(jnp.bfloat16)}
    for f in _BINARY_FIELDS:
        reps[f] = np.asarray(getattr(batch, f)).astype(np.uint8)
    return batch._replace(**reps)


def _collate(batches: List[VideoBatch]) -> VideoBatch:
    """Stack same-bucket videos into a [B, ...] batch (the data-parallel
    unit the reference never had — its effective batch is always 1 video,
    SURVEY §2.2)."""
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


class _BucketCollator:
    """Groups same-time-bucket videos until `batch_size` are available.
    Returns (stacked_batch, metas) — the metas carry the per-video GT
    sentences the batched SCST reward needs."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.groups: Dict[int, List] = {}

    def add(self, batch: VideoBatch, meta):
        g = self.groups.setdefault(meta.t_bucket, [])
        g.append((batch, meta))
        if len(g) >= self.batch_size:
            out = _collate([b for b, _ in g])
            metas = [m for _, m in g]
            self.groups[meta.t_bucket] = []
            return out, metas
        return None


class _PrepItem(NamedTuple):
    stacked: VideoBatch   # device-staged [B, ...] batch (H2D done in-thread)
    metas: List           # per-video BatchMeta (SCST rewards, vid for logs)
    last_batch: VideoBatch  # completing pull's host batch (ckpt histograms)
    epoch_at_step: int    # epoch the step must run under (wraps BEFORE the
    #                       completing pull — its own wrap counts after the
    #                       step, exactly like the synchronous loop)
    epoch_after: int      # epoch after the completing pull's wrap
    good_pulls: int       # rng splits owed for this item's span of pulls
    bad_delta: int        # bad-video skips in this item's span
    loader_state: Dict    # loader.state() right after the completing pull


_PREP_STOP = object()


class _TrainPrep:
    """Producer thread for the pipelined train loop (runtime.train_pipeline,
    net-new — the reference's loop is fully synchronous, train.py:252-349):
    loader pulls, bad-video skips, transfer compression, bucket collation,
    and the H2D batch upload all run here, overlapped with the device step
    the main thread dispatched.  Produces the SAME stream of stacked groups
    as the synchronous loop (one Loader, same order), with enough
    bookkeeping attached to each item that the consumer reconstructs the
    synchronous loop's exact epoch schedule, rng stream, and checkpointable
    loader state.

    Measured motivation (experiments/probe_train_e2e.py, B=32 flagship
    dims through the axon relay): the synchronous loop ran 22.5 videos/s
    against a 229 videos/s device step — collation, the ~34 MB H2D upload
    at dispatch, and the per-step metrics device_get all serialized with
    compute."""

    def __init__(self, loader: Loader, cfg: Config, batch_size: int,
                 epoch0: int, n_epochs: int, mesh, multihost: bool,
                 depth: int = 2):
        import queue as _q
        import threading

        self.loader = loader
        self.cfg = cfg
        self.batch_size = batch_size
        self.epoch0 = epoch0
        self.n_epochs = n_epochs
        self.mesh = mesh
        self.multihost = multihost
        # two-stage producer (round 5): jax.device_put BLOCKS for the full
        # relay transfer (~286 ms/group measured at B=32 bf16), so a single
        # prep thread's cycle was loader+compress+collate+put SUMMED
        # (~470 ms > the 280 ms device step).  Stage 1 (this thread) does
        # pulls/compress/collate; stage 2 (train-put thread) does the
        # upload — producer cycle becomes max(prep, put), same item ORDER
        # (FIFO queues, single thread per stage), so the consumer-visible
        # stream and every trajectory/equality/preemption guarantee is
        # unchanged (pinned in tests/test_train_pipeline.py).
        self.q_host: "_q.Queue" = _q.Queue(maxsize=depth)
        self.q: "_q.Queue" = _q.Queue(maxsize=depth)
        self._empty = _q.Empty
        self._full = _q.Full
        self.abort = threading.Event()
        self.error: Optional[BaseException] = None
        self.final_epoch = epoch0  # valid once the thread exits
        self.tm = {"loader": 0.0, "compress": 0.0, "collate": 0.0, "put": 0.0}
        self.thread = threading.Thread(
            target=self._run, daemon=True, name="train-prep")
        self.put_thread = threading.Thread(
            target=self._run_put, daemon=True, name="train-put")
        self.thread.start()
        self.put_thread.start()

    def _run(self) -> None:
        tic = time.perf_counter
        try:
            collator = _BucketCollator(self.batch_size)
            wraps, good, bad = 0, 0, 0
            while not self.abort.is_set() and self.epoch0 + wraps < self.n_epochs:
                t0 = tic()
                batch, meta = self.loader.get_batch("train")
                self.tm["loader"] += tic() - t0
                if meta.proposal_num <= 0 or meta.n_frames <= 1:
                    bad += 1
                    wraps += int(meta.wrapped)
                    continue
                t0 = tic()
                batch = _compress_batch(batch, self.cfg)
                self.tm["compress"] += tic() - t0
                good += 1
                epoch_at_step = self.epoch0 + wraps
                t0 = tic()
                res = collator.add(batch, meta)
                self.tm["collate"] += tic() - t0
                if res is None:
                    wraps += int(meta.wrapped)
                    continue
                stacked, metas = res
                item = _PrepItem(
                    stacked, metas, batch, epoch_at_step,
                    epoch_at_step + int(meta.wrapped), good, bad,
                    self.loader.state(),
                )
                good, bad = 0, 0
                wraps += int(meta.wrapped)
                if not self._enqueue(self.q_host, item):
                    return  # aborted
            self.final_epoch = self.epoch0 + wraps
        except BaseException as e:  # surfaced by get() on the main thread
            self.error = e
        finally:
            self._enqueue(self.q_host, _PREP_STOP)

    def _run_put(self) -> None:
        """Stage 2: H2D upload of host-stacked groups, in arrival order."""
        tic = time.perf_counter
        try:
            while not self.abort.is_set():
                try:
                    item = self.q_host.get(timeout=0.2)
                except self._empty:
                    if not self.thread.is_alive() and self.q_host.empty():
                        break
                    continue
                if item is _PREP_STOP:
                    break
                t0 = tic()
                if self.mesh is not None:
                    stacked = _shard_batch(item.stacked, self.mesh,
                                           self.multihost)
                else:
                    stacked = jax.device_put(item.stacked)
                self.tm["put"] += tic() - t0
                if not self._enqueue(self.q, item._replace(stacked=stacked)):
                    return  # aborted
        except BaseException as e:
            if self.error is None:
                self.error = e
        finally:
            self._enqueue(self.q, _PREP_STOP)

    def _enqueue(self, q, item) -> bool:
        while not self.abort.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except self._full:
                pass
        return False

    def get(self, stop_requested):
        """Next prepped group.  Returns _PREP_STOP when the curriculum is
        exhausted or stop_requested() turns true while waiting; re-raises
        any producer exception."""
        while True:
            try:
                item = self.q.get(timeout=0.2)
            except self._empty:
                if self.error is not None:
                    raise self.error
                if stop_requested():
                    return _PREP_STOP
                if not self.put_thread.is_alive() and self.q.empty():
                    if self.error is not None:
                        raise self.error
                    return _PREP_STOP
                continue
            if item is _PREP_STOP and self.error is not None:
                raise self.error
            return item

    def stop(self) -> None:
        self.abort.set()
        for q in (self.q, self.q_host):
            try:  # drain so a blocked _enqueue wakes and sees the abort flag
                while True:
                    q.get_nowait()
            except self._empty:
                pass
        self.thread.join(timeout=10.0)
        self.put_thread.join(timeout=10.0)
        if self.thread.is_alive() or self.put_thread.is_alive():
            log.warning("train prep/put thread did not join within 10s")


def train(cfg: Config, max_iterations: Optional[int] = None,
          timing_out: Optional[Dict] = None) -> Dict:
    """Run the full curriculum.  Returns a summary dict.

    timing_out (optional dict, mirrors eval_split_batched's timing_out):
    filled with cumulative seconds per loop section — "loader" (get_batch),
    "compress" (host bf16 cast), "collate" (bucket stacking), "step"
    (device dispatch incl. H2D upload), "fetch" (device->host metrics),
    "boundary" (log/eval/checkpoint work) — plus "iters", a list of
    (iteration, perf_counter) pairs for steady-state rate measurement.

    Multi-host (jax.process_count() > 1, net-new vs the reference —
    SURVEY §5.8): every process runs the SAME replicated host pipeline
    (identical Loader stream/seeds, so collation, bad-video skips, and
    bucket choices agree everywhere) while the device batch is a global
    array sharded over every chip in the cluster — exact data-parallel
    semantics with gradient psum over ICI/DCN.  Checkpoints, logs, TB
    events, and the source snapshot are written by process 0 only; the
    gating eval runs host-sharded over the val split through
    eval_split_batched(multihost=True), so every process computes the
    identical full-split score and makes the identical best-checkpoint
    decision."""
    multihost = jax.process_count() > 1
    is_p0 = jax.process_index() == 0
    save_folder = os.path.join(cfg.save.checkpoint_path, cfg.run_id)
    os.makedirs(os.path.join(save_folder, "pred_sent"), exist_ok=True)
    _setup_logger(save_folder, write_files=is_p0)
    if is_p0:
        with open(os.path.join(save_folder, "config.json"), "w") as f:
            f.write(cfg.to_json())
        _snapshot_source(save_folder)

    dataset = build_dataset(cfg)
    if multihost:
        # replicated host pipeline: every process walks the FULL train split
        # in the same order (same seed) so the global batch schedule agrees;
        # the eval loader shards val per host for the multihost eval sweep
        loader = Loader(dataset, cfg, seed=cfg.train.seed,
                        process_index=0, process_count=1)
        eval_loader = Loader(dataset, cfg, seed=cfg.train.seed,
                             shard_splits=("val",))
    else:
        loader = Loader(dataset, cfg, seed=cfg.train.seed)
        eval_loader = loader
    cfg = cfg.replace_in(
        "decoder", CG_vocab_size=dataset.vocab_size, CG_seq_length=dataset.seq_length
    )

    rng = jax.random.PRNGKey(cfg.train.seed)
    k_tap, k_cg, rng = jax.random.split(rng, 3)
    tap_params = init_tap(k_tap, cfg)
    cg_params = init_captioner(k_cg, cfg)

    # multi-device: shard params by the (data, model) rules and batches over
    # the data axis; XLA lowers the loss mean to an ICI psum — the reference
    # has no distributed story at all (SURVEY §5.8)
    mesh = None
    dp, tp = cfg.runtime.mesh_shape
    if multihost:
        from echr_tpu.parallel.distributed import global_mesh
        from echr_tpu.parallel.mesh import shard_params

        mesh = global_mesh(tp=max(tp, 1))  # all cluster devices
        tap_params = shard_params(tap_params, mesh)
        cg_params = shard_params(cg_params, mesh)
        if cfg.train.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"multi-host training needs batch_size divisible by the "
                f"global data axis ({mesh.shape['data']}); got "
                f"{cfg.train.batch_size}"
            )
        if cfg.train.m_batch > 1:
            raise NotImplementedError(
                "m_batch accumulation is a single-host path; "
                "raise batch_size instead"
            )
        if cfg.train.self_critical_after != -1 and cfg.train.batch_size <= 1:
            raise ValueError(
                "multi-host SCST needs the batched path: set batch_size to "
                "a multiple of the global data axis"
            )
        log.info("multi-host mesh: %s over %d processes",
                 dict(mesh.shape), jax.process_count())
    elif dp * tp > 1:
        from echr_tpu.parallel.mesh import build_mesh, shard_params

        mesh = build_mesh(cfg)
        tap_params = shard_params(tap_params, mesh)
        cg_params = shard_params(cg_params, mesh)
        if cfg.train.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} must divide over "
                f"{mesh.shape['data']} data-parallel devices"
            )
        log.info("mesh: %s", dict(mesh.shape))
    use_shard_map = mesh is not None and cfg.runtime.spmd_mode == "shard_map"
    if use_shard_map and mesh.shape["model"] != 1:
        raise ValueError("spmd_mode='shard_map' supports dp-only meshes; "
                         "tensor parallelism needs spmd_mode='auto'")
    if mesh is not None and cfg.runtime.use_pallas_train and not use_shard_map:
        # a Pallas call is an opaque custom call to the GSPMD partitioner —
        # under a jit-sharded batch it would be replicated, not partitioned;
        # keep the jnp remat path, which XLA shards like the rest of the
        # step.  (spmd_mode="shard_map" keeps the kernel: per-device
        # programs there have local shapes.)
        cfg = cfg.replace_in("runtime", use_pallas_train=False)
        log.info("mesh training: use_pallas_train disabled (remat path)")
    # The SCST steps (rl_rollout/rl_update) AND grad_step (m_batch
    # accumulation, checkpoint-time histograms) are auto-partitioned jits
    # even in shard_map mode, so the Pallas train kernel must stay out of
    # them under any mesh — same replication reason as above (train_step
    # is the only step with a shard_map variant today)
    # use_pallas too: the SCST rollout's no-grad decode attention
    # (runtime.use_pallas) sits inside the same auto-partitioned rl jits —
    # under a mesh the opaque pallas_call would be replicated rather than
    # sharded (a silent perf loss, ADVICE r3)
    rl_cfg = cfg
    if mesh is not None and (cfg.runtime.use_pallas_train or cfg.runtime.use_pallas):
        rl_cfg = cfg.replace_in("runtime", use_pallas_train=False,
                                use_pallas=False)

    epoch, iteration, best_val_score = 0, 0, -1.0
    histories: Dict[str, Dict] = {"loss": {}, "lr": {}, "val": {}}

    resume_path = os.path.join(save_folder, f"model-{cfg.save.start_from_mode}.ckpt")
    if cfg.save.start_from and os.path.exists(resume_path):
        payload = ckpt.load_checkpoint(resume_path)
        if payload.get("config") is not None:
            cfg = overlay_resumed_config(cfg, payload["config"])
        state = payload["state"]
        iteration = payload["iteration"]
        epoch = payload["epoch"]
        best_val_score = payload["best_val_score"]
        histories = payload.get("histories") or histories
        if payload.get("loader_state"):
            loader.load_state(payload["loader_state"])
        if multihost:
            # checkpoint leaves are host-local numpy; lift back to global
            state = _replicate_global(state, mesh)
        log.info("resumed from %s at iter %d epoch %d", resume_path, iteration, epoch)
    else:
        if cfg.save.pretrain and cfg.save.pretrain_path:
            warm = ckpt.load_params_only(cfg.save.pretrain_path, cfg.save.pretrain)
            tap_params = warm.get("tap_params", tap_params)
            cg_params = warm.get("cg_params", cg_params)
            log.info("warm-started %s from %s", cfg.save.pretrain, cfg.save.pretrain_path)
        state = init_train_state(cfg, tap_params, cg_params)

    curriculum = get_training_list(cfg)
    log.info("curriculum: %s (%d epochs)", cfg.train.training_mode, len(curriculum))

    if is_p0:
        from echr_tpu.utils.tb import TBWriter

        tb = TBWriter(os.path.join(save_folder, "tf_summary_train"))
    else:
        tb = _NullTB()  # non-zero processes compute, process 0 writes
    loss_sum: Dict[str, float] = {}
    loss_count = 0
    bad_video_num = 0
    t_start = time.time()
    lr = None
    iter_indexed = cfg.train.training_mode == "alter2"  # reference: train.py:249-250
    acc_grads = None  # m_batch gradient accumulation
    collator = _BucketCollator(cfg.train.batch_size) if cfg.train.batch_size > 1 else None

    # preemption-safe training (net-new; SURVEY §5.3 — the reference dies
    # mid-step and relies on a manual --start_from restart): SIGTERM (what
    # TPU pools / cluster schedulers send before reclaiming a VM) sets a
    # flag, the loop breaks at the next iteration boundary, and the normal
    # loop-exit path below writes a resumable model-last.ckpt.  Multi-host:
    # schedulers preempt every worker, so each process breaks on its own
    # signal and the collective _localize at loop exit still runs on all.
    _preempt = _install_preemption_handler()

    # hang observability (net-new; SURVEY §5.3): a silent relay/device wedge
    # otherwise presents as a log gap with every thread in a futex wait —
    # warn + dump stacks after runtime.hang_warn_s without an iteration
    from echr_tpu.utils.watchdog import HangWatchdog

    wd = HangWatchdog("train", cfg.runtime.hang_warn_s).start()

    # loop-section wall-clock accounting (cheap: two perf_counter calls per
    # section); copied into timing_out at return when the caller asked
    tm: Dict = {"loader": 0.0, "compress": 0.0, "collate": 0.0, "step": 0.0,
                "fetch": 0.0, "boundary": 0.0, "iters": []}
    tic = time.perf_counter

    # -- boundary work shared by the synchronous and pipelined loops --------

    def _log_boundary(iteration: int, epoch: int, phase: str) -> None:
        """losses_log_every boundary: averaged-loss log line + TB scalars
        (reference: train.py:343-357)."""
        nonlocal loss_sum, loss_count, bad_video_num, t_start
        avg = {k: round(v / max(loss_count, 1), 4) for k, v in loss_sum.items()}
        dt = (time.time() - t_start) / max(loss_count, 1)
        log.info(
            "iter %d (epoch %d, lr %.2e, phase %s) losses=%s time/batch=%.3fs bad_vid=%d",
            iteration, epoch, lr, phase, avg, dt, bad_video_num,
        )
        histories["loss"][iteration] = avg
        histories["lr"][iteration] = lr
        tb.scalar("lr", lr, iteration)
        for k, v in avg.items():
            tb.scalar(f"train_{k}", v, iteration)
        loss_sum, loss_count, bad_video_num = {}, 0, 0
        t_start = time.time()

    def _ckpt_boundary(iteration: int, epoch: int, phase: str, ss_prob: float,
                       step_rng, hist_batch_raw: VideoBatch, state: TrainState,
                       loader_state: Dict = None) -> None:
        """save_checkpoint_every boundary: gating eval, param+grad
        histograms, last/best checkpoints (reference: train.py:360-466).
        hist_batch_raw is the last consumed single-video batch (the
        reference logs .grad from the latest step's batch)."""
        nonlocal best_val_score
        # the gating eval legitimately runs minutes (fullscale splits,
        # relay contention phases) and carries its OWN eval watchdog —
        # pause the train one so a long healthy eval can't read as a stall
        wd.suspend()
        current_score, eval_scores = _run_eval(
            state, eval_loader, cfg, save_folder, iteration, phase,
            multihost=multihost, mesh=mesh,
        )
        tb.scalar("val_score", current_score, iteration)
        for k, v in eval_scores.items():
            tb.scalar(f"val_{k}", float(np.asarray(v, dtype=float).mean()), iteration)
        # parameter AND gradient histograms for every parameter at
        # checkpoints (reference: train.py:417-422 logs param + grad for
        # all named parameters; the grads are a fresh forward-backward on
        # the latest batch, matching torch's last-step .grad contents)
        from echr_tpu.engine.steps import grad_step

        hist_batch = _stack_batch(hist_batch_raw)
        if multihost:
            # replicated global batch: the grad program is a collective
            # over global params, so EVERY process runs it; p0 writes
            hist_batch = _replicate_global(hist_batch, mesh)
        # rl_cfg, not cfg: grad_step is an auto-partitioned jit, so the
        # Pallas train kernel must stay out of it under any mesh (same
        # invariant as the SCST steps, see rl_cfg above)
        hist_grads, _ = grad_step(
            state, hist_batch, step_rng, rl_cfg, phase, ss_prob=ss_prob
        )
        if multihost and mesh.shape["model"] > 1:
            # collective localization (allgathers tp-sharded leaves) on
            # EVERY process; only p0 writes the files below
            save_state = _localize(state, mesh)
            hist_grads = _localize(hist_grads, mesh)
        else:
            # dp-only (or single-host): every leaf is replicated, hence
            # host-addressable — no collective, and non-writer processes
            # skip the device->host fetch entirely (their TB is _NullTB)
            save_state = state
        if is_p0:
            for prefix, tree in (
                ("tap", save_state.tap_params),
                ("cg", save_state.cg_params),
                ("tap_grad", hist_grads[0]),
                ("cg_grad", hist_grads[1]),
            ):
                for name, leaf in jax.tree_util.tree_leaves_with_path(tree):
                    tb.histogram(
                        f"{prefix}/" + jax.tree_util.keystr(name),
                        np.asarray(leaf), iteration,
                    )
        histories["val"][iteration] = {
            k: (np.asarray(v).tolist() if hasattr(v, "tolist") else v)
            for k, v in eval_scores.items()
        }
        if is_p0:  # single-writer checkpoints; every process agrees on
            # the scores (multihost eval gathers the full split), so the
            # best-checkpoint decision is identical everywhere
            _save(save_state, cfg, save_folder, iteration, epoch, best_val_score,
                  loader, histories, dataset, loader_state=loader_state)
        if current_score > best_val_score:
            best_val_score = current_score
            if is_p0:
                _save(save_state, cfg, save_folder, iteration, epoch, best_val_score,
                      loader, histories, dataset, best=True,
                      loader_state=loader_state)
            log.info("new best %.4f at iter %d", best_val_score, iteration)
        wd.resume()  # exception paths fall through to train()'s outer
        # finally, which stops the watchdog outright

    def _loop_pipelined() -> None:
        """Pipelined train loop (runtime.train_pipeline, net-new — the
        reference's loop is fully synchronous, train.py:252-349): a
        _TrainPrep producer thread overlaps loader pulls + collation + the
        H2D upload with the device step, and per-step metrics are fetched
        in deferred batches (ONE relay crossing per flush) instead of one
        blocking device_get per iteration.  The pending-metrics flush is
        also the dispatch backpressure: device_get on step i's metrics
        blocks until step i completed, so at most
        runtime.train_inflight steps (plus the prep queue) are in flight —
        bounding staged-batch HBM and relay request pileup.

        Trajectory is bit-identical to the synchronous loop: the rng
        stream replays one split per good pull (item.good_pulls), the
        epoch/LR/phase schedule replays from item.epoch_at_step /
        epoch_after, and checkpoints save the CONSUMED loader snapshot
        (item.loader_state), not the producer's run-ahead cursor
        (tests/test_train_pipeline.py pins all three)."""
        nonlocal state, epoch, iteration, rng, lr
        nonlocal loss_sum, loss_count, bad_video_num
        # checkpoint snapshot before any item — captured BEFORE the producer
        # thread starts pulling (review r4: _TrainPrep runs get_batch from
        # __init__, so a state() call after construction can already contain
        # producer run-ahead, and a preemption landing before the first
        # consumed item would checkpoint a cursor ahead of what was trained)
        last_consumed = loader.state()
        prep = _TrainPrep(loader, cfg, cfg.train.batch_size, epoch,
                          len(curriculum), mesh, multihost)
        # (iteration, device metrics, vid, phase) awaiting the batched fetch
        pending: List = []
        inflight = max(1, int(cfg.runtime.train_inflight))

        def _flush_pending(n: int = None) -> None:
            """Batched device_get of the oldest n pending steps' metrics
            (all of them when n is None — log/ckpt boundaries need the
            exact per-step sums).  The overflow path fetches only HALF the
            window: device_get blocks until that step completed, so a full
            flush would drain the whole dispatch queue and re-serialize
            the producer with the device every window — half keeps the
            device queue primed while the relay crossing amortizes over
            inflight/2 steps."""
            nonlocal loss_count
            drain = pending if n is None else pending[:n]
            if not drain:
                return
            t0 = tic()
            fetched = jax.device_get([p[1] for p in drain])
            tm["fetch"] += tic() - t0
            for (it_i, _, vid_i, phase_i), m in zip(drain, fetched):
                loss_now = float(m.get("loss", 0.0))
                if not np.isfinite(loss_now):
                    # failure containment: lags the step by at most the
                    # flush interval (see RuntimeConfig.train_pipeline)
                    log.warning("non-finite loss %s at iter %d (vid %s, phase %s)",
                                loss_now, it_i, vid_i, phase_i)
                for k, v in m.items():
                    loss_sum[k] = loss_sum.get(k, 0.0) + float(v)
                loss_count += 1
            del pending[:len(drain)]

        try:
            while True:
                wd.beat()
                item = prep.get(lambda: _preempt["hit"])
                if item is _PREP_STOP:
                    if _preempt["hit"]:
                        log.warning("preemption: stopping before iter %d; "
                                    "resume with --start_from", iteration + 1)
                    else:
                        # curriculum exhausted: trailing wraps on dropped
                        # partial groups advance the epoch like the sync loop
                        epoch = max(epoch, prep.final_epoch)
                    break
                # replay the sync loop's rng stream: ONE split per good pull
                # in this item's span; the step uses the completing pull's
                step_rng = None
                for _ in range(item.good_pulls):
                    rng, step_rng = jax.random.split(rng)
                bad_video_num += item.bad_delta
                epoch = item.epoch_at_step
                phase = (curriculum[min(iteration, len(curriculum) - 1)]
                         if iter_indexed else curriculum[epoch])
                new_lr = current_lr(cfg, epoch)
                if new_lr != lr:
                    lr = new_lr
                    state = set_lr(state, lr)
                ss_prob = current_ss_prob(cfg, epoch)
                t0 = tic()
                if use_shard_map:
                    from echr_tpu.engine.steps import train_step_shard_map

                    state, metrics = train_step_shard_map(
                        state, item.stacked, step_rng, cfg, phase, mesh=mesh,
                        ss_prob=ss_prob,
                    )
                else:
                    state, metrics = train_step(
                        state, item.stacked, step_rng, cfg, phase,
                        ss_prob=ss_prob,
                    )
                tm["step"] += tic() - t0
                iteration += 1
                epoch = item.epoch_after
                last_consumed = item.loader_state
                pending.append((iteration, metrics, item.metas[-1].vid, phase))
                tm["iters"].append((iteration, tic()))

                t_boundary = tic()
                at_log = iteration % cfg.save.losses_log_every == 0
                at_ckpt = (iteration % cfg.save.save_checkpoint_every == 0
                           and epoch >= cfg.save.min_epoch_when_save)
                if at_log or at_ckpt:
                    _flush_pending()
                elif len(pending) >= inflight:
                    _flush_pending(max(1, len(pending) // 2))
                if at_log:
                    _log_boundary(iteration, epoch, phase)
                if at_ckpt:
                    _ckpt_boundary(iteration, epoch, phase, ss_prob, step_rng,
                                   item.last_batch, state,
                                   loader_state=item.loader_state)
                tm["boundary"] += tic() - t_boundary
                if max_iterations and iteration >= max_iterations:
                    break
                if _preempt["hit"]:
                    log.warning("preemption: checkpointing at iter %d and "
                                "exiting; resume with --start_from", iteration)
                    break
        finally:
            prep.stop()
            for k, v in prep.tm.items():  # incl. "put" (the in-thread H2D)
                tm[k] = tm.get(k, 0.0) + v
        _flush_pending()
        # rewind the loader to the last CONSUMED snapshot: the producer ran
        # ahead, and the loop-exit _save below serializes loader.state()
        loader.load_state(last_consumed)

    # pipelined-loop eligibility (runtime.train_pipeline): the supervised
    # batched single-controller path only.  Excluded by design: multi-host
    # (the preemption allgather and eval are collective rendezvous — a prep
    # thread would skew the lockstep iteration schedule across processes),
    # m_batch accumulation and SCST (both already interleave host work with
    # multiple device programs per update), and batch_size==1 (no collation
    # to overlap; the relay upload is small).
    pipelined = (
        cfg.runtime.train_pipeline
        and collator is not None
        and not multihost
        and cfg.train.m_batch == 1
        and cfg.train.self_critical_after == -1
    )
    try:
        if pipelined:
            _loop_pipelined()

        while not pipelined and epoch < len(curriculum):
            # the stop decision is COLLECTIVE under multi-process: schedulers
            # usually SIGTERM every worker, but under partial delivery a local
            # break would leave peers blocked in the next gradient psum until
            # the scheduler hard-kills the job (ADVICE r3) — any(one hit) stops
            # everyone at the same iteration boundary
            wd.beat()
            hit = _preempt["hit"]
            if multihost:
                # amortized to every preempt_check_every iterations (review
                # r4): the allgather is a blocking cross-host rendezvous, and
                # `iteration` advances in lockstep on every process (bad-video
                # skips are data-determined, identical across hosts), so the
                # modulo schedule is itself collective.  Off-schedule local
                # hits wait — breaking unilaterally is the partial-delivery
                # wedge this collective exists to prevent.
                every = max(int(cfg.runtime.preempt_check_every), 1)
                if iteration % every == 0:
                    from jax.experimental import multihost_utils

                    hit = bool(multihost_utils.process_allgather(
                        np.asarray(_preempt["hit"])).any())
                else:
                    hit = False
            if hit:
                log.warning("preemption: stopping before iter %d; "
                            "resume with --start_from", iteration + 1)
                break
            phase = curriculum[min(iteration, len(curriculum) - 1)] if iter_indexed \
                else curriculum[epoch]
            new_lr = current_lr(cfg, epoch)
            if new_lr != lr:
                lr = new_lr
                state = set_lr(state, lr)
            ss_prob = current_ss_prob(cfg, epoch)

            t0 = tic()
            batch, meta = loader.get_batch("train")
            tm["loader"] += tic() - t0
            if meta.proposal_num <= 0 or meta.n_frames <= 1:
                bad_video_num += 1
                if meta.wrapped:
                    epoch += 1
                continue
            t0 = tic()
            batch = _compress_batch(batch, cfg)
            tm["compress"] += tic() - t0

            sc_flag = (
                cfg.train.self_critical_after != -1
                and epoch >= cfg.train.self_critical_after
                and phase != "tap"
            )
            rng, step_rng = jax.random.split(rng)
            if sc_flag:
                if collator is not None:
                    # batched SCST (net-new): vmapped sampled+greedy rollouts,
                    # host METEOR rewards per video, one policy-gradient update
                    t0 = tic()
                    res = collator.add(batch, meta)
                    tm["collate"] += tic() - t0
                    if res is None:
                        if meta.wrapped:
                            epoch += 1
                        continue
                    stacked, metas = res
                    t0 = tic()
                    state, metrics = _self_critical_step_batched(
                        state, stacked, metas, rl_cfg, phase, step_rng, dataset,
                        mesh=mesh, multihost=multihost,
                    )
                    tm["step"] += tic() - t0
                else:
                    t0 = tic()
                    state, metrics = _self_critical_step(
                        state, batch, meta, rl_cfg, phase, step_rng, dataset
                    )
                    tm["step"] += tic() - t0
            elif cfg.train.m_batch > 1:
                # accumulate summed grads over m_batch iterations, one update
                # (reference: train.py:281-283,294,316-329)
                from echr_tpu.engine.steps import apply_grads, grad_step

                t0 = tic()
                stacked = _stack_batch(batch)
                tm["collate"] += tic() - t0
                # rl_cfg: grad_step is an auto-partitioned jit (see rl_cfg above)
                t0 = tic()
                grads, metrics = grad_step(
                    state, stacked, step_rng, rl_cfg, phase,
                    ss_prob=ss_prob,
                )
                acc_grads = grads if acc_grads is None else jax.tree.map(
                    jnp.add, acc_grads, grads
                )
                if (iteration + 1) % cfg.train.m_batch == 0:
                    state = apply_grads(state, acc_grads[0], acc_grads[1], cfg, phase)
                    acc_grads = None
                tm["step"] += tic() - t0
            elif collator is not None:
                t0 = tic()
                res = collator.add(batch, meta)
                tm["collate"] += tic() - t0
                if res is None:
                    if meta.wrapped:
                        epoch += 1
                    continue
                stacked, _ = res
                t0 = tic()
                if mesh is not None:
                    stacked = _shard_batch(stacked, mesh, multihost)
                if use_shard_map:
                    from echr_tpu.engine.steps import train_step_shard_map

                    state, metrics = train_step_shard_map(
                        state, stacked, step_rng, cfg, phase, mesh=mesh,
                        ss_prob=ss_prob,
                    )
                else:
                    state, metrics = train_step(
                        state, stacked, step_rng, cfg, phase, ss_prob=ss_prob
                    )
                tm["step"] += tic() - t0
            else:
                t0 = tic()
                stacked = _stack_batch(batch)
                tm["collate"] += tic() - t0
                t0 = tic()
                state, metrics = train_step(
                    state, stacked, step_rng, cfg, phase, ss_prob=ss_prob
                )
                tm["step"] += tic() - t0
            iteration += 1
            t0 = tic()
            metrics = jax.device_get(metrics)  # ONE host crossing for the whole
            # dict — per-key float() was len(metrics) sequential relay RTTs
            tm["fetch"] += tic() - t0
            loss_now = float(metrics.get("loss", 0.0))
            if not np.isfinite(loss_now):
                # failure containment (net-new; the reference would silently
                # poison its weights): log and keep going — the optimizer state
                # already absorbed the step, so flag loudly for the operator
                log.warning("non-finite loss %s at iter %d (vid %s, phase %s)",
                            loss_now, iteration, meta.vid, phase)
            for k, v in metrics.items():
                loss_sum[k] = loss_sum.get(k, 0.0) + float(v)
            loss_count += 1
            tm["iters"].append((iteration, tic()))

            if meta.wrapped:
                epoch += 1

            t_boundary = tic()
            if iteration % cfg.save.losses_log_every == 0:
                _log_boundary(iteration, epoch, phase)

            if (
                iteration % cfg.save.save_checkpoint_every == 0
                and epoch >= cfg.save.min_epoch_when_save
            ):
                _ckpt_boundary(iteration, epoch, phase, ss_prob, step_rng, batch,
                               state)

            tm["boundary"] += tic() - t_boundary
            if max_iterations and iteration >= max_iterations:
                break
            if _preempt["hit"]:
                log.warning("preemption: checkpointing at iter %d and exiting; "
                            "resume with --start_from", iteration)
                break

    finally:
        # a loop-body exception must not leak the daemon watchdog
        # thread (it would dump stacks every deadline for the rest
        # of the process); the eval loops do the same
        wd.stop()
    _restore_preemption_handler(_preempt)
    # tp-sharded leaves need the collective resharding on every process;
    # replicated (dp-only) leaves are host-addressable as-is
    final_state = (_localize(state, mesh)
                   if multihost and mesh.shape["model"] > 1 else state)
    if is_p0:
        _save(final_state, cfg, save_folder, iteration, epoch, best_val_score,
              loader, histories, dataset)
    tb.close()
    if timing_out is not None:
        timing_out.update(tm)
    return {
        "iteration": iteration,
        "epoch": epoch,
        "best_val_score": best_val_score,
        "save_folder": save_folder,
        "state": state,
        "config": cfg,
        "loader": loader,
    }


def _localize(tree, mesh):
    """Fetch global arrays to host-local numpy on EVERY process.  Leaves
    that are not fully replicated (tensor-parallel shards under tp>1) are
    first resharded to replicated — a cross-process allgather collective,
    so this must be called by all processes together (never inside a
    process-0-only branch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P()) if mesh is not None else None

    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_replicated:
            x = jax.device_put(x, rep)
        return np.asarray(x)

    return jax.tree.map(f, tree)


def _replicate_global(tree, mesh):
    """Lift host-local (identical-on-every-process) arrays to replicated
    global arrays on a multi-process mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def put(x):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, rep, lambda idx: arr[idx])

    return jax.tree.map(put, tree)


def _shard_batch(stacked: VideoBatch, mesh, multihost: bool) -> VideoBatch:
    """Split the [B, ...] batch over the mesh's data axis.  Multi-host: the
    host pipeline is replicated (every process holds the full batch), so
    each leaf becomes a global array whose shards are served locally."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("data"))
    if multihost:
        def put(x):
            arr = np.asarray(x)
            return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])
    else:
        def put(x):
            return jax.device_put(x, s)
    return jax.tree.map(put, stacked)


def _self_critical_step(state, batch, meta, cfg, phase, step_rng, dataset):
    """SCST iteration (working replacement for the reference's broken
    self-critical path, train.py:243,303-308)."""
    import jax.numpy as jnp

    from echr_tpu.engine.rl import default_reward_pool, self_critical_reward
    from echr_tpu.engine.steps import rl_rollout_step, rl_update_step

    tap_l, gen_seq, greedy_seq = rl_rollout_step(
        state.tap_params, state.cg_params, batch, cfg, phase, step_rng
    )
    if phase in ("cg", "gt_tap_cg"):
        gt_sentences = list(meta.sentences)
        prop_mask = batch.gts_mask
    else:
        gt_sentences = [meta.sentences[int(j)] for j in meta.cg_select]
        prop_mask = batch.prop_mask
    reward = self_critical_reward(
        np.asarray(gen_seq), np.asarray(greedy_seq), gt_sentences,
        dataset.ix_to_word, np.asarray(prop_mask),
        meteor_weight=cfg.train.meteor_reward_weight,
        pool=default_reward_pool(),
    )
    return rl_update_step(
        state, batch, cfg, phase, step_rng, gen_seq, jnp.asarray(reward)
    )


def _self_critical_step_batched(state, stacked, metas, cfg, phase, step_rng,
                                dataset, mesh=None, multihost=False):
    """Batched SCST iteration: one vmapped rollout for `batch_size` videos,
    per-video host METEOR rewards, one policy-gradient update.  Identical
    per-video math to _self_critical_step (same reward, same replayed
    dropout/sampling rng per row); the batching amortizes the device
    dispatch and the host round trip — net-new, the reference's SCST is
    broken and per-video (train.py:241-245,303-308).

    mesh: data-parallel RL — the video batch shards over the mesh's data
    axis (rollout + policy-gradient update partitioned by XLA, gradient
    psum over ICI like train_step).  Multi-host: each process computes
    METEOR rewards only for the batch rows resident on its devices (the
    host pipeline is replicated, so metas agree everywhere); the reward
    array is assembled shard-locally into a global array."""
    import jax.numpy as jnp

    from echr_tpu.engine.rl import (
        default_reward_pool,
        self_critical_reward_batched,
    )
    from echr_tpu.engine.steps import (
        rl_pullback_update_step_batched,
        rl_rollout_step_batched,
        rl_rollout_vjp_step_batched,
        rl_update_step_batched,
    )

    # host copies of the masks BEFORE sharding (global arrays on a
    # multi-host mesh are not fully addressable)
    gts_mask = np.asarray(stacked.gts_mask)
    prop_mask = np.asarray(stacked.prop_mask)
    if mesh is not None:
        stacked = _shard_batch(stacked, mesh, multihost)
    # resident-vjp SCST: the rollout exports its sampled-pass VJP residuals
    # as device arrays, so the update skips the forced re-decode forward
    # (engine/steps.py "Resident-VJP SCST").  Single-process only — under a
    # mesh the residual export would pin GSPMD layouts we haven't validated.
    use_vjp = bool(cfg.runtime.scst_resident_vjp) and mesh is None
    if use_vjp:
        tap_l, logps, gen_seq, greedy_seq, res = rl_rollout_vjp_step_batched(
            state.tap_params, state.cg_params, stacked, cfg, phase, step_rng
        )
    else:
        tap_l, gen_seq, greedy_seq = rl_rollout_step_batched(
            state.tap_params, state.cg_params, stacked, cfg, phase, step_rng
        )

    def rows_of(arr):
        """{global row index: [N, L] numpy} for rows this host can read."""
        if not multihost:
            a = np.asarray(arr)
            return {i: a[i] for i in range(a.shape[0])}
        out = {}
        for sh in arr.addressable_shards:
            r0 = sh.index[0].start or 0
            d = np.asarray(sh.data)
            for j in range(d.shape[0]):
                out[r0 + j] = d[j]
        return out

    gen_rows, greedy_rows = rows_of(gen_seq), rows_of(greedy_seq)
    gts, pms = {}, {}
    for i in gen_rows:
        m = metas[i]
        if phase in ("cg", "gt_tap_cg"):
            gts[i] = list(m.sentences)
            pms[i] = gts_mask[i]
        else:
            gts[i] = [m.sentences[int(j)] for j in m.cg_select]
            pms[i] = prop_mask[i]
    # all B*N rows scored as one flat list over the reward pool (process
    # parallelism across host cores; serial fallback on 1-core hosts)
    rewards = self_critical_reward_batched(
        gen_rows, greedy_rows, gts, dataset.ix_to_word, pms, len(metas),
        meteor_weight=cfg.train.meteor_reward_weight,
        pool=default_reward_pool(),
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P("data"))
        if multihost:
            # each process serves its own rows; rows it could not score
            # live on other processes' devices and are never read locally
            reward = jax.make_array_from_callback(
                rewards.shape, s, lambda idx: rewards[idx])
        else:
            reward = jax.device_put(jnp.asarray(rewards), s)
    else:
        reward = jnp.asarray(rewards)
    if use_vjp:
        return rl_pullback_update_step_batched(
            state, stacked, cfg, phase, step_rng, gen_seq, reward,
            tap_l, logps, res,
        )
    return rl_update_step_batched(
        state, stacked, cfg, phase, step_rng, gen_seq, reward,
    )


def _run_eval(state: TrainState, loader: Loader, cfg: Config, save_folder: str,
              iteration: int, phase: str, multihost: bool = False, mesh=None):
    """Checkpoint-gating evaluation (reference: train.py:366-415): TAP phases
    score proposals only (F1); CG phases always run the GT-proposal eval
    with full metrics and, unless --fast_eval_cg, additionally the
    model-proposal (tap_cg) eval whose scores gate the checkpoint.

    cfg.eval.batch_videos > 1 routes through eval_split_batched —
    prediction- and loss-identical (tests/test_eval_batched.py,
    tests/test_train_gate_batched.py) but many videos per device program;
    the per-video path remains the 0/1 fallback.

    multihost: `loader` is the val-sharded eval loader; each process
    evaluates its shard with process-LOCAL params (the eval loop's group
    count differs per host, so it cannot be a collective program) and the
    predictions/losses are all-gathered — identical full-split scores on
    every process."""
    tap_p, cg_p = state.tap_params, state.cg_params
    if multihost:
        from echr_tpu.engine.evaluate import eval_split_batched

        # localize global params (collective allgather for tp-sharded
        # leaves) for process-local eval compute
        tap_p = jax.tree.map(jnp.asarray, _localize(tap_p, mesh))
        cg_p = jax.tree.map(jnp.asarray, _localize(cg_p, mesh))

        def runner(_tp, _cp, *a, **k):
            return eval_split_batched(
                _tp, _cp, *a, batch_videos=max(cfg.eval.batch_videos, 2),
                multihost=True, **k)
    elif cfg.eval.batch_videos > 1:
        from echr_tpu.engine.evaluate import eval_split_batched

        # single-host multi-chip training: shard the gating eval's video
        # axis over the same mesh instead of idling every chip but one
        # (eval_split_batched replicates the params and pads groups to a
        # dp multiple; identical outputs)
        def runner(*a, **k):
            return eval_split_batched(
                *a, batch_videos=cfg.eval.batch_videos, mesh=mesh, **k)
    else:
        runner = eval_split
    json_path = os.path.join(save_folder, "pred_sent", f"pred_iter{iteration}.json")
    n_eval = cfg.eval.num_vids_eval or loader.split_size("val")
    if multihost and cfg.eval.num_vids_eval:
        # the eval loader is val-SHARDED: a per-process cap of num_vids_eval
        # would evaluate P*num_vids_eval videos in total — divide it so the
        # gathered gate sees ~num_vids_eval videos regardless of host count
        # (the sampled SET still differs from single-host: shard striding)
        n_eval = -(-cfg.eval.num_vids_eval // jax.process_count())
    if phase == "tap":
        preds, scores, val_loss = runner(
            tap_p, cg_p, loader, cfg, json_path,
            {"num_vids_eval": n_eval, "topN": 1000, "val_all_metrics": False},
            flag_eval_what="tap",
        )
        scores2 = scores
    else:
        preds2, scores2, val_loss2 = runner(
            tap_p, cg_p, loader, cfg,
            json_path.replace(".json", "_gt.json"),
            {"num_vids_eval": n_eval, "topN": 100, "val_all_metrics": True},
            flag_eval_what="cg",
        )
        if cfg.eval.fast_eval_cg:
            preds, scores, val_loss = preds2, scores2, val_loss2
        else:
            preds, scores, val_loss = runner(
                tap_p, cg_p, loader, cfg, json_path,
                {"num_vids_eval": n_eval, "topN": 100, "val_all_metrics": False},
                flag_eval_what="tap_cg",
            )
    recall = np.asarray(scores.get("Recall", [0.0]))
    precision = np.asarray(scores.get("Precision", [0.0]))
    f1 = float((2 * recall * precision / np.maximum(recall + precision, 1e-8)).mean())
    if phase != "tap":
        current = float(np.asarray(scores.get("METEOR", [0.0])).mean() * 100)
    else:
        current = f1
    mean_scores = {k: float(np.asarray(v).mean()) for k, v in scores.items()}
    gt_means = {k: float(np.asarray(v).mean()) for k, v in scores2.items()}
    log.info("eval iter %d: score=%.4f f1=%.4f all=%s gt=%s val_loss=%s",
             iteration, current, f1, mean_scores, gt_means,
             np.round(val_loss, 4).tolist())
    return current, scores


def _install_preemption_handler() -> Dict:
    """Route SIGTERM to a flag the train loop polls at iteration
    boundaries (graceful preemption, SURVEY §5.3 net-new).  Returns a box
    {"hit": bool, "prev": handler}; no-op off the main thread (signal
    handlers are main-thread-only — e.g. train() under a test harness
    thread), where "prev" stays None and the flag can simply never fire."""
    import signal

    box: Dict = {"hit": False, "prev": None}

    def handler(signum, frame):
        box["hit"] = True
        log.warning("SIGTERM received: will checkpoint at the next "
                    "iteration boundary and exit cleanly")

    try:
        box["prev"] = signal.signal(signal.SIGTERM, handler)
        box["installed"] = True
    except ValueError:  # not the main thread
        box["installed"] = False
    return box


def _restore_preemption_handler(box: Dict) -> None:
    if box.get("installed"):
        import signal

        signal.signal(signal.SIGTERM, box["prev"] or signal.SIG_DFL)


def _save(state, cfg, save_folder, iteration, epoch, best_val_score, loader,
          histories, dataset, best: bool = False, loader_state: Dict = None):
    # loader_state override: the pipelined train loop's producer thread runs
    # ahead of the consumed stream, so checkpoints must record the snapshot
    # taken at the consumed step (see _PrepItem.loader_state), not the live
    # producer cursor
    name = "model-best.ckpt" if best else "model-last.ckpt"
    ckpt.save_checkpoint(
        os.path.join(save_folder, name), state, cfg,
        iteration=iteration, epoch=epoch, best_val_score=best_val_score,
        loader_state=(loader.state() if loader_state is None else loader_state),
        histories=histories, vocab=dataset.ix_to_word,
    )
    if not best and cfg.save.save_all_checkpoint:
        # per-iteration files (reference: --save_all_checkpoint, train.py:463-466)
        import shutil

        src = os.path.join(save_folder, name)
        dst = os.path.join(save_folder, f"model_iter_{iteration}.ckpt")
        shutil.copyfile(src, dst)
        if os.path.exists(src + ".config.json"):
            shutil.copyfile(src + ".config.json", dst + ".config.json")


# fields the CLI keeps control of across a resume
# (reference: exclude_opt, train.py:126-129)
_RESUME_EXCLUDE = {
    "train": ("training_mode", "tap_epochs", "cg_epochs", "tapcg_epochs", "lr",
              "learning_rate_decay_start", "learning_rate_decay_every",
              "learning_rate_decay_rate", "self_critical_after"),
    "save": ("save_checkpoint_every", "pretrain", "pretrain_path",
             "save_all_checkpoint", "min_epoch_when_save", "start_from",
             "start_from_mode", "no_exclude_opt"),
}


def overlay_resumed_config(cli_cfg: Config, saved_cfg: Config) -> Config:
    """Resume config overlay: the checkpoint's config wins except the
    schedule/id flags the CLI keeps (reference: train.py:126-148;
    --no_exclude_opt makes the saved config win everywhere)."""
    if cli_cfg.save.no_exclude_opt:
        return saved_cfg
    cfg = saved_cfg.replace(run_id=cli_cfg.run_id, debug=cli_cfg.debug)
    for section, names in _RESUME_EXCLUDE.items():
        cfg = cfg.replace_in(
            section, **{n: getattr(getattr(cli_cfg, section), n) for n in names}
        )
    return cfg


def _snapshot_source(save_folder: str) -> None:
    """Snapshot the framework source into the run folder so results trace to
    exact code (reference: train.py:99-106 copies models/, misc/, train.py
    etc. into the save dir)."""
    import shutil

    dst = os.path.join(save_folder, "src_snapshot")
    if os.path.exists(dst):
        return
    try:
        import echr_tpu

        src = os.path.dirname(os.path.abspath(echr_tpu.__file__))
        shutil.copytree(
            src, os.path.join(dst, "echr_tpu"),
            ignore=shutil.ignore_patterns("__pycache__", "*.so", "*.pyc"),
        )
    except Exception as e:  # snapshotting must never break training
        log.warning("source snapshot failed: %s", e)


class _NullTB:
    """TB sink for non-zero processes: compute everywhere, write on p0."""

    def scalar(self, *a, **k):
        pass

    def histogram(self, *a, **k):
        pass

    def close(self):
        pass


def _setup_logger(save_folder: str, write_files: bool = True) -> None:
    fmt = "[%(asctime)s] %(message)s"
    logging.basicConfig(format=fmt, datefmt="%d %H:%M", level=logging.INFO)
    root = logging.getLogger("echr_tpu")
    root.setLevel(logging.INFO)
    if write_files:  # single-writer log files (multi-host: process 0 only)
        fh = logging.FileHandler(os.path.join(save_folder, "train.log"))
        fh.setFormatter(logging.Formatter(fmt))
        root.addHandler(fh)
