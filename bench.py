"""Benchmark: captions/sec/chip on the flagship ECHR configuration.

Workload = the reference's eval inner loop per video (SURVEY §3.3): SST
encode over the C3D sequence, hierarchical context build + TSRM relation
attention, and greedy decode of one caption per proposal — at reference
dims (video_dim 500, hidden 512, d_feats/d_o 512, 16 heads, vocab ~6000,
30-step captions, 128 proposals/video, T=256 frame bucket).

Baseline for `vs_baseline`: the reference architecture re-created with
stock torch modules (tests/oracle_torch.py — the same oracle the parity
tests gate against) running the same workload on this host's CPU, the only
baseline measurable in this environment (the reference's PyTorch-0.4 GPU
numbers are unpublished, BASELINE.md).  Torch runs with all host cores;
per-caption cost is measured at a smaller proposal count and scaled
linearly (reference cost is linear in N: its per-step attention re-projects
every proposal window).

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

N_PROPS = 128
N_TORCH_PROPS = 16
VOCAB = 6000
SEQ_LEN = 30
T_BUCKET = 256
TIMED_ITERS = 30
WARMUP_ITERS = 3
BATCH_VIDEOS = 32  # batched serving pipeline (throughput still rising at 32)
WINDOWS = 3  # best-of-N measurement windows (relay contention)
BEAM_SAMPLES = 20  # beam-latency percentile sample count
E2E_TRAIN_ITERS = 60  # also trains the weights the fidelity section reuses
E2E_EVAL_VIDEOS = 384  # -> 96-video val split


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    import jax

    # persistent compile cache — compiles through the axon relay are
    # minutes each; every caller (bench main AND the experiments/ probes
    # that import build) wants it
    from echr_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from echr_tpu.config import flagship_config

    cfg = flagship_config()
    cfg = cfg.replace_in("data", synthetic=True, lda_dim=100, time_buckets=(T_BUCKET,))
    cfg = cfg.replace_in("decoder", CG_vocab_size=VOCAB, CG_seq_length=SEQ_LEN)
    cfg = cfg.validate()

    from echr_tpu.models.registry import init_captioner, init_tap

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    tap_params = init_tap(k1, cfg)
    cg_params = init_captioner(k2, cfg)
    return cfg, tap_params, cg_params


def make_inputs(cfg, seed=0):
    rng = np.random.RandomState(seed)
    T = T_BUCKET
    feats = rng.randn(T, cfg.tap.video_dim).astype(np.float32) * 0.5
    lda = rng.randn(cfg.data.lda_dim).astype(np.float32)
    frame_mask = np.ones((T,), np.float32)
    starts = rng.randint(0, T - 8, size=N_PROPS)
    lens = rng.randint(4, 48, size=N_PROPS)
    soi = np.stack([starts, np.minimum(starts + lens, T)], 1).astype(np.int32)
    ind = (soi[:, 1] - 1).astype(np.int32)
    return feats, lda, frame_mask, ind, soi


def bench_jax(cfg, tap_params, cg_params, feats, lda, frame_mask, ind, soi):
    import jax
    import jax.numpy as jnp

    from echr_tpu.engine.steps import decode_step
    from echr_tpu.models.captioner import ProposalBatch
    from echr_tpu.models.sst import sst_forward

    encode = jax.jit(lambda p, f: sst_forward(p, f, train=False))
    props = ProposalBatch(jnp.asarray(ind), jnp.asarray(soi), jnp.ones((N_PROPS,), jnp.float32))
    feats_d = jnp.asarray(feats)
    lda_d = jnp.asarray(lda)
    fm_d = jnp.asarray(frame_mask)

    def one_video():
        tap_feats, scores = encode(tap_params, feats_d)
        seq, logps, active = decode_step(
            cg_params, cfg, tap_feats, feats_d, lda_d, fm_d, props
        )
        # fetch token ids to host — what eval actually consumes; also the
        # only reliable completion barrier through the axon relay (its
        # block_until_ready returns before execution finishes)
        return np.asarray(seq)

    log("compiling...")
    t0 = time.time()
    one_video()
    log(f"compile+first run: {time.time()-t0:.1f}s")
    for _ in range(WARMUP_ITERS):
        one_video()
    t0 = time.time()
    for _ in range(TIMED_ITERS):
        seq = one_video()
    dt = time.time() - t0
    cps = N_PROPS * TIMED_ITERS / dt
    log(f"jax: {TIMED_ITERS} videos x {N_PROPS} proposals in {dt:.2f}s -> {cps:.1f} captions/s")
    return cps


def bench_jax_batched(cfg, tap_params, cg_params, feats, lda, frame_mask, ind, soi):
    """Batched serving pipeline: B videos encoded + decoded per program."""
    import jax
    import jax.numpy as jnp

    from echr_tpu.engine.steps import decode_step_batched, encode_step_batched
    from echr_tpu.models.captioner import ProposalBatch

    B = BATCH_VIDEOS
    rng = np.random.RandomState(1)
    feats_b = jnp.asarray(
        np.stack([feats + 0.01 * rng.randn(*feats.shape).astype(np.float32) for _ in range(B)])
    )
    lda_b = jnp.asarray(np.tile(lda[None], (B, 1)))
    fm_b = jnp.asarray(np.tile(frame_mask[None], (B, 1)))
    props = ProposalBatch(
        jnp.asarray(np.tile(ind[None], (B, 1))),
        jnp.asarray(np.tile(soi[None], (B, 1, 1))),
        jnp.ones((B, N_PROPS), jnp.float32),
    )

    def dispatch():
        tap_feats, _ = encode_step_batched(tap_params, feats_b, cfg)
        seq, logps, active = decode_step_batched(
            cg_params, cfg, tap_feats, feats_b, lda_b, fm_b, props
        )
        return seq

    log("compiling batched pipeline...")
    t0 = time.time()
    np.asarray(dispatch())
    log(f"batched compile+first run: {time.time()-t0:.1f}s")
    for _ in range(WARMUP_ITERS):
        np.asarray(dispatch())
    # two batches in flight: the next dispatch overlaps the previous fetch,
    # hiding host<->device round-trip latency
    iters = max(2 * TIMED_ITERS // B, 8)

    def window():
        t0 = time.time()
        pending = dispatch()
        for _ in range(iters - 1):
            nxt = dispatch()
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        return time.time() - t0

    # best of N windows: the shared axon relay adds transient contention
    # (observed 15% swings between back-to-back runs); peak window is the
    # stable device-throughput measurement
    dts = [window() for _ in range(WINDOWS)]
    dt = min(dts)
    cps = B * N_PROPS * iters / dt
    log(f"jax-batched: {iters} x {B} videos x {N_PROPS} proposals, best window "
        f"{dt:.2f}s of {['%.2f' % d for d in dts]} -> {cps:.1f} captions/s")
    return cps


def bench_beam_latency(cfg, tap_params, cg_params, feats, lda, frame_mask, ind, soi):
    """p50 beam-search latency per video (BASELINE.md secondary metric)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from echr_tpu.engine.steps import beam_decode_step, decode_step
    from echr_tpu.models.captioner import ProposalBatch
    from echr_tpu.models.sst import sst_forward

    encode = jax.jit(lambda p, f: sst_forward(p, f, train=False))
    props = ProposalBatch(jnp.asarray(ind), jnp.asarray(soi), jnp.ones((N_PROPS,), jnp.float32))
    fd, ld, fmd = jnp.asarray(feats), jnp.asarray(lda), jnp.asarray(frame_mask)
    tap_feats, _ = encode(tap_params, fd)

    out = {}
    for beam in (4,):
        seq, lp = beam_decode_step(cg_params, cfg, tap_feats, fd, ld, fmd, props, beam)
        _ = np.asarray(seq)  # compile + barrier
        samples = []
        for _ in range(BEAM_SAMPLES):
            t0 = _t.time()
            seq, lp = beam_decode_step(cg_params, cfg, tap_feats, fd, ld, fmd, props, beam)
            _ = np.asarray(seq)
            samples.append(_t.time() - t0)
        p50 = float(np.percentile(samples, 50))
        p99 = float(np.percentile(samples, 99))
        log(f"beam-{beam} p50 latency: {1000*p50:.1f} ms/video, "
            f"p99 {1000*p99:.1f} ms ({N_PROPS} proposals)")
        out = {"beam_size": beam, "p50_ms": round(1000 * p50, 2),
               "p99_ms": round(1000 * p99, 2), "n_props": N_PROPS}
    return out


def bench_train(cfg, tap_params, cg_params):
    """Training throughput: full train_step (SST + TAP loss + contexts +
    TSRM + teacher-forced three_stream + dual-Adam update) at flagship dims,
    bucketed B in {1, 8, 32} — mirrors the reference's only perf log, its
    time/batch line (reference: train.py:343-349)."""
    import jax

    from echr_tpu.data.batcher import make_batch
    from echr_tpu.data.dataset import SyntheticDataset
    from echr_tpu.engine.steps import init_train_state, train_step

    import jax.numpy as jnp

    ds = SyntheticDataset(cfg, num_videos=4, seed=7)
    ex = ds.get_example(0)
    ex.cap_labels = np.clip(ex.cap_labels, 0, cfg.decoder.CG_vocab_size)
    host, _ = make_batch(ex, cfg, np.random.RandomState(0), w1=ds.w1)
    rng = jax.random.PRNGKey(3)

    results = {}
    for B in (1, 8, 32):
        batch = jax.tree.map(
            lambda x: np.broadcast_to(np.asarray(x)[None], (B,) + np.asarray(x).shape).copy(),
            host,
        )
        # pre-stage the batch on device: each step otherwise ships ~20 MB
        # host->device through the axon relay tunnel, whose fluctuating
        # bandwidth dominates and destabilises the measurement (observed
        # 2-3x run-to-run swings).  Real training overlaps H2D with the
        # loader thread pool; this times the step itself, like the eval
        # bench's device-resident inputs.
        batch = jax.tree.map(jnp.asarray, batch)
        # fresh param copies per B: train_step donates its state buffers
        st = init_train_state(
            cfg,
            jax.tree.map(jnp.array, tap_params),
            jax.tree.map(jnp.array, cg_params),
        )
        t0 = time.time()
        st, metrics = train_step(st, batch, rng, cfg, "tap_cg")
        _ = float(np.asarray(metrics["loss"]))
        log(f"train B={B}: compile+first {time.time()-t0:.1f}s")
        for _i in range(2):
            st, metrics = train_step(st, batch, rng, cfg, "tap_cg")
        _ = float(np.asarray(metrics["loss"]))
        iters = 10
        dts = []
        for _w in range(WINDOWS):  # best-of-N windows (relay contention)
            t0 = time.time()
            for _i in range(iters):
                st, metrics = train_step(st, batch, rng, cfg, "tap_cg")
            _ = float(np.asarray(metrics["loss"]))  # completion barrier
            dts.append(time.time() - t0)
        dt = min(dts)
        results[B] = {
            "videos_per_s": round(B * iters / dt, 2),
            "time_per_batch_s": round(dt / iters, 4),
        }
        log(f"train B={B}: {iters} steps in {dt:.2f}s -> "
            f"{results[B]['videos_per_s']} videos/s, "
            f"time/batch {results[B]['time_per_batch_s']}s")
    results["shapes"] = {  # for the roofline's analytic FLOP model
        "N": int(host.ind_select.shape[0]),
        "L": int(host.cg_labels.shape[1]),
        "T": int(host.feats.shape[0]),
    }
    return results


def e2e_train_cfg(B: int = 32, run_id: str = "bench_e2e_train"):
    """Shared flagship e2e-train-loop config (bench_e2e_train AND
    experiments/probe_train_e2e.py build from here, so the probe's A/B
    numbers stay comparable to the bench JSON line): synthetic data at
    bench dims, cotrain curriculum, eval/checkpoint disabled."""
    import tempfile

    from echr_tpu.config import flagship_config

    tmp = tempfile.mkdtemp(prefix=run_id + "_")
    cfg = flagship_config()
    cfg = cfg.replace_in(
        "data", synthetic=True, lda_dim=100, time_buckets=(T_BUCKET,),
        synthetic_vocab_size=VOCAB, synthetic_seq_length=SEQ_LEN,
        synthetic_num_videos=256, synthetic_cache_videos=256,
        # learnable captions (pattern-derived): content doesn't change the
        # static-shape step cost, but the state bench_e2e_train returns is
        # then genuinely trained — the fidelity/trained-eval sections reuse
        # it so early-exit/beam behave like production (VERDICT r4 next-5)
        synthetic_learnable=True,
    )
    cfg = cfg.replace_in(
        "train", training_mode="cotrain", tap_epochs=0, cg_epochs=0,
        tapcg_epochs=10**6, batch_size=B, self_critical_after=-1, m_batch=1,
    )
    cfg = cfg.replace_in(
        "save", checkpoint_path=tmp, losses_log_every=10**9,
        save_checkpoint_every=10**9, min_epoch_when_save=10**9,
    )
    return cfg.replace(run_id=run_id).validate()


def bench_e2e_train(B: int = 32, iters: int = None, skip: int = 6,
                    return_state: bool = False):
    """E2e train-LOOP throughput: the real train() — loader pulls, bucket
    collation, H2D upload, per-step metrics fetch, rng/epoch bookkeeping —
    at flagship dims on synthetic data (the reference's only perf signal is
    exactly this loop's time/batch line, train.py:343-349).  Exercises the
    pipelined loop (runtime.train_pipeline: _TrainPrep producer thread +
    deferred batched metrics flush); the gap to train_throughput's
    device-resident step rate is the pipeline's residual overhead.
    Measured over dispatch timestamps past warmup — backpressured by the
    half-window metrics flush, so steady-state dispatch rate == completion
    rate."""
    from echr_tpu.engine.train import train

    cfg = e2e_train_cfg(B)
    # bf16 feats + uint8 binary grids on the wire (_compress_batch, ~2.6x
    # smaller upload; exact under the bf16 compute_dtype every consumer
    # casts to anyway) — the upload-bound pipelined loop measured 46.5 ->
    # 109.8 videos/s same-day interleaved (probe_train_e2e --transfer)
    cfg = cfg.replace_in("runtime", transfer_dtype="bfloat16").validate()
    if iters is None:
        iters = E2E_TRAIN_ITERS  # read at call time: --warm shrinks it
    tm: dict = {}
    out = train(cfg, max_iterations=iters, timing_out=tm)
    marks = tm["iters"]
    if len(marks) < skip + 2:
        raise RuntimeError(f"too few updates recorded ({len(marks)})")
    t0, t1 = marks[skip][1], marks[-1][1]
    n = marks[-1][0] - marks[skip][0]
    vps = n * B / (t1 - t0)
    # transport-wall breakdown (VERDICT r4 next-4): per-update ms for the
    # H2D upload ('put'), the deferred metrics device_get ('fetch'), and
    # the step dispatch ('step'), plus the host-side stages
    sections = {k: round(tm.get(k, 0.0) / len(marks) * 1e3, 1)
                for k in ("loader", "compress", "collate", "put", "step", "fetch")}
    log(f"e2e train: {vps:.1f} videos/s over {n} steady updates (B={B}); "
        f"section ms/update incl. warmup: {sections}")
    stats = {"videos_per_s": round(vps, 1), "batch": B, "updates": n,
             "ms_per_update": round((t1 - t0) / n * 1e3, 1),
             "inflight": cfg.runtime.train_inflight,
             "transfer_dtype": cfg.runtime.transfer_dtype,
             "sections_ms": sections, "weights": "init->trained-in-bench"}
    if return_state:
        # out["config"] (not cfg): train() resolved decoder vocab/seq_length
        # from the dataset — the trained-eval section needs those dims
        return stats, (out["config"], out["state"])
    return stats


def bench_rl(cfg, tap_params, cg_params, B: int = 8):
    """Batched SCST device path at flagship dims: one vmapped
    sampled+greedy rollout + one policy-gradient update for B videos
    (engine.steps.rl_rollout_step_batched / rl_update_step_batched — the
    working replacement for the reference's broken self-critical stage,
    train.py:241-245,303-308).  Host METEOR reward cost is excluded here
    (measured in-loop in BENCH_NOTES: 0.09 s/video at B=8 all-in)."""
    import jax
    import jax.numpy as jnp

    from echr_tpu.data.batcher import make_batch
    from echr_tpu.data.dataset import SyntheticDataset
    from echr_tpu.engine.steps import (
        init_train_state,
        rl_rollout_step_batched,
        rl_update_step_batched,
    )

    ds = SyntheticDataset(cfg, num_videos=4, seed=7)
    ex = ds.get_example(0)
    ex.cap_labels = np.clip(ex.cap_labels, 0, cfg.decoder.CG_vocab_size)
    host, _ = make_batch(ex, cfg, np.random.RandomState(0), w1=ds.w1)
    batch = jax.tree.map(
        lambda x: jnp.asarray(np.broadcast_to(
            np.asarray(x)[None], (B,) + np.asarray(x).shape).copy()),
        host,
    )
    st = init_train_state(cfg, jax.tree.map(jnp.array, tap_params),
                          jax.tree.map(jnp.array, cg_params))
    rng = jax.random.PRNGKey(5)

    if cfg.runtime.scst_resident_vjp:
        # resident-vjp SCST: the production single-process route — the
        # rollout exports its sampled-pass VJP residuals and the update
        # skips the forced re-decode forward (engine/steps.py)
        from echr_tpu.engine.steps import (
            rl_pullback_update_step_batched,
            rl_rollout_vjp_step_batched,
        )

        def one(st):
            tap_l, logps, gen, greedy, res = rl_rollout_vjp_step_batched(
                st.tap_params, st.cg_params, batch, cfg, "tap_cg", rng)
            reward = jnp.full(gen.shape, 0.1, jnp.float32)
            return rl_pullback_update_step_batched(
                st, batch, cfg, "tap_cg", rng, gen, reward, tap_l, logps, res)
    else:
        def one(st):
            tap_l, gen, greedy = rl_rollout_step_batched(
                st.tap_params, st.cg_params, batch, cfg, "tap_cg", rng)
            reward = jnp.full(gen.shape, 0.1, jnp.float32)
            return rl_update_step_batched(st, batch, cfg, "tap_cg", rng, gen, reward)

    t0 = time.time()
    st, m = one(st)
    _ = float(np.asarray(m["loss"]))
    log(f"rl B={B}: compile+first {time.time()-t0:.1f}s")
    st, m = one(st)
    _ = float(np.asarray(m["loss"]))
    best = 1e9
    for _w in range(WINDOWS):
        t0 = time.time()
        for _i in range(5):
            st, m = one(st)
        _ = float(np.asarray(m["loss"]))
        best = min(best, (time.time() - t0) / 5)
    out = {"videos_per_s": round(B / best, 2),
           "time_per_iter_s": round(best, 4), "batch": B}
    log(f"rl B={B}: {out['videos_per_s']} videos/s device path "
        f"({out['time_per_iter_s']}s/iter)")
    return out


def bench_e2e_eval(cfg, tap_params, cg_params, num_videos=384):
    # 384 synthetic videos -> a 96-video val split (was 48; docs/TODO.md
    # asked for a larger split to tighten the number — ~3 s/pass now)
    """End-to-end eval pipeline at flagship dims: threaded Loader ->
    batched encode -> DEVICE-side top-N proposal selection
    (select_topk_batched; the tap_cg/nms=0 path) -> batched greedy decode
    -> prediction JSON.  The wall-clock a user sees for 'evaluate the
    split' (reference: eval_utils.eval_split over ~5k videos, one video
    per Python step; here eval_split_batched).  Scoring excluded
    (host-side metrics, identical cost in either framework)."""
    import tempfile

    from echr_tpu.data.dataset import SyntheticDataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split_batched

    cfg_e = cfg.replace_in(
        "data", synthetic=True, synthetic_num_videos=num_videos,
        synthetic_vocab_size=VOCAB, synthetic_seq_length=SEQ_LEN, shuffle=False,
        # cache the whole val split (~0.5 MB/video, fullscale ~2.4 GB on a
        # 125 GB host): warm passes then measure the pipeline, not the
        # synthetic generator re-synthesizing deterministic examples —
        # the page-cache state a real .npy dataset would be in anyway
        synthetic_cache_videos=num_videos,
    )
    # production serving settings: bf16 feature transfer (halves the
    # host->device payload; the cast runs in the prefetch workers via
    # loader.set_feats_dtype — fidelity-parity tests gate the f32 path)
    cfg_e = cfg_e.replace_in("runtime", transfer_dtype="bfloat16")
    ds = SyntheticDataset(cfg_e, num_videos=num_videos, seed=11)
    # deep prefetch: the producer (~4-5 ms/video host-side) runs ahead
    # during device waits instead of stalling each 32-video group drain
    cfg_e = cfg_e.replace_in("data", prefetch=3 * BATCH_VIDEOS)
    loader = Loader(ds, cfg_e, seed=0, process_index=0, process_count=1)
    n_val = loader.split_size("val")
    with tempfile.TemporaryDirectory() as td:
        kw = {"language_eval": False, "get_eval_loss": False, "topN": N_PROPS,
              "timing_out": {}}
        # warmup pass compiles every (bucket, prop-bucket) program
        eval_split_batched(tap_params, cg_params, loader, cfg_e,
                           f"{td}/warm.json", eval_kwargs=kw,
                           flag_eval_what="tap_cg", batch_videos=BATCH_VIDEOS)
        dt, tm = 1e9, {}
        # best of 3 passes: the relay has multi-MINUTE contention phases
        # (observed 9 vs 83 videos/s same-hour on identical code), so two
        # passes can both land inside one
        for _w in range(WINDOWS):
            t0 = time.time()
            preds, _, _ = eval_split_batched(
                tap_params, cg_params, loader, cfg_e, f"{td}/bench.json",
                eval_kwargs=kw, flag_eval_what="tap_cg", batch_videos=BATCH_VIDEOS)
            w = time.time() - t0
            if w < dt:
                dt, tm = w, dict(kw["timing_out"])
    n_caps = sum(len(v) for v in preds.values())
    log(f"e2e eval: {n_val} videos ({n_caps} captions) in {dt:.2f}s -> "
        f"{n_val/dt:.1f} videos/s, {n_caps/dt:.0f} captions/s")
    # wall-time breakdown from the 3-stage pipeline (VERDICT r3 next-2):
    # where the best pass's seconds went — the dominant residual vs the
    # device decode rate should be decode_fetch (relay RTT), not host work
    brk = {k: round(v, 3) for k, v in tm.items() if isinstance(v, float)}
    log(f"e2e eval breakdown: {brk} (groups={tm.get('groups')})")
    return {"videos_per_s": round(n_val / dt, 2),
            "captions_per_s": round(n_caps / dt, 1),
            "videos": n_val, "pipeline_breakdown_s": brk}


# ---------------------------------------------------------------------------
# Roofline / MFU accounting (VERDICT r2 next-5): analytic matmul FLOPs and
# VPU-transcendental counts for the flagship programs, reported against the
# chip's peak so the "decode is VPU-bound at its architectural roof" claim
# (docs/BENCH_NOTES.md) is numeric, not narrative.
# ---------------------------------------------------------------------------

# peak dense bf16 matmul throughput per chip, FLOP/s
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,  # v5p
    "TPU v6 lite": 918e12,  # v6e (Trillium)
}


def analytic_decode_flops(cfg, n_props, t_frames, n_steps):
    """Matmul FLOPs (2*M*N*K convention) and transcendental element counts
    for greedy-decoding ONE video: SST encode + TSRM + n_steps decode steps
    of the three_stream core (models/decoder.py three_stream step,
    ops/attention.py additive path).  Embedding gathers, elementwise adds,
    and masking are excluded from the FLOP numerator (MFU convention)."""
    N, T = n_props, t_frames
    d = cfg.decoder
    E, H, Hatt = d.CG_input_encoding_size, d.CG_rnn_size, d.CG_att_hid_size
    V1 = d.CG_vocab_size + 1
    Dv = cfg.tap.video_dim  # C3D dim == clip-context (CC) dim
    Hs, K = cfg.tap.hidden_dim, cfg.tap.K
    ev, vid = cfg.event_context_dim, cfg.video_context_dim

    # SST encode: 2-layer LSTM over T + K-head scorer (models/sst.py)
    enc = 2 * 4 * Hs * (Dv + Hs) * T + 2 * 4 * Hs * (Hs + Hs) * T \
        + 2 * T * Hs * K
    # TSRM (models/tsrm.py): event embed, per-head QK, scores, grouped out
    df = cfg.fusion.d_feats
    tsrm = 2 * N * cfg.tsrm_input_dim * df + 2 * 2 * N * df * df \
        + 2 * N * N * df + 2 * N * df * cfg.fusion.d_o
    # attention precompute: ctx2att over the shared frames, once per video
    pre = 2 * T * Dv * Hatt
    # one decode step: 3 LSTM cells (inputs E+event / E+att / E+video),
    # query proj + alpha dot + weighted sum, logit over concat(h0,h1,h2)
    lstm = 2 * 4 * H * ((E + ev + H) + (E + Dv + H) + (E + vid + H)) * N
    att = 2 * N * H * Hatt + 2 * N * T * Hatt + 2 * N * T * Dv
    logit = 2 * N * 3 * H * V1
    step = lstm + att + logit
    matmul = enc + tsrm + pre + n_steps * step
    # transcendentals per video: the additive-attention tanh dominates
    # (N*T*Hatt per step); LSTM gate sigmoids/tanh and softmax exps follow
    tanh_att = n_steps * N * T * Hatt
    lstm_gates = n_steps * N * 3 * 5 * H + 2 * T * 5 * Hs  # 4 sigm + 1 tanh per cell
    exps = n_steps * (N * T + N * V1)  # masked softmax + log_softmax
    return {"matmul": float(matmul), "tanh_att": float(tanh_att),
            "other_transcendental": float(lstm_gates + exps),
            "per_step_matmul": float(step)}


def analytic_train_flops(cfg, n_props, t_frames, n_steps):
    """Per-video matmul FLOPs for one tap_cg train step: forward counted by
    the decode model with teacher forcing (same matmuls; the fused loss
    head computes the same [N*L, 3H] x [3H, V1] logit product), backward as
    2x forward (standard MFU convention; the remat-recomputed attention
    tanh is extra VPU work, not matmul FLOPs)."""
    f = analytic_decode_flops(cfg, n_props, t_frames, n_steps)
    return {"matmul": 3.0 * f["matmul"],
            # remat recomputes the attention tanh once in the backward
            "tanh_att": 2.0 * f["tanh_att"],
            "other_transcendental": 3.0 * f["other_transcendental"]}


def bench_attention_op_probe(cfg):
    """The decode's hot op in isolation, in its most fusion-friendly form:
    a scan of additive-attention steps (tanh over [B, N, T, Hatt] + alpha
    dot + masked softmax + weighted sum — ops/attention.py) at the exact
    batched-decode shapes, nothing else.  Per-step time bounds what any
    decode step containing this op can take, so comparing the full
    pipeline's achieved tanh rate against this isolated rate turns
    "VPU-bound at the architectural roof" into a number.  r2b lesson
    (docs/BENCH_NOTES.md): isolated probes can run SLOWER than the same op
    fused inside the real scan, so ratios at/above 1 mean the pipeline
    runs the op at (or beyond) its standalone rate — the op IS the roof."""
    import jax
    import jax.numpy as jnp

    from echr_tpu.ops.attention import (
        additive_attention_init,
        additive_attention_precompute,
        additive_attention_step,
    )

    B, N, T = BATCH_VIDEOS, N_PROPS, T_BUCKET
    H, D = cfg.decoder.CG_att_hid_size, cfg.tap.video_dim
    steps = SEQ_LEN + 1
    r = np.random.RandomState(0)
    p = additive_attention_init(jax.random.PRNGKey(0), D, H, H)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)  # decode dtype
    feats = jnp.asarray(r.randn(B, T, D).astype(np.float32) * 0.5)
    mask = jnp.ones((B, N, T), jnp.float32)
    h0 = jnp.asarray(r.randn(B, N, H).astype(np.float32) * 0.5)
    pre = jax.vmap(lambda f: additive_attention_precompute(p, f, jnp.bfloat16))(feats)

    @jax.jit
    def probe(h0, p, feats, pre, mask):
        # big tensors as ARGUMENTS, not closures: closed-over constants
        # become compile-payload literals and can 413 the relay's
        # remote_compile (CLAUDE.md environment gotchas)
        def step(h, _):
            att, _w = jax.vmap(
                lambda hh, f, pa, m: additive_attention_step(p, hh, f, pa, m)
            )(h, feats, pre, mask)
            # serialize the steps through a cheap carry update
            h = h * 0.9 + att[..., :1] * 0.01
            return h, ()

        h, _ = jax.lax.scan(step, h0, None, length=steps)
        return jnp.sum(h)

    float(np.asarray(probe(h0, p, feats, pre, mask)))  # compile + barrier
    dts = []
    for _ in range(WINDOWS):
        t0 = time.time()
        float(np.asarray(probe(h0, p, feats, pre, mask)))
        dts.append(time.time() - t0)
    step_s = min(dts) / steps
    tanh_rate = B * N * T * H / step_s
    log(f"attention-op probe: {step_s*1e3:.2f} ms/step at [B{B} N{N} T{T} "
        f"H{H}] -> {tanh_rate/1e9:.1f} Gtanh/s standalone")
    return {"step_s": step_s, "tanh_per_s": tanh_rate}


def bench_roofline(cfg, cps_batched, train_stats):
    """Assemble MFU / VPU-utilisation numbers from the measured rates."""
    import jax

    kind = jax.devices()[0].device_kind
    peak = _PEAK_BF16.get(kind)
    assumed = False
    if peak is None:
        peak, assumed = _PEAK_BF16["TPU v5 lite"], True
    out = {"device_kind": kind, "peak_bf16_flops": peak,
           "peak_assumed": assumed}

    attn = bench_attention_op_probe(cfg)
    out["attn_op_step_ms"] = round(attn["step_s"] * 1e3, 3)
    out["attn_op_tanh_per_s"] = round(attn["tanh_per_s"], 0)

    if cps_batched:
        vps = cps_batched / N_PROPS  # videos/s
        f = analytic_decode_flops(cfg, N_PROPS, T_BUCKET, SEQ_LEN + 1)
        # full-pipeline per-step time for one B-video batched decode step
        step_s = BATCH_VIDEOS / vps / (SEQ_LEN + 1)
        out["decode"] = {
            "videos_per_s": round(vps, 2),
            "matmul_flops_per_video": f["matmul"],
            "achieved_flops": round(vps * f["matmul"], 0),
            "mfu": round(vps * f["matmul"] / peak, 4),
            "tanh_per_s": round(vps * f["tanh_att"], 0),
            "step_ms": round(step_s * 1e3, 3),
            # fraction of the full step the standalone attention op alone
            # would take; ~1 = the step IS the attention op (VPU roof)
            "attn_fraction_of_step": round(attn["step_s"] / step_s, 3),
            "vpu_tanh_util": round(
                vps * f["tanh_att"] / attn["tanh_per_s"], 4),
        }
        log(f"decode roofline: {out['decode']['mfu']*100:.1f}% MFU; "
            f"attention op alone = {out['decode']['attn_fraction_of_step']*100:.0f}% "
            f"of the measured step; tanh rate "
            f"{vps*f['tanh_att']/1e9:.1f} vs standalone "
            f"{attn['tanh_per_s']/1e9:.1f} Gtanh/s")

    if train_stats and 32 in train_stats:
        shp = train_stats.get("shapes", {"N": cfg.tap.prop_sample_num,
                                         "L": SEQ_LEN, "T": T_BUCKET})
        tf = analytic_train_flops(cfg, shp["N"], shp["T"], shp["L"])
        tvps = train_stats[32]["videos_per_s"]
        out["train"] = {
            "videos_per_s": tvps,
            "matmul_flops_per_video": tf["matmul"],
            "achieved_flops": round(tvps * tf["matmul"], 0),
            "mfu": round(tvps * tf["matmul"] / peak, 4),
            "tanh_per_s": round(tvps * tf["tanh_att"], 0),
            "vpu_tanh_util": round(
                tvps * tf["tanh_att"] / attn["tanh_per_s"], 4),
        }
        log(f"train roofline: {out['train']['mfu']*100:.1f}% MFU, "
            f"tanh rate {out['train']['vpu_tanh_util']*100:.0f}% of the "
            f"standalone attention-op rate")
    return out


def bench_torch(cfg, tap_params, cg_params, feats, lda, frame_mask, ind, soi):
    """Reference-architecture torch baseline on host CPU (ragged windows,
    per-step re-projected attention — the reference's actual compute)."""
    import torch

    sys.path.insert(0, "tests")
    from oracle_torch import SSTOracle, ThreeStreamOracle, TSRMOracle, padded_clip_windows

    torch.set_num_threads(max(torch.get_num_threads(), 8))
    n = N_TORCH_PROPS
    soi_t = soi[:n].astype(np.int64)
    sst = SSTOracle(tap_params, cfg.tap.video_dim, cfg.tap.hidden_dim, cfg.tap.K)
    tsrm = TSRMOracle(cg_params["fusion"], cfg.tsrm_input_dim, cfg.fusion.d_feats,
                      cfg.fusion.n_head, cfg.fusion.d_o, cfg.fusion.fST_type)
    dec = ThreeStreamOracle(cg_params["decoder"], cfg)
    feats_t = torch.from_numpy(feats)

    @torch.no_grad()
    def one_video():
        tap_h, _ = sst(feats_t)
        EC = torch.stack([feats_t[s:e].mean(0) for s, e in soi_t])
        EH = tap_h[soi_t[:, 1] - 1]
        event = tsrm(torch.cat([EC, EH], 1), soi_t)
        clip, clip_mask = padded_clip_windows(feats_t, soi_t)
        video = torch.from_numpy(lda)
        # full-length greedy decode (no early break), same step count as jax
        z = torch.zeros(3, n, dec.H)
        state = (z, z.clone())
        it = torch.zeros(n, dtype=torch.long)
        logprobs, state = dec.step(it, video, event, clip, clip_mask, state)
        for _ in range(SEQ_LEN):
            _, it = torch.max(logprobs, 1)
            logprobs, state = dec.step(it, video, event, clip, clip_mask, state)

    one_video()  # warmup
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        one_video()
    dt = time.time() - t0
    cps = n * iters / dt
    log(f"torch-cpu baseline: {iters} videos x {n} proposals in {dt:.2f}s -> {cps:.1f} captions/s")
    return cps


# ---------------------------------------------------------------------------
# Outage-proofing (VERDICT r4 next-1): round 4's driver bench record was
# `rc 124, parsed: null` — a relay hang in the FIRST compile erased ~1,000
# lines of measurement.  The guard below makes the one-line contract survive
# a sick relay: a cheap subprocess health probe runs first, every section
# runs under a wall-clock watchdog, and the JSON line is ALWAYS emitted with
# whatever completed plus an `errors` list (a hung PJRT call can't be
# interrupted in-thread, so the watchdog emits and os._exit()s).
# ---------------------------------------------------------------------------

_HEALTH_CODE = (
    "import time; t0 = time.time()\n"
    "import jax, jax.numpy as jnp, numpy as np\n"
    "x = jnp.ones((256, 256))\n"
    "v = float(np.asarray(jax.jit(lambda a: a @ a)(x))[0, 0])\n"
    "print('HEALTH_OK', v, round(time.time() - t0, 1), "
    "jax.devices()[0].device_kind, flush=True)\n"
)


def relay_health_probe(deadline_s: float = 170.0) -> dict:
    """Trivial 256x256 jit matmul in a SUBPROCESS under a hard deadline —
    the exact program that hung for 10 minutes during the round-4 outage.
    A subprocess (not SIGALRM) because a wedged PJRT call never returns to
    the Python signal handler."""
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-c", _HEALTH_CODE], capture_output=True,
            text=True, timeout=deadline_s, cwd=os.path.dirname(__file__) or ".")
        ok = p.returncode == 0 and "HEALTH_OK" in p.stdout
        detail = (p.stdout.strip().splitlines() or [""])[-1] if ok else \
            (p.stderr.strip().splitlines() or ["no output"])[-1][:200]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"trivial jit hung > {deadline_s:.0f}s (relay down?)"
    return {"ok": ok, "seconds": round(time.time() - t0, 1), "detail": detail}


def fidelity_probe(deadline_s: float = 600.0) -> dict:
    """Fidelity gates in the driver artifact (VERDICT r4 next-5): run the
    actual parity gate tests — greedy decode token-for-token and
    teacher-forced logprobs atol 5e-4 vs the torch oracle — on CPU in a
    subprocess (tests/conftest.py forces the CPU platform; relay-independent,
    so this lands in the JSON even during an outage)."""
    t0 = time.time()
    tests = [
        "tests/test_parity.py::test_greedy_decode_token_for_token",
        "tests/test_parity.py::test_teacher_forced_parity",
    ]
    try:
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             *tests],
            capture_output=True, text=True, timeout=deadline_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        passed = p.returncode == 0
        tail = (p.stdout.strip().splitlines() or [""])[-1][:200]
    except subprocess.TimeoutExpired:
        passed, tail = False, f"parity tests hung > {deadline_s:.0f}s"
    return {"greedy_token_parity": "pass" if passed else "fail",
            "teacher_forced_parity": "pass" if passed else "fail",
            "oracle": "tests/oracle_torch.py (fp32, CPU)",
            "detail": tail, "seconds": round(time.time() - t0, 1)}


def bench_trained_eval(cfg, cfg_train, state, inputs):
    """Eval-side numbers on TRAINED weights (VERDICT r4 weak-6): the
    in-bench e2e-train section trains ~60 updates on learnable-synthetic
    data and returns its state; on those weights early exit fires like
    production (shorter captions -> earlier exits) instead of the init
    params' near-uniform logits.  Reuses the init sections' compiled
    programs (identical shapes; params are runtime args).  Also scores
    greedy vs beam-4 on the learnable val split (METEOR protocol) so the
    bench artifact carries the beam>greedy fidelity signal."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from echr_tpu.data.dataset import SyntheticDataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split_batched

    # keep params DEVICE-RESIDENT: np.asarray here would silently re-upload
    # ~120 MB of params through the relay on every dispatch (measured: the
    # per-video section fell 4318 -> 10.4 captions/s that way)
    tap_t = jax.tree.map(jnp.asarray, state.tap_params)
    cg_t = jax.tree.map(jnp.asarray, state.cg_params)
    out = {"weights": f"trained(in-bench e2e-train, {E2E_TRAIN_ITERS} updates, "
                      "learnable-synthetic)"}

    # per-video captions/s with production early-exit live
    out["captions_per_s_pervideo"] = round(
        bench_jax(cfg, tap_t, cg_t, *inputs), 2)

    # greedy vs beam-4 METEOR on the trained checkpoint's own val split
    cfg_e = cfg_train.replace_in(
        "data", synthetic_num_videos=E2E_EVAL_VIDEOS, shuffle=False,
        synthetic_cache_videos=E2E_EVAL_VIDEOS, prefetch=3 * BATCH_VIDEOS)
    ds = SyntheticDataset(cfg_e, num_videos=E2E_EVAL_VIDEOS, seed=11)
    loader = Loader(ds, cfg_e, seed=0, process_index=0, process_count=1)
    n_val = loader.split_size("val")
    scores = {}
    with tempfile.TemporaryDirectory() as td:
        for name, bs in (("greedy", 1), ("beam4", 4)):
            kw = {"language_eval": True, "get_eval_loss": False,
                  "topN": N_PROPS, "beam_size": bs, "val_all_metrics": True,
                  "timing_out": {}}
            t0 = time.time()
            _, sc, _ = eval_split_batched(
                tap_t, cg_t, loader, cfg_e, f"{td}/{name}.json",
                eval_kwargs=kw, flag_eval_what="tap_cg",
                batch_videos=BATCH_VIDEOS)
            dt = time.time() - t0
            # per-tIoU lists -> the protocol's mean-over-tious scalar (x100,
            # the reference's reporting convention)
            scores[name] = {k: round(100.0 * float(np.mean(np.asarray(v))), 4)
                            for k, v in sc.items()
                            if k in ("METEOR", "CIDEr", "Bleu_4", "ROUGE_L")}
            scores[name]["wall_s"] = round(dt, 2)
            if name == "greedy":
                out["e2e_eval_videos_per_s"] = round(n_val / dt, 2)
            log(f"trained {name}: {scores[name]}")
    out["scores"] = scores
    if "METEOR" in scores.get("greedy", {}) and "METEOR" in scores.get("beam4", {}):
        out["beam_minus_greedy_METEOR"] = round(
            scores["beam4"]["METEOR"] - scores["greedy"]["METEOR"], 4)
        # these weights are ~60 updates off init (the in-bench e2e-train
        # state): beam>greedy only emerges on converged models — the
        # FULLY-trained soak checkpoints show beam-4 winning every metric
        # (docs/BENCH_NOTES.md "beam-4 beats greedy"); a negative delta
        # here reflects near-init logits, not a beam regression
        out["beam_delta_note"] = ("near-init weights; beam>greedy holds on "
                                  "converged soak checkpoints")
    return out


class BenchGuard:
    """Per-section + total wall-clock watchdog around the bench sections.

    The watchdog thread emits the (partial) one-line JSON and os._exit(0)s
    when a section overruns its budget or the total deadline passes —
    `rc 0 + parsed JSON with errors` instead of round 4's `rc 124 +
    parsed: null`."""

    def __init__(self, out: dict, total_s: float):
        self.out = out
        self.t_end = time.time() + total_s
        self.errors: list = []
        self.completed: list = []
        self._lock = threading.Lock()
        self._emitted = False
        self._sec = None
        self._sec_end = None
        self._sec_budget = None
        t = threading.Thread(target=self._watch, daemon=True)
        t.start()

    def _watch(self):
        while True:
            time.sleep(0.5)
            with self._lock:
                if self._emitted:
                    return
                sec, end, budget = self._sec, self._sec_end, self._sec_budget
            now = time.time()
            if now > self.t_end:
                self.errors.append(
                    f"total deadline exceeded during section '{sec}'")
                self.emit()
                os._exit(0)
            if sec is not None and now > end:
                self.errors.append(
                    f"section '{sec}' exceeded its {budget:.0f}s budget "
                    "(hung relay call?)")
                self.emit()
                os._exit(0)

    def run(self, name: str, budget_s: float, fn, min_needed: float = 60.0):
        """Run one section under the watchdog; on exception record the error
        and return None; skip (returning None) when the total deadline
        can't accommodate it."""
        remaining = self.t_end - time.time()
        if remaining < min(budget_s, min_needed):
            self.errors.append(
                f"section '{name}' skipped: {remaining:.0f}s of total "
                "deadline left")
            return None
        with self._lock:
            self._sec = name
            self._sec_budget = min(budget_s, remaining)
            self._sec_end = time.time() + self._sec_budget
        t0 = time.time()
        try:
            res = fn()
            self.completed.append(f"{name}:{time.time()-t0:.0f}s")
            return res
        except Exception as e:
            self.errors.append(f"section '{name}' failed: {e!r}"[:300])
            return None
        finally:
            with self._lock:
                self._sec = self._sec_end = self._sec_budget = None

    def emit(self):
        with self._lock:
            if self._emitted:
                return
            self._emitted = True
            payload = dict(self.out)
        payload["sections_completed"] = list(self.completed)
        payload["errors"] = list(self.errors)
        print(json.dumps(payload), flush=True)


def main():
    warm = "--warm" in sys.argv
    if warm:
        # --warm: compile every bench program into the persistent cache
        # (.jax_cache) with minimal iteration counts, so a later driver run
        # measures from a warm cache instead of paying minutes of relay
        # compiles (VERDICT r4 next-1d).  Prints the JSON line too, but the
        # numbers are meaningless at 1-2 iterations.
        global TIMED_ITERS, WARMUP_ITERS, WINDOWS, BEAM_SAMPLES
        global E2E_TRAIN_ITERS, E2E_EVAL_VIDEOS
        TIMED_ITERS, WARMUP_ITERS, WINDOWS, BEAM_SAMPLES = 2, 0, 1, 2
        E2E_TRAIN_ITERS, E2E_EVAL_VIDEOS = 10, 128
        log("WARM MODE: populating the compile cache, numbers not meaningful")

    total_s = float(os.environ.get(
        "BENCH_TOTAL_DEADLINE_S", 3300 if warm else 1800))
    fullscale = "--fullscale" in sys.argv

    out = {
        "metric": "captions/sec/chip (flagship ECHR eval: SST+TSRM+three_stream greedy)",
        "value": 0.0,
        "unit": "captions/s",
        "vs_baseline": None,
        # provenance: vs_baseline measures the reference architecture via
        # stock torch on THIS HOST'S CPU (the only baseline runnable here —
        # the reference's PyTorch-0.4 GPU numbers are unpublished,
        # BASELINE.md).  BASELINE.md's >=5x gate names a single-GPU torch
        # baseline; a V100-class GPU runs this recurrent per-step workload
        # O(10-100)x faster than CPU torch (generous upper bound), so the
        # GPU-equivalent estimate is vs_baseline/100 — documented in
        # docs/BENCH_NOTES.md "Baseline provenance".
        "baseline_kind": "torch-cpu",
        "vs_gpu_baseline_est": None,
        "weights": "init",
        "health": None,
        "fidelity": None,
        "beam": None,
        "train_throughput": None,
        "e2e_train": None,
        "e2e_eval": None,
        "trained": None,
        "rl": None,
        "roofline": None,
        "warm_mode": warm,
    }
    g = BenchGuard(out, total_s)

    # 1. relay health: the exact failure mode that nulled BENCH_r04
    health = g.run("health_probe", 200, lambda: relay_health_probe(170))
    out["health"] = health

    # 2. fidelity gates on CPU — relay-independent, lands even in an outage
    out["fidelity"] = g.run("fidelity", 660, lambda: fidelity_probe(600))

    if health is None or not health.get("ok"):
        g.errors.append("relay unhealthy: device sections skipped")
        g.emit()
        return

    # persistent compile cache — compiles through the axon relay are slow
    from echr_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    log(f"devices: {_devices()}")

    built = g.run("build", 420, build)
    if built is None:
        g.emit()
        return
    cfg, tap_params, cg_params = built
    inputs = make_inputs(cfg)

    cps_single = g.run(
        "single_video", 480,
        lambda: bench_jax(cfg, tap_params, cg_params, *inputs)) or 0.0
    cps_batched = g.run(
        "batched", 600,
        lambda: bench_jax_batched(cfg, tap_params, cg_params, *inputs)) or 0.0
    cps = max(cps_single, cps_batched)
    out["value"] = round(cps, 2)

    base = g.run("torch_baseline", 420,
                 lambda: bench_torch(cfg, tap_params, cg_params, *inputs))
    if base and base > 0 and cps > 0:
        out["vs_baseline"] = round(cps / base, 2)
        out["vs_gpu_baseline_est"] = round(cps / base / 100.0, 2)

    out["train_throughput"] = g.run(
        "train", 900, lambda: bench_train(cfg, tap_params, cg_params))

    e2e_tr = g.run("e2e_train", 700,
                   lambda: bench_e2e_train(return_state=True))
    trained_state = None
    if e2e_tr is not None:
        out["e2e_train"], (cfg_train, trained_state) = e2e_tr

    n_e2e = 19668 if fullscale else E2E_EVAL_VIDEOS
    # --fullscale: the REAL ActivityNet val-split size (4,917 val videos of
    # 19,668) instead of the default 96-video split — ~6 min incl. warmup;
    # see BENCH_NOTES "Full ActivityNet-scale eval sweep".
    out["e2e_eval"] = g.run(
        "e2e_eval", 2400 if fullscale else 900,
        lambda: bench_e2e_eval(cfg, tap_params, cg_params, num_videos=n_e2e))
    if out["e2e_eval"] is not None:
        out["e2e_eval"]["weights"] = "init"

    if trained_state is not None:
        out["trained"] = g.run(
            "trained_eval", 900,
            lambda: bench_trained_eval(cfg, cfg_train, trained_state, inputs))

    out["beam"] = g.run(
        "beam_latency", 480,
        lambda: bench_beam_latency(cfg, tap_params, cg_params, *inputs))
    out["rl"] = g.run("rl", 600, lambda: bench_rl(cfg, tap_params, cg_params))
    out["roofline"] = g.run(
        "roofline", 480, lambda: bench_roofline(cfg, cps_batched,
                                                out["train_throughput"]))
    g.emit()


def _devices():
    import jax

    try:
        return f"{jax.default_backend()}:{jax.local_device_count()}"
    except Exception as e:
        return f"error:{e}"


if __name__ == "__main__":
    main()
