"""Probe: does the tile-skipping kernel + window sort actually move the
REAL decode steps (engine/steps.decode_step[_batched]) at bench dims?

The isolated attention probe (probe_tile_skip.py) measured -16% on the
attention scan at T=256 with sorted realistic windows, but BENCH r4's
decode roofline is unchanged vs r3 (313 vs 311 videos/s).  Crucially that
probe generated its masks PRE-SORTED on the host — the argsort + row
gathers (event, masks) + inv_order un-permute that sort_ctxs_by_window
pays in-graph were never timed.  This probe times the full production
steps under the use_pallas x sort_decode_props grid.

At T=512 the comparison changes shape: sorted callers raise the Pallas
decode ceiling (pallas_decode_t_max_sorted=512) so sort=1 keeps the
kernel while sort=0 falls back to the jnp path (unsorted crossover 384).

Usage: python experiments/probe_decode_sort.py [T ...]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import BATCH_VIDEOS, N_PROPS, build


def make_inputs_t(cfg, T, seed=0):
    r = np.random.RandomState(seed)
    feats = r.randn(T, cfg.tap.video_dim).astype(np.float32) * 0.5
    lda = r.randn(cfg.data.lda_dim).astype(np.float32)
    starts = r.randint(0, T - 8, size=N_PROPS)
    lens = r.randint(4, 48, size=N_PROPS)
    soi = np.stack([starts, np.minimum(starts + lens, T)], 1).astype(np.int32)
    ind = (soi[:, 1] - 1).astype(np.int32)
    return feats, lda, ind, soi


def _timed(fn, iters=10):
    t0 = time.time()
    for _ in range(iters):
        fn()
    return (time.time() - t0) / iters


def bench_batched(cfg, tap_params, cg_params, T):
    from echr_tpu.engine.steps import decode_step_batched, encode_step_batched
    from echr_tpu.models.captioner import ProposalBatch

    B = BATCH_VIDEOS
    packs = [make_inputs_t(cfg, T, seed=s) for s in range(B)]
    feats_d = jnp.asarray(np.stack([p[0] for p in packs]))
    lda_d = jnp.asarray(np.stack([p[1] for p in packs]))
    fm_d = jnp.ones((B, T), jnp.float32)
    props = ProposalBatch(
        jnp.asarray(np.stack([p[2] for p in packs])),
        jnp.asarray(np.stack([p[3] for p in packs])),
        jnp.ones((B, N_PROPS), jnp.float32))
    tap_feats, _ = encode_step_batched(tap_params, feats_d, cfg)
    np.asarray(tap_feats)  # barrier

    for use_pallas in (True, False):
        for sort in (True, False):
            c = cfg.replace_in(
                "runtime", use_pallas=use_pallas, sort_decode_props=sort)

            def run():
                seq, _, _ = decode_step_batched(
                    cg_params, c, tap_feats, feats_d, lda_d, fm_d, props)
                return np.asarray(seq)

            run()  # compile
            for _ in range(2):
                run()
            best = min(_timed(run) for _ in range(3))
            print(f"T={T} batched pallas={int(use_pallas)} sort={int(sort)}: "
                  f"{best*1e3/B:6.2f} ms/video ({B/best:6.1f} videos/s)",
                  flush=True)


def bench_pervideo(cfg, tap_params, cg_params, T):
    from echr_tpu.engine.steps import decode_step
    from echr_tpu.models.captioner import ProposalBatch
    from echr_tpu.models.sst import sst_forward

    feats, lda, ind, soi = make_inputs_t(cfg, T, seed=0)
    feats_d = jnp.asarray(feats)
    lda_d = jnp.asarray(lda)
    fm_d = jnp.ones((T,), jnp.float32)
    props = ProposalBatch(
        jnp.asarray(ind), jnp.asarray(soi), jnp.ones((N_PROPS,), jnp.float32))
    encode = jax.jit(lambda p, f: sst_forward(p, f, train=False))
    tap_feats, _ = encode(tap_params, feats_d)
    np.asarray(tap_feats)

    for use_pallas in (True, False):
        for sort in (True, False):
            c = cfg.replace_in(
                "runtime", use_pallas=use_pallas, sort_decode_props=sort)

            def run():
                seq, _, _ = decode_step(
                    cg_params, c, tap_feats, feats_d, lda_d, fm_d, props)
                return np.asarray(seq)

            run()
            for _ in range(2):
                run()
            best = min(_timed(run) for _ in range(3))
            print(f"T={T} pervid  pallas={int(use_pallas)} sort={int(sort)}: "
                  f"{best*1e3:6.2f} ms/video", flush=True)


def main():
    ts = [int(a) for a in sys.argv[1:]] or [256, 512]
    cfg, tap_params, cg_params = build()
    for T in ts:
        c = cfg.replace_in("data", time_buckets=(T,))
        bench_batched(c, tap_params, cg_params, T)
        bench_pervideo(c, tap_params, cg_params, T)


if __name__ == "__main__":
    main()
