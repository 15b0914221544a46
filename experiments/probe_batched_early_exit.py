"""Measure decoder_sample_batched_greedy (batch-global while_loop early
exit) vs the vmapped fixed-length scan in decode_step_batched on the real
chip.  Two regimes bound the effect:

  - untrained params: argmax over near-uniform logits ~never emits EOS, so
    the loop runs all L steps — this is the PURE OVERHEAD of a while_loop
    (dynamic trip count, dynamic_update_index writes) vs the scan, and is
    what bench.py's untrained headline run would pay;
  - EOS-biased head (logit bias b[0] += bias): every caption ends at t=1,
    the loop exits after ~2 steps of L=30 — the MAXIMUM win a trained
    model (captions typically 8-15 tokens) could approach.

Interleaved windows + per-config MIN like probe_decode_sort2 (relay drift
swamps <10% effects).  Usage:

  python experiments/probe_batched_early_exit.py [T] [eos_bias] [beam_size]

beam_size > 1 routes through beam_decode_step_batched instead (the
batch-global while_loop form is models.beam.beam_search_batched).
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import BATCH_VIDEOS, N_PROPS, build
from experiments.probe_decode_sort import make_inputs_t


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    eos_bias = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    beam = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cfg, tap_params, cg_params = build()
    cfg = cfg.replace_in("data", time_buckets=(T,))

    from echr_tpu.engine.steps import (
        beam_decode_step_batched,
        decode_step_batched,
        encode_step_batched,
    )
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
    np.asarray(tap_feats)

    cg_eos = jax.tree.map(lambda x: x, cg_params)
    b = np.asarray(cg_eos["decoder"]["logit"]["b"]).copy()
    b[0] += eos_bias
    cg_eos["decoder"]["logit"]["b"] = jnp.asarray(b)

    grid = [("scan", None), ("exit", None), ("scan", "eos"), ("exit", "eos")]
    runs = {}
    for form, regime in grid:
        c = cfg.replace_in(
            "runtime", decode_early_exit_batched=(form == "exit"))
        cp = cg_eos if regime == "eos" else cg_params

        if beam > 1:
            def run(c=c, cp=cp):
                seq, _ = beam_decode_step_batched(
                    cp, c, tap_feats, feats_d, lda_d, fm_d, props,
                    beam_size=beam, length_alpha=0.7)
                return np.asarray(seq)
        else:
            def run(c=c, cp=cp):
                seq, _, _ = decode_step_batched(
                    cp, c, tap_feats, feats_d, lda_d, fm_d, props)
                return np.asarray(seq)

        run()  # compile
        runs[(form, regime)] = run

    best = {k: float("inf") for k in grid}
    WINDOWS, ITERS = 8, 6
    for _ in range(WINDOWS):
        for k in grid:
            fn = runs[k]
            fn()  # warm
            t0 = time.time()
            for _ in range(ITERS):
                fn()
            best[k] = min(best[k], (time.time() - t0) / ITERS)
    for k in grid:
        regime = "untrained(no-exit)" if k[1] is None else f"eos-bias({eos_bias})"
        print(f"T={T} B={BATCH_VIDEOS} beam={beam} {k[0]:4s} {regime}: "
              f"{best[k]*1e3/BATCH_VIDEOS:6.2f} ms/video "
              f"[min of {WINDOWS} interleaved windows]", flush=True)


if __name__ == "__main__":
    main()
