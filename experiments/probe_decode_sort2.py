"""Interleaved version of probe_decode_sort: the relay's bandwidth swings
(2-3x run to run, CLAUDE.md) swamp the ~3-10% effects under test, so this
probe round-robins the compiled configs across many short windows and
takes the per-config MIN — drift hits all configs equally.

Usage: python experiments/probe_decode_sort2.py [T] [batched|pervid]
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
    mode = sys.argv[2] if len(sys.argv) > 2 else "batched"
    cfg, tap_params, cg_params = build()
    cfg = cfg.replace_in("data", time_buckets=(T,))

    from echr_tpu.engine.steps import (
        decode_step, decode_step_batched, encode_step_batched)
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

    grid = [(1, 1), (1, 0), (0, 1), (0, 0)]
    runs = {}
    for up, so in grid:
        c = cfg.replace_in(
            "runtime", use_pallas=bool(up), sort_decode_props=bool(so))

        if mode == "batched":
            def run(c=c):
                seq, _, _ = decode_step_batched(
                    cg_params, c, tap_feats, feats_d, lda_d, fm_d, props)
                return np.asarray(seq)
        else:
            pv = ProposalBatch(
                props.ind_select[0], props.soi[0], props.prop_mask[0])

            def run(c=c, pv=pv):
                seq, _, _ = decode_step(
                    cg_params, c, tap_feats[0], feats_d[0], lda_d[0],
                    fm_d[0], pv)
                return np.asarray(seq)

        run()  # compile
        runs[(up, so)] = run

    per = B if mode == "batched" else 1
    best = {k: float("inf") for k in grid}
    WINDOWS, ITERS = 8, 6
    for w in range(WINDOWS):
        for k in grid:
            fn = runs[k]
            fn()  # warm
            t0 = time.time()
            for _ in range(ITERS):
                fn()
            best[k] = min(best[k], (time.time() - t0) / ITERS)
    for k in grid:
        print(f"T={T} {mode} pallas={k[0]} sort={k[1]}: "
              f"{best[k]*1e3/per:6.2f} ms/video "
              f"[min of {WINDOWS} interleaved windows]", flush=True)


if __name__ == "__main__":
    main()
