"""Measure the SCST step with batch-global early-exit rollouts vs the
fixed-length scan form (runtime.decode_early_exit_batched routing in
engine/steps.rl_rollout_step_batched).

The rollout's two 30-step decode scans are ~40% of the 65 ms SCST step
(docs/BENCH_NOTES.md "SCST device-path decomposition"); on a
stage-1-3-trained model captions end at 8-15 of L=30 tokens, so the
batch-global while_loop skips the tail steps for real.  Two regimes:

  - untrained params: near-uniform logits, EOS ~never drawn — the loop
    runs all L steps (pure while_loop overhead vs scan);
  - EOS-biased head (b[0] += bias, default 12 so the categorical is
    all-but-certain): captions end at t=1 — the MAXIMUM win bound.

Interleaved windows + per-config MIN (relay drift).  Usage:

  python experiments/probe_rl_early_exit.py [B] [eos_bias]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    eos_bias = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    cfg, tap_params, cg_params = build()

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
    rng = jax.random.PRNGKey(5)

    cg_eos = jax.tree.map(lambda x: x, cg_params)
    b = np.asarray(cg_eos["decoder"]["logit"]["b"]).copy()
    b[0] += eos_bias
    cg_eos["decoder"]["logit"]["b"] = jnp.asarray(b)

    grid = [("scan", None), ("exit", None), ("scan", "eos"), ("exit", "eos")]
    rollouts, steps_ = {}, {}
    for form, regime in grid:
        c = cfg.replace_in(
            "runtime", decode_early_exit_batched=(form == "exit"))
        cp = cg_eos if regime == "eos" else cg_params

        def rollout(c=c, cp=cp):
            tap_l, gen, greedy = rl_rollout_step_batched(
                tap_params, cp, batch, c, "tap_cg", rng)
            return np.asarray(gen)

        st0 = init_train_state(c, jax.tree.map(jnp.array, tap_params),
                               jax.tree.map(jnp.array, cp))

        def step(st, c=c):
            tap_l, gen, greedy = rl_rollout_step_batched(
                st.tap_params, st.cg_params, batch, c, "tap_cg", rng)
            reward = jnp.full(gen.shape, 0.1, jnp.float32)
            st, m = rl_update_step_batched(
                st, batch, c, "tap_cg", rng, gen, reward)
            return st, m

        g = rollout()  # compile
        mean_len = float((g > 0).sum(-1).mean())
        st0, m = step(st0)
        _ = float(np.asarray(m["loss"]))
        rollouts[(form, regime)] = rollout
        steps_[(form, regime)] = (step, st0, mean_len)

    best_r = {k: float("inf") for k in grid}
    best_s = {k: float("inf") for k in grid}
    WINDOWS, ITERS = 6, 5
    for _ in range(WINDOWS):
        for k in grid:
            fn = rollouts[k]
            fn()  # warm
            t0 = time.time()
            for _ in range(ITERS):
                fn()
            best_r[k] = min(best_r[k], (time.time() - t0) / ITERS)
        for k in grid:
            step, st, _ = steps_[k]
            st, m = step(st)  # warm
            t0 = time.time()
            for _ in range(ITERS):
                st, m = step(st)
            _ = float(np.asarray(m["loss"]))
            best_s[k] = min(best_s[k], (time.time() - t0) / ITERS)
            steps_[k] = (step, st, steps_[k][2])
    for k in grid:
        regime = "untrained(no-exit)" if k[1] is None else f"eos-bias({eos_bias})"
        mean_len = steps_[k][2]
        print(f"B={B} {k[0]:4s} {regime}: rollout {best_r[k]*1e3:6.2f} ms, "
              f"full step {best_s[k]*1e3:6.2f} ms -> "
              f"{B/best_s[k]:6.1f} videos/s (sampled len {mean_len:.1f} of "
              f"L={cfg.decoder.CG_seq_length}) "
              f"[min of {WINDOWS} interleaved windows]", flush=True)


if __name__ == "__main__":
    main()
