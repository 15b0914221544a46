"""Probe: mask-aware tile-skipping Pallas score kernel vs the dense forms.

ECHR decode attention runs over per-proposal WINDOW masks (reference: the
padded clip windows of CaptionGenerator.py:142-160).  Windows are short
events inside a long video, so with proposals sorted by window start most
[TILE_N, TILE_T] score tiles are fully masked — the tile-skip kernel
(ops/pallas_attention.attention_scores_masked) skips their tanh blocks.

Measures ms/decode-step at the real batched decode dims (vmap over B) for:
  dense jnp | pallas (current) | pallas-skip sorted | pallas-skip unsorted
across window-length regimes and T buckets.

Usage: python experiments/probe_tile_skip.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from echr_tpu.ops import pallas_attention as PA
from echr_tpu.ops.attention import (
    additive_attention_init,
    additive_attention_precompute,
    additive_attention_step,
)
from echr_tpu.ops.core import dense
from echr_tpu.ops.masked import masked_softmax

B, N, D, Hq, Hatt, STEPS = 32, 128, 500, 512, 512, 31


def _time(fn, *args):
    float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])  # compile
    dts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
        dts.append(time.time() - t0)
    return min(dts) / STEPS * 1000


def window_masks(T, max_len, sort, seed=0):
    r = np.random.RandomState(seed)
    m = np.zeros((B, N, T), np.float32)
    skip = []
    for b in range(B):
        starts = r.randint(0, T - 8, size=N)
        lens = r.randint(4, max_len, size=N)
        if sort:
            order = np.argsort(starts, kind="stable")
            starts, lens = starts[order], lens[order]
        for n in range(N):
            m[b, n, starts[n]:min(starts[n] + lens[n], T)] = 1.0
        g = m[b].reshape(N // 8, 8, T // 128, 128).max((1, 3))
        skip.append(1.0 - g.mean())
    return jnp.asarray(m), float(np.mean(skip))


def main():
    p = additive_attention_init(jax.random.PRNGKey(0), D, Hq, Hatt)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    r = np.random.RandomState(1)
    for T in (256, 512, 1024):
        feats = jnp.asarray(r.randn(B, T, D).astype(np.float32) * 0.5)
        h0 = jnp.asarray(r.randn(B, N, Hq).astype(np.float32) * 0.5)
        pre = jax.vmap(lambda f: additive_attention_precompute(p, f, jnp.bfloat16))(feats)
        for max_len in (48, 128):
            for tag, sort, mode in (
                ("dense-jnp", True, "jnp"),
                ("pallas", True, "pallas"),
                ("skip-sorted", True, "skip"),
                ("skip-unsorted", False, "skip"),
            ):
                mask, skip_frac = window_masks(T, max_len, sort)

                @jax.jit
                def probe(h0, p, feats, pre, mask):
                    def step(h, _):
                        def one(hh, f, pa, m):
                            if mode == "skip":
                                att_h = dense(p["h2att"], hh, jnp.bfloat16)
                                scores = PA.attention_scores_masked(
                                    pa, att_h, p["alpha_net"], m)
                                w = masked_softmax(scores, m, axis=-1)
                                return jnp.dot(
                                    w.astype(jnp.bfloat16),
                                    f.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                            att, _w = additive_attention_step(
                                p, hh, f, pa, m, use_pallas=(mode == "pallas"))
                            return att
                        att = jax.vmap(one)(h, feats, pre, mask)
                        return h * 0.9 + att[..., :1] * 0.01, ()

                    h, _ = jax.lax.scan(step, h0, None, length=STEPS)
                    return jnp.sum(h)

                ms = _time(probe, h0, p, feats, pre, mask)
                print(f"T={T} max_len={max_len} {tag:>14}: {ms:6.2f} ms/step"
                      f"  (skippable tiles {skip_frac*100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
