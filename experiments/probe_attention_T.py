"""Reproduce the Pallas-kernel T-crossover tables in docs/BENCH_NOTES.md
("Pallas score kernel T crossover + long-T windowing close-out").

Sweeps the decode-attention time bucket on the attached TPU and prints
ms/step for:
  * dense full-T attention vs the NO-GRAD Pallas score kernel (decode
    path; the kernel's measured crossover sets
    ops/pallas_attention._MAX_T_DECODE), and
  * the jnp remat path vs the DIFFERENTIABLE VJP kernel, fwd+bwd
    (training path; wins at every bucket, hence no ceiling).

Usage: python experiments/probe_attention_T.py [decode|train|both]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from echr_tpu.ops import pallas_attention as PA
from echr_tpu.ops.attention import (
    _additive_scores_remat,
    additive_attention_init,
    additive_attention_precompute,
    additive_attention_step,
)
from echr_tpu.ops.core import dense
from echr_tpu.ops.masked import masked_softmax

D, Hq, Hatt, STEPS = 500, 512, 512, 30
BUCKETS = (128, 256, 384, 512, 1024)


def _time(fn, *args):
    float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])  # compile
    dts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
        dts.append(time.time() - t0)
    return min(dts) / STEPS * 1000


def decode_sweep(N=4096):
    r = np.random.RandomState(0)
    p = additive_attention_init(jax.random.PRNGKey(0), D, Hq, Hatt)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    for T in BUCKETS:
        feats = jnp.asarray(r.randn(T, D).astype(np.float32) * 0.5)
        mask = jnp.ones((N, T), jnp.float32)
        h0 = jnp.asarray(r.randn(N, Hq).astype(np.float32) * 0.5)
        pre = additive_attention_precompute(p, feats)
        for tag, kw in (("dense", {}), ("pallas", {"use_pallas": True})):
            @jax.jit
            def probe(h0, p, feats, pre, mask):
                def step(h, _):
                    att, _w = additive_attention_step(p, h, feats, pre, mask, **kw)
                    return h * 0.9 + att[:, :1] * 0.01, ()

                h, _ = jax.lax.scan(step, h0, None, length=STEPS)
                return jnp.sum(h)

            # NOTE: at T > _MAX_T_DECODE the "pallas" row equals dense — the
            # gate under test routes it to the jnp path by design
            print(f"decode T={T} {tag}: "
                  f"{_time(probe, h0, p, feats, pre, mask):.2f} ms/step",
                  flush=True)


def train_sweep(N=2048):
    r = np.random.RandomState(0)
    p0 = additive_attention_init(jax.random.PRNGKey(0), D, Hq, Hatt)
    p0 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p0)
    for T in BUCKETS:
        feats = jnp.asarray(r.randn(T, D).astype(np.float32) * 0.5)
        mask = jnp.ones((N, T), jnp.float32)
        h0 = jnp.asarray(r.randn(N, Hq).astype(np.float32) * 0.5)
        for tag in ("remat", "vjp-kernel"):
            @jax.jit
            def lossgrad(p, h0, feats, mask):
                def loss(p):
                    pre = additive_attention_precompute(p, feats)

                    def step(h, _):
                        att_h = dense(p["h2att"], h, jnp.bfloat16)
                        if tag == "vjp-kernel":  # direct call: no decode gate
                            scores = PA.attention_scores_diff(
                                pre, att_h, p["alpha_net"])
                        else:
                            scores = _additive_scores_remat(
                                p["alpha_net"], pre, att_h, jnp.bfloat16)
                        w = masked_softmax(scores, mask, axis=-1)
                        att = jnp.dot(
                            w.astype(jnp.bfloat16), feats.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                        return h * 0.9 + att[:, :1] * 0.01, jnp.sum(att)

                    h, s = jax.lax.scan(step, h0, None, length=STEPS)
                    return jnp.sum(s)

                return jax.grad(loss)(p)

            print(f"train T={T} {tag}: "
                  f"{_time(lossgrad, p0, h0, feats, mask):.2f} ms/step fwd+bwd",
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("decode", "both"):
        decode_sweep()
    if which in ("train", "both"):
        train_sweep()
