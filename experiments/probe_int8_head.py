"""Probe: int8 dynamically-quantized decode logit head vs bf16 dense.

The greedy decode head — [B*N, C] @ [C, V+1] at B=32, N=128, C=1536,
V=6001 — is MXU-bound at ~62 TFLOP/s bf16 (experiments/probe_greedy_head.py:
the pure-einsum floor ties the full head, reductions fuse for free).  TPU
v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), so a
dynamically-quantized head (per-row activation scales, per-column weight
scales, s8 x s8 -> s32 dot) has a ~2x ceiling on 41% of the decode step.

Measures ms/step over a 31-step scan at real batched decode dims:
  X0  bf16 einsum + argmax/max/logsumexp     [current decode head]
  XM  pure bf16 einsum                        [bf16 matmul floor]
  Q1  int8 dynamic-quant einsum + reductions  [candidate]
  QM  pure int8 einsum (incl. quantize cost)  [int8 matmul floor]
and reports top-1 agreement + logit error Q1 vs X0 (random weights).
NOT wired into the decode path — measured SLOWER than bf16 (ninth
negative result, docs/BENCH_NOTES.md); if a future XLA lowers s8 dots
to the int8 MXU path, re-measure here and only then build the real
quality gate (token agreement on a TRAINED checkpoint).

Usage: python experiments/probe_int8_head.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from echr_tpu.utils.cache import enable_persistent_compile_cache

enable_persistent_compile_cache()

B, N, C, V1, STEPS = 32, 128, 1536, 6001, 31


def quantize_weights(w):
    """Per-output-column symmetric int8: wq [C, V] s8, scale [1, V] f32."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # [1, V]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def int8_head(o, wq, wscale, b):
    """Dynamic per-row activation quant + s8xs8->s32 dot + dequant.
    o [R, C] f32/bf16 -> logits [R, V] f32."""
    o = o.astype(jnp.float32)
    amax = jnp.max(jnp.abs(o), axis=1, keepdims=True)  # [R, 1]
    ascale = jnp.maximum(amax, 1e-8) / 127.0
    oq = jnp.clip(jnp.round(o / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        oq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [R, V] s32
    return acc.astype(jnp.float32) * (ascale * wscale) + b


def _time(fn, *args):
    float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
    dts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
        dts.append(time.time() - t0)
    return min(dts) / STEPS * 1000


def main():
    r = np.random.RandomState(0)
    w = jnp.asarray(r.randn(C, V1).astype(np.float32) * 0.05)
    b = jnp.asarray(r.randn(1, V1).astype(np.float32) * 0.1)
    wb = w.astype(jnp.bfloat16)
    wq, wscale = quantize_weights(w)
    out0 = jnp.asarray(r.randn(B, N, C).astype(np.float32) * 0.3)

    # correctness probe (one flattened batch)
    o1 = out0.reshape(B * N, C)
    logits = jnp.dot(o1.astype(jnp.bfloat16), wb,
                     preferred_element_type=jnp.float32) + b
    lq = int8_head(o1, wq, wscale, b)
    agree = float(jnp.mean((jnp.argmax(logits, 1) == jnp.argmax(lq, 1))
                           .astype(jnp.float32)))
    err = float(jnp.max(jnp.abs(logits - lq)))
    rng = float(jnp.max(logits) - jnp.min(logits))
    print(f"top-1 agreement vs bf16: {agree:.4f}  max|dlogit|: {err:.4f} "
          f"(logit range {rng:.2f})", flush=True)

    def reduce_step(o, logits):
        lse = jax.scipy.special.logsumexp(logits, axis=2)
        mx = jnp.max(logits, axis=2)
        it = jnp.argmax(logits, axis=2)
        upd = (mx - lse)[..., None] * 0.01 + it[..., None] * 1e-9
        return o * 0.9 + upd

    @jax.jit
    def x0(out0, wb, b):
        def step(o, _):
            logits = jnp.einsum("bnc,cv->bnv", o.astype(jnp.bfloat16), wb,
                                preferred_element_type=jnp.float32) + b
            return reduce_step(o, logits), ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    @jax.jit
    def xm(out0, wb, b):
        def step(o, _):
            logits = jnp.einsum("bnc,cv->bnv", o.astype(jnp.bfloat16), wb,
                                preferred_element_type=jnp.float32) + b
            return o * 0.9 + logits[..., :1] * 0.01, ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    @jax.jit
    def q1(out0, wq, wscale, b):
        def step(o, _):
            logits = int8_head(o.reshape(B * N, C), wq, wscale, b)
            return reduce_step(o, logits.reshape(B, N, V1)), ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    @jax.jit
    def qm(out0, wq, wscale, b):
        def step(o, _):
            logits = int8_head(o.reshape(B * N, C), wq, wscale, b)
            return o * 0.9 + logits.reshape(B, N, V1)[..., :1] * 0.01, ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    for tag, fn, args in (("X0 bf16+reduce", x0, (out0, wb, b)),
                          ("XM bf16 einsum", xm, (out0, wb, b)),
                          ("Q1 int8+reduce", q1, (out0, wq, wscale, b)),
                          ("QM int8 einsum", qm, (out0, wq, wscale, b))):
        ms = _time(fn, *args)
        print(f"{tag:>16}: {ms:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
