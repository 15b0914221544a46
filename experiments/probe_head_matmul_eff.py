"""Probe: why does the decode logit-head matmul run at ~62 TFLOP/s?

probe_greedy_head/probe_int8_head pinned the decode head's pure-einsum
floor at ~1.19-1.24 ms/step for [B*N, C] @ [C, V+1] at B=32, N=128,
C=1536, V1=6001 — ~63 TFLOP/s vs the chip's ~197 TFLOP/s bf16 peak, i.e.
the head (41% of the decode step) runs the MXU at ~1/3 efficiency.  This
probe separates the candidate causes, each measured as ms per matmul of
identical FLOPs:

  M0  one 31x-rows matmul, single dispatch     [no-scan MXU ceiling]
  M1  31-step scan of einsum bnc,cv->bnv       [current floor, baseline]
  M2  scan of flat 2D dot ([B*N, C] @ [C, V1]) [einsum batch-dim cost?]
  M3  M2 with V1 padded 6001 -> 6144           [lane-alignment cost?]
  M4  M2 with bf16 output (cast f32 outside)   [f32 98MB/step write cost?]
  M5  M2 with scan unroll=31                   [scan dispatch latency?]

FIRST RUN (real TPU): M0-M5 all land at 0.74-0.78 ms/step, ~97-101
TFLOP/s — the matmul itself is fine.  The old probes' 1.19-1.24 ms "pure
einsum floor" (probe_greedy_head XM / probe_int8_head XM) differ from M1
by exactly one op: the `+ b` BIAS ADD over the [4096, 6001] f32 logits,
which XLA materializes as a separate full-size tensor (~3x 98 MB of HBM
traffic ~= 0.45 ms/step) instead of fusing.  So the second battery
isolates the bias and the real head's reduction consumers:

  M6  M2 + bias add, slice consumer            [old XM reproduction]
  M7  K-folded bias ([R, C+1] @ [C+1, V1])     [bias as a weight row]
  M8  M2 + bias + argmax/max/lse               [real head, current form]
  M9  M7 + argmax/max/lse                      [real head, folded bias]
  MA  M8 but bias added inside the reductions  [force fuse-into-consumer]

If M7 ~= M2 and M9 << M8, fold the logit bias into the matmul in the
decode path (models/decoder.py step_logits).
Usage: python experiments/probe_head_matmul_eff.py
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
R = B * N
FLOPS = 2.0 * R * C * V1 * STEPS


def _time(fn, *args):
    float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])  # warm
    dts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[0])
        dts.append(time.time() - t0)
    return min(dts)


def main():
    r = np.random.RandomState(0)
    wb = jnp.asarray(r.randn(C, V1).astype(np.float32) * 0.05,
                     dtype=jnp.bfloat16)
    wpad = jnp.pad(wb, ((0, 0), (0, 6144 - V1)))
    out0 = jnp.asarray(r.randn(B, N, C).astype(np.float32) * 0.3)
    big = jnp.asarray(r.randn(STEPS * R, C).astype(np.float32) * 0.3,
                      dtype=jnp.bfloat16)

    @jax.jit
    def m0(big, wb):
        # all 31 steps' rows in ONE matmul: the no-scan MXU ceiling
        logits = jnp.dot(big, wb, preferred_element_type=jnp.float32)
        return jnp.sum(logits[:, :1])

    def scan_of(step):
        @jax.jit
        def f(out0, w):
            def body(o, _):
                return step(o, w), ()
            o, _ = jax.lax.scan(body, out0, None, length=STEPS)
            return jnp.sum(o)
        return f

    def einsum_step(o, w):
        logits = jnp.einsum("bnc,cv->bnv", o.astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32)
        return o * 0.9 + logits[..., :1] * 0.01

    def flat_step(o, w):
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
        return o * 0.9 + logits.reshape(B, N, -1)[..., :1] * 0.01

    def bf16_step(o, w):
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.bfloat16)
        return o * 0.9 + logits.reshape(B, N, -1)[..., :1].astype(
            jnp.float32) * 0.01

    @jax.jit
    def m5(out0, w):
        def body(o, _):
            return flat_step(o, w), ()
        o, _ = jax.lax.scan(body, out0, None, length=STEPS, unroll=STEPS)
        return jnp.sum(o)

    bias = jnp.asarray(r.randn(V1).astype(np.float32) * 0.1)
    # K-folded form: bias as one extra bf16 weight row, activations get a
    # ones column (C 1536 -> 1537; MXU pads K anyway, +~8% FLOPs)
    waug = jnp.concatenate([wb, bias[None, :].astype(jnp.bfloat16)], axis=0)

    def bias_step(o, w_and_b):
        w, b = w_and_b
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32) + b
        return o * 0.9 + logits.reshape(B, N, -1)[..., :1] * 0.01

    def folded_step(o, waug):
        x = o.reshape(R, C).astype(jnp.bfloat16)
        x1 = jnp.concatenate([x, jnp.ones((R, 1), jnp.bfloat16)], axis=1)
        logits = jnp.dot(x1, waug, preferred_element_type=jnp.float32)
        return o * 0.9 + logits.reshape(B, N, -1)[..., :1] * 0.01

    def _reduce_upd(o, logits):
        lse = jax.scipy.special.logsumexp(logits, axis=1)
        mx = jnp.max(logits, axis=1)
        it = jnp.argmax(logits, axis=1)
        upd = ((mx - lse) * 0.01 + it * 1e-9).reshape(B, N, 1)
        return o * 0.9 + upd

    def bias_reduce_step(o, w_and_b):
        w, b = w_and_b
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32) + b
        return _reduce_upd(o, logits)

    def folded_reduce_step(o, waug):
        x = o.reshape(R, C).astype(jnp.bfloat16)
        x1 = jnp.concatenate([x, jnp.ones((R, 1), jnp.bfloat16)], axis=1)
        logits = jnp.dot(x1, waug, preferred_element_type=jnp.float32)
        return _reduce_upd(o, logits)

    def consumer_bias_step(o, w_and_b):
        w, b = w_and_b
        raw = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)
        # bias folded into each reduction's input expression (no named
        # intermediate): does XLA fuse the add into the reduce pass?
        lse = jax.scipy.special.logsumexp(raw + b, axis=1)
        mx = jnp.max(raw + b, axis=1)
        it = jnp.argmax(raw + b, axis=1)
        upd = ((mx - lse) * 0.01 + it * 1e-9).reshape(B, N, 1)
        return o * 0.9 + upd

    # SECOND RUN: M6 1.56 / M7 1.61 (misaligned K=1537 halves the matmul
    # rate; folding is a LOSS) / M8 1.37 == MA 1.37 (bias fuses into the
    # reduction inputs for free) / M9 1.40.  So the real head's cost over
    # the 0.77 ms matmul floor is the REDUCTION PASSES (~0.6 ms), not the
    # bias.  Third battery decomposes the reductions:
    #   MB  no-bias + argmax/max/lse      [reduction-cost baseline]
    #   MC  no-bias + argmax only         [greedy-token-only floor]
    #   MD  bias + reductions over bf16-stored logits  [halve reduce reads]
    #   ME  bias + argmax + max, lse from max via exp-sum  [one less pass?]

    def nobias_reduce_step(o, w):
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
        return _reduce_upd(o, logits)

    def argmax_only_step(o, w):
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
        it = jnp.argmax(logits, axis=1)
        return o * 0.9 + (it * 1e-9).reshape(B, N, 1)

    def bf16_reduce_step(o, w_and_b):
        w, b = w_and_b
        logits = (jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
                  + b).astype(jnp.bfloat16)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=1)
        mx = jnp.max(logits, axis=1).astype(jnp.float32)
        it = jnp.argmax(logits, axis=1)
        upd = ((mx - lse) * 0.01 + it * 1e-9).reshape(B, N, 1)
        return o * 0.9 + upd

    def manual_lse_step(o, w_and_b):
        w, b = w_and_b
        logits = jnp.dot(o.reshape(R, C).astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32) + b
        it = jnp.argmax(logits, axis=1)
        mx = jnp.max(logits, axis=1)
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, None]), axis=1))
        upd = ((mx - lse) * 0.01 + it * 1e-9).reshape(B, N, 1)
        return o * 0.9 + upd

    cases = (
        ("M2 scan flat dot ", scan_of(flat_step), (out0, wb)),
        ("M8 bias+reduction", scan_of(bias_reduce_step), (out0, (wb, bias))),
        ("MB nobias+reduce ", scan_of(nobias_reduce_step), (out0, wb)),
        ("MC argmax only   ", scan_of(argmax_only_step), (out0, wb)),
        ("MD bf16 reduce   ", scan_of(bf16_reduce_step), (out0, (wb, bias))),
        ("ME manual lse    ", scan_of(manual_lse_step), (out0, (wb, bias))),
    )
    # interleaved windows with per-config MIN (relay drift, CLAUDE.md)
    best = {tag: float("inf") for tag, _, _ in cases}
    for _ in range(3):
        for tag, fn, args in cases:
            best[tag] = min(best[tag], _time(fn, *args))
    for tag, _, _ in cases:
        dt = best[tag]
        print(f"{tag}: {dt / STEPS * 1000:6.2f} ms/step  "
              f"{FLOPS / dt / 1e12:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
