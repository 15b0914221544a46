"""Probe: does Mosaic overlap an independent MXU dot with VPU tanh work
inside one Pallas kernel?

Context (VERDICT r3 item 1): the decode step is ~59% attention tanh (VPU)
+ ~41% LSTM/logit matmuls (MXU), and XLA schedules them serially — the
in-step tanh rate is 56% of the standalone kernel rate.  If Mosaic
dual-issues MXU dots under VPU tanh blocks within a kernel, fusing the
LSTM cell dots into the attention score kernel would hide the MXU 41%
under the VPU 59% (up to ~1.7x decode).  If not, that fusion is dead on
arrival and we record the negative result.

Three measurements at the real batched-decode shapes (B=32, N=128,
T=256, H=512), 31-step scan, vmapped over B like the production path:

  S0  score kernel alone (tanh + alpha matvec)           [the VPU floor]
  S1  same kernel + an independent [8,512]x[512,512] dot
      per grid block, accumulated to a dummy output      [fused: overlap?]
  S2  score kernel + the SAME total dot work as a
      separate XLA op in the scan body                   [serial reference]

S1 ~= S0         -> MXU rides under the tanh: build the real fusion.
S1 ~= S2 > S0    -> no overlap inside the kernel either: negative result.

Usage: python experiments/probe_mxu_vpu_overlap.py
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

B, N, T, H, STEPS = 32, 128, 256, 512, 31
TILE_N, TILE_T = 8, 128
# The dot's output width: per-block dot [8, H] x [H, KD] at every grid
# position -> B * (N/8) * (T/128) * 8*H*KD*2 flops/step.  KD=2048 gives
# 34 GFLOP/step — ~25% of the real decode's 146 GFLOP MXU load (logit +
# 3 LSTM cells), enough to see whether it hides under the tanh.
KD = 2048


def _time(fn, *args):
    float(np.asarray(fn(*args)).ravel()[0])  # compile + relay barrier
    dts = []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(fn(*args)).ravel()[0])
        dts.append(time.time() - t0)
    return min(dts) / STEPS * 1000


def _score_kernel(pre_ref, q_ref, w_ref, out_ref):
    y = jnp.tanh(q_ref[:][:, None, :] + pre_ref[:][None, :, :])  # [Nt,Tt,H]
    out_ref[:] = jax.lax.dot_general(
        y, w_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]


def _score_plus_dot_kernel(pre_ref, q_ref, w_ref, wd_ref, out_ref, dot_ref):
    # the independent MXU dot FIRST: its issue is async on the MXU, the
    # tanh VPU block below should (if Mosaic dual-issues) run under it
    d = jax.lax.dot_general(
        q_ref[:].astype(jnp.bfloat16), wd_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [Nt, H] on MXU
    y = jnp.tanh(q_ref[:][:, None, :] + pre_ref[:][None, :, :])
    out_ref[:] = jax.lax.dot_general(
        y, w_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[..., 0]
    dot_ref[:] = d[None, :, :]


@functools.partial(jax.jit, static_argnames=("with_dot",))
def _scores(pre, q, w, wd, with_dot: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (N // TILE_N, T // TILE_T)
    in_specs = [
        pl.BlockSpec((TILE_T, H), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_N, H), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    if not with_dot:
        return pl.pallas_call(
            _score_kernel,
            out_shape=jax.ShapeDtypeStruct((N, T), jnp.float32),
            grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((TILE_N, TILE_T), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )(pre, q, w)
    s, d = pl.pallas_call(
        _score_plus_dot_kernel,
        out_shape=(jax.ShapeDtypeStruct((N, T), jnp.float32),
                   jax.ShapeDtypeStruct((T // TILE_T, N, KD), jnp.float32)),
        grid=grid,
        in_specs=in_specs + [
            pl.BlockSpec((H, KD), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, TILE_T), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, KD), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(pre, q, w, wd)
    return s, d


def main():
    r = np.random.RandomState(0)
    pre = jnp.asarray(r.randn(B, T, H).astype(np.float32) * 0.5)
    q0 = jnp.asarray(r.randn(B, N, H).astype(np.float32) * 0.5)
    w = jnp.asarray(r.randn(H, 1).astype(np.float32) * 0.05)
    wd = jnp.asarray(r.randn(H, KD).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    wd2 = jnp.asarray(r.randn(H, KD).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    @jax.jit
    def s0(q0, pre, w, wd):
        def step(q, _):
            s = jax.vmap(lambda qq, pp: _scores(pp, qq, w, wd))(q, pre)
            return q * 0.9 + s[..., :1] * 0.01, ()
        q, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return jnp.sum(q)

    @jax.jit
    def s1(q0, pre, w, wd):
        def step(q, _):
            s, d = jax.vmap(
                lambda qq, pp: _scores(pp, qq, w, wd, with_dot=True))(q, pre)
            return q * 0.9 + s[..., :1] * 0.01 + jnp.sum(d) * 1e-12, ()
        q, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return jnp.sum(q)

    @jax.jit
    def s2(q0, pre, w, wd, wd2):
        def step(q, _):
            s = jax.vmap(lambda qq, pp: _scores(pp, qq, w, wd))(q, pre)
            # same TOTAL dot flops as S1 (T//TILE_T dots of [N,H]x[H,H]
            # per video), as a separate XLA op; distinct weights so XLA
            # can't CSE the two matmuls into one
            d = jnp.einsum("bnh,hk->bnk", q.astype(jnp.bfloat16), wd,
                           preferred_element_type=jnp.float32)
            d = d + jnp.einsum("bnh,hk->bnk", q.astype(jnp.bfloat16), wd2,
                               preferred_element_type=jnp.float32)
            return q * 0.9 + s[..., :1] * 0.01 + jnp.sum(d) * 1e-12, ()
        q, _ = jax.lax.scan(step, q0, None, length=STEPS)
        return jnp.sum(q)

    for tag, fn, args in (
            ("S0 kernel alone", s0, (q0, pre, w, wd)),
            ("S1 dot fused in-kernel", s1, (q0, pre, w, wd)),
            ("S2 dot as XLA op", s2, (q0, pre, w, wd, wd2))):
        ms = _time(fn, *args)
        gtanh = B * N * T * H / (ms / 1e3) / 1e9
        print(f"{tag:>24}: {ms:6.2f} ms/step  ({gtanh:6.1f} Gtanh/s nominal)",
              flush=True)


if __name__ == "__main__":
    main()
