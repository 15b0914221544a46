"""Probe: fused greedy-head kernel vs XLA dense + reductions.

Greedy decode consumes the [N, V+1] logits through exactly three row
reductions (models/decoder.py step_tokens: argmax, max, logsumexp) —
the full logits matrix is never needed.  XLA materializes it to HBM
(98 MB f32 at B=32, N=128, V=6001) and reads it back for the reductions:
~196 MB/step of pure HBM traffic.  A Pallas kernel that streams vocab
tiles through a running (max, argmax, sumexp) never leaves VMEM.

Measures ms/step over a 31-step scan at real batched decode dims:
  X0  dense(out, W) + jnp argmax/max/logsumexp   [current]
  K1  fused streaming head kernel                 [candidate]
and checks exact argmax equality + lse closeness.

Usage: python experiments/probe_greedy_head.py
"""
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

B, N, C, V1, STEPS = 32, 128, 1536, 6001, 31
TILE_V = 512
VP = ((V1 + TILE_V - 1) // TILE_V) * TILE_V  # padded vocab


TILE_R = 512  # row block: [TILE_R, C] bf16 stays resident across the
# inner vocab loop; weights stream [C, TILE_V] once per (row block, tile)


def _greedy_head_kernel(out_ref, w_ref, b_ref, it_ref, mx_ref, lse_ref,
                        m_sc, l_sc, a_sc):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)  # inner: vocab tiles
    gV = pl.num_programs(1)

    @pl.when(j == 0)
    def _reset():
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)
        a_sc[:] = jnp.zeros_like(a_sc)

    s = jax.lax.dot_general(
        out_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:]  # [Rt, Vt]
    tile_max = jnp.max(s, axis=1, keepdims=True)  # [Rt, 1]
    tile_arg = jnp.argmax(s, axis=1, keepdims=True) + j * TILE_V
    m_prev = m_sc[:]
    m_new = jnp.maximum(m_prev, tile_max)
    l_sc[:] = l_sc[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True)
    # strict > keeps the EARLIER index on ties, matching jnp.argmax
    a_sc[:] = jnp.where(tile_max > m_prev, tile_arg, a_sc[:])
    m_sc[:] = m_new

    @pl.when(j == gV - 1)
    def _finish():
        it_ref[:] = a_sc[:].astype(jnp.int32)
        mx_ref[:] = m_sc[:]
        lse_ref[:] = m_sc[:] + jnp.log(l_sc[:])


@jax.jit
def greedy_head(out, w, b):
    """out [R, C] (any rows multiple of TILE_R after caller padding),
    w [C, VP] bf16, b [1, VP].  Returns (argmax, max, lse) per row."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = out.shape[0]
    it, mx, lse = pl.pallas_call(
        _greedy_head_kernel,
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.int32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)),
        grid=(R // TILE_R, VP // TILE_V),
        in_specs=[
            pl.BlockSpec((TILE_R, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TILE_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.int32),
        ],
    )(out.astype(jnp.bfloat16), w, b)
    return it[:, 0], mx[:, 0], lse[:, 0]


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
    w = (r.randn(C, V1).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    b = r.randn(1, V1).astype(np.float32) * 0.1
    # pad vocab: zero weights + -1e30 bias so padded cols never win
    wp = jnp.zeros((C, VP), jnp.bfloat16).at[:, :V1].set(jnp.asarray(w))
    bp = jnp.full((1, VP), -1e30, jnp.float32).at[:, :V1].set(jnp.asarray(b))
    w, b = jnp.asarray(w), jnp.asarray(b)
    out0 = jnp.asarray(r.randn(B, N, C).astype(np.float32) * 0.3)

    # correctness first (one flattened batch)
    o1 = out0.reshape(B * N, C)
    logits = jnp.dot(o1.astype(jnp.bfloat16), w,
                     preferred_element_type=jnp.float32) + b
    it_ref = jnp.argmax(logits, axis=1)
    lse_ref = jax.scipy.special.logsumexp(logits, axis=1)
    it_k, mx_k, lse_k = greedy_head(o1, wp, bp)
    print("argmax equal:", bool(jnp.all(it_ref == it_k)),
          " max equal:", bool(jnp.all(jnp.max(logits, 1) == mx_k)),
          " lse max|diff|:", float(jnp.max(jnp.abs(lse_ref - lse_k))),
          flush=True)

    @jax.jit
    def x0(out0, w, b):
        def step(o, _):
            logits = jnp.einsum("bnc,cv->bnv", o.astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32) + b
            lse = jax.scipy.special.logsumexp(logits, axis=2)
            mx = jnp.max(logits, axis=2)
            it = jnp.argmax(logits, axis=2)
            upd = (mx - lse)[..., None] * 0.01 + it[..., None] * 1e-9
            return o * 0.9 + upd, ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    @jax.jit
    def k1(out0, wp, bp):
        def step(o, _):
            it, mx, lse = greedy_head(o.reshape(B * N, C), wp, bp)
            it, mx, lse = (x.reshape(B, N) for x in (it, mx, lse))
            upd = (mx - lse)[..., None] * 0.01 + it[..., None] * 1e-9
            return o * 0.9 + upd, ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    @jax.jit
    def xm(out0, w, b):
        # PURE einsum — if this ~= X0, the reductions fuse into the matmul
        # consumer and the head is MXU-bound, not HBM-bound
        def step(o, _):
            logits = jnp.einsum("bnc,cv->bnv", o.astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32) + b
            upd = logits[..., :1] * 0.01
            return o * 0.9 + upd, ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    for tag, fn, args in (("X0 dense+reduce", x0, (out0, w, b)),
                          ("XM pure einsum", xm, (out0, w, b)),
                          ("K1 fused head", k1, (out0, wp, bp))):
        ms = _time(fn, *args)
        print(f"{tag:>16}: {ms:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
