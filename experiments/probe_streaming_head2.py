"""Streaming decode head, second (and final) attempt — tile sweep.

VERDICT r4 next-8: the decode logit head's only quantified headroom is
~0.3-0.4 ms/step of reduction/materialization traffic over the 0.77 ms
matmul floor (probe_head_matmul_eff M8 1.37 vs M0 0.77).  The round-3 K1
streaming kernel (probe_greedy_head) TIED X0 at its best tiling
(TR=1024, TV=1024 -> 1.36 ms) — hypothesis: per-invocation Mosaic
overhead x (R/TR * VP/TV) grid steps ate the saved HBM traffic, plus the
weight matrix re-streams once per ROW tile (R/TR x 18 MB).

This probe parameterizes the tiling and sweeps the VMEM-feasible corner
(fewer, bigger tiles): (TR, TV) in {(1024,512), (1024,1024), (2048,512),
(512,512)} against X0 (dense + jnp reductions) and XM (pure einsum
floor), interleaved min-of-3 windows (relay drift, CLAUDE.md).  If the
best tiling still ties/loses X0, this records negative result #10 and
closes the decode-head chapter for good.

Usage: python experiments/probe_streaming_head2.py
"""
import functools
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


def _kernel(out_ref, w_ref, b_ref, it_ref, mx_ref, lse_ref,
            m_sc, l_sc, a_sc, *, tile_v):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
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
    ) + b_ref[:]
    tile_max = jnp.max(s, axis=1, keepdims=True)
    tile_arg = jnp.argmax(s, axis=1, keepdims=True) + j * tile_v
    m_prev = m_sc[:]
    m_new = jnp.maximum(m_prev, tile_max)
    l_sc[:] = l_sc[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True)
    a_sc[:] = jnp.where(tile_max > m_prev, tile_arg, a_sc[:])
    m_sc[:] = m_new

    @pl.when(j == gV - 1)
    def _finish():
        it_ref[:] = a_sc[:].astype(jnp.int32)
        mx_ref[:] = m_sc[:]
        lse_ref[:] = m_sc[:] + jnp.log(l_sc[:])


@functools.partial(jax.jit, static_argnames=("tr", "tv"))
def stream_head(out, w, b, tr, tv):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vp = w.shape[1]
    it, mx, lse = pl.pallas_call(
        functools.partial(_kernel, tile_v=tv),
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.int32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)),
        grid=(R // tr, vp // tv),
        in_specs=[
            pl.BlockSpec((tr, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr, 1), jnp.float32),
            pltpu.VMEM((tr, 1), jnp.float32),
            pltpu.VMEM((tr, 1), jnp.int32),
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

    def padded(tv):
        vp = ((V1 + tv - 1) // tv) * tv
        wp = jnp.zeros((C, vp), jnp.bfloat16).at[:, :V1].set(jnp.asarray(w))
        bp = jnp.full((1, vp), -1e30, jnp.float32).at[:, :V1].set(
            jnp.asarray(b))
        return wp, bp

    w_d, b_d = jnp.asarray(w), jnp.asarray(b)
    out0 = jnp.asarray(r.randn(B, N, C).astype(np.float32) * 0.3)

    # correctness for every tiling (argmax must be bit-equal: the greedy
    # fidelity gate)
    o1 = out0.reshape(R, C)
    logits = jnp.dot(o1.astype(jnp.bfloat16), w_d,
                     preferred_element_type=jnp.float32) + b_d
    it_ref = np.asarray(jnp.argmax(logits, axis=1))
    lse_ref = np.asarray(jax.scipy.special.logsumexp(logits, axis=1))
    tilings = []
    for tr, tv in [(512, 512), (1024, 512), (1024, 1024), (2048, 512)]:
        wp, bp = padded(tv)
        try:
            it_k, mx_k, lse_k = stream_head(o1, wp, bp, tr, tv)
        except Exception as e:  # VMEM-infeasible corner (e.g. 2048x1536 bf16
            # input block + scratch crosses the 16 MB scoped-vmem limit)
            print(f"tiling ({tr:4d},{tv:4d}): SKIP ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]})", flush=True)
            continue
        ok = bool(np.all(it_ref == np.asarray(it_k)))
        dl = float(np.max(np.abs(lse_ref - np.asarray(lse_k))))
        print(f"tiling ({tr:4d},{tv:4d}): argmax equal {ok}, "
              f"lse max|diff| {dl:.2e}", flush=True)
        assert ok
        tilings.append((tr, tv))

    def scan_head(tr, tv, wp, bp):
        @jax.jit
        def f(out0, wp, bp):
            def step(o, _):
                it, mx, lse = stream_head(o.reshape(R, C), wp, bp, tr, tv)
                it, mx, lse = (x.reshape(B, N) for x in (it, mx, lse))
                upd = (mx - lse)[..., None] * 0.01 + it[..., None] * 1e-9
                return o * 0.9 + upd, ()
            o, _ = jax.lax.scan(step, out0, None, length=STEPS)
            return jnp.sum(o)
        return f

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
    def xm(out0, w, b):
        def step(o, _):
            logits = jnp.einsum("bnc,cv->bnv", o.astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32) + b
            upd = logits[..., :1] * 0.01
            return o * 0.9 + upd, ()
        o, _ = jax.lax.scan(step, out0, None, length=STEPS)
        return jnp.sum(o)

    cases = [("X0 dense+reduce", x0, (out0, w_d, b_d)),
             ("XM pure einsum ", xm, (out0, w_d, b_d))]
    for tr, tv in tilings:
        wp, bp = padded(tv)
        cases.append((f"K ({tr:4d},{tv:4d}) ", scan_head(tr, tv, wp, bp),
                      (out0, wp, bp)))

    best = {tag: float("inf") for tag, _, _ in cases}
    for _w in range(3):  # interleaved windows, per-config min
        for tag, fn, args in cases:
            best[tag] = min(best[tag], _time(fn, *args))
    for tag, _, _ in cases:
        print(f"{tag}: {best[tag]:6.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
