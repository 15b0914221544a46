"""Streaming greedy decode head: fused logits + argmax/max/logsumexp.

The greedy decode step ends with a [R, C] x [C, V+1] logit matmul whose
output exists only to feed three row reductions (argmax for the token,
max and logsumexp for the per-step logprob — reference:
models/OldModel_NEW.py:133-137,173-181 via misc's log_softmax).  The XLA
form materializes the [R, V+1] f32 logits in HBM and reads them back per
reduction — ~0.57 ms/step of traffic at serving dims (R=4096, V=6000;
probe_head_matmul_eff M8 1.37 vs the 0.77 ms matmul floor M0).

This kernel streams vocab tiles through VMEM instead: per (row-tile,
vocab-tile) grid step it computes the logit tile on the MXU and folds it
into online (argmax, running-max, running-sumexp) scratch accumulators —
the logits never reach HBM.  The round-4 attempt (TR=1024, TV=1024 was
not swept; probe_greedy_head) TIED the XLA form; the round-5 tile sweep
(experiments/probe_streaming_head2.py, interleaved min-of-9 on TPU v5e)
found the win at bigger vocab tiles:

    X0 dense + jnp reductions   1.63 ms/step   [the current XLA form]
    XM pure einsum (floor)      1.36 ms/step
    K  (1024, 1024)             1.41 ms/step   (-13.5% vs X0, ~ties floor)

Exactness: the matmul is the same bf16 x bf16 -> f32 MXU contraction as
ops.core.dense (argmax BIT-EQUAL on the probe's 4096x6001 sweep; the
greedy token-parity gate), and the streamed logsumexp matches the
two-pass jnp form to ~7e-6 (well inside the 5e-4 teacher-forced gate).
Tie-breaking matches jnp.argmax (first index): within a tile argmax is
first-match, across tiles a later tile only takes over on a STRICT
improvement.

Used by models/decoder.py on greedy, non-forced, bf16-compute decode
paths (runtime.use_pallas_head); everything else keeps the jnp head.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# VMEM budget for one grid step's resident blocks (bytes).  The scoped
# limit is 16 MB; leave headroom for Mosaic's own scratch (a 2048x512
# plan measured 16.87 MB and was rejected by the compiler).
_VMEM_BUDGET = 12 * 1024 * 1024
_LANE = 128  # vocab padding quantum (TPU lane width)
_SUBLANE = 8  # row padding quantum
_SUB_V = 512  # inner dot width: bounds the f32 logits stack tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def head_plan(R: int, C: int, V1: int) -> Optional[Tuple[int, int, int, int]]:
    """Pick (TR, TV, Rpad, Vpad) for the streaming head, or None when no
    VMEM-feasible tiling exists (caller falls back to the jnp head).

    Measured preference (probe_streaming_head2): the biggest vocab tile
    wins — fewer grid steps amortize per-invocation overhead and the
    weight block re-streams once per ROW tile, so big TR helps too.  The
    kernel's inner dot is sub-tiled (_SUB_V) so the f32 logits stack stays
    small; the VMEM model charges input blocks TWICE (Mosaic
    double-buffers them across grid steps — a full (1024, 1024) logits
    tile measured 16.98 MB against the 16 MB scoped limit inside the real
    decode program, where the standalone probe's single-dot form fit)."""
    if R <= 0 or C <= 0 or V1 <= 0:
        return None
    Rpad = _round_up(R, _SUBLANE)
    for tv in (1024, 512, 256, _LANE):
        Vpad = _round_up(V1, tv)
        for tr in (1024, 512, 256, 128, 64, 32, 16, _SUBLANE):
            if Rpad % tr:
                continue
            sub = min(tv, _SUB_V)
            vmem = (
                2 * tr * C * 2      # activation block, bf16, double-buffered
                + 2 * C * tv * 2    # weight block, bf16, double-buffered
                + 2 * tv * 4        # bias block, f32, double-buffered
                + 2 * tr * sub * 4  # sub-tile logits on the stack, f32
                + 3 * tr * 4        # scratch accumulators
                + 3 * tr * 4        # outputs
            )
            if vmem <= _VMEM_BUDGET:
                return tr, tv, Rpad, Vpad
    return None


def _head_kernel(out_ref, w_ref, b_ref, it_ref, mx_ref, lse_ref,
                 m_sc, l_sc, a_sc, *, tile_v: int):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    gV = pl.num_programs(1)

    @pl.when(j == 0)
    def _reset():
        m_sc[:] = jnp.full_like(m_sc, -1e30)
        l_sc[:] = jnp.zeros_like(l_sc)
        a_sc[:] = jnp.zeros_like(a_sc)

    # inner sub-tiling over the vocab block: each sub-dot's f32 logits tile
    # lives on the stack only [TR, sub] at a time (the full [TR, TV] tile
    # blew the scoped-vmem limit next to Mosaic's double-buffered input
    # blocks).  Left-to-right merge order + strict > keeps jnp.argmax's
    # first-match tie rule across sub-tiles AND across grid tiles.
    sub = min(tile_v, _SUB_V)
    for k in range(tile_v // sub):
        s = jax.lax.dot_general(
            out_ref[:], w_ref[:, k * sub:(k + 1) * sub],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[:, k * sub:(k + 1) * sub]
        tile_max = jnp.max(s, axis=1, keepdims=True)
        tile_arg = (jnp.argmax(s, axis=1, keepdims=True)
                    + j * tile_v + k * sub)
        m_prev = m_sc[:]
        m_new = jnp.maximum(m_prev, tile_max)
        l_sc[:] = l_sc[:] * jnp.exp(m_prev - m_new) + jnp.sum(
            jnp.exp(s - m_new), axis=1, keepdims=True)
        # strict >: on a tie the EARLIER index stands (jnp first-match)
        a_sc[:] = jnp.where(tile_max > m_prev, tile_arg,
                            a_sc[:]).astype(jnp.int32)
        m_sc[:] = m_new

    @pl.when(j == gV - 1)
    def _finish():
        it_ref[:] = a_sc[:]
        mx_ref[:] = m_sc[:]
        lse_ref[:] = m_sc[:] + jnp.log(l_sc[:])


@functools.partial(jax.jit, static_argnames=("tr", "tv", "interpret"))
def _stream_head_padded(out: Array, w: Array, b: Array, tr: int, tv: int,
                        interpret: bool = False):
    """Pre-padded inputs: out [Rpad, C] (any float), w [C, Vpad] bf16,
    b [1, Vpad] f32 (padding lanes at -1e30)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Rp, C = out.shape
    Vp = w.shape[1]
    it, mx, lse = pl.pallas_call(
        functools.partial(_head_kernel, tile_v=tv),
        out_shape=(jax.ShapeDtypeStruct((Rp, 1), jnp.int32),
                   jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, 1), jnp.float32)),
        grid=(Rp // tr, Vp // tv),
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
        interpret=interpret,
    )(out.astype(jnp.bfloat16), w, b)
    return it[:, 0], mx[:, 0], lse[:, 0]


def pad_head_weights(w: Array, b: Array, tv: int):
    """[C, V1] weights / [V1] bias -> lane-padded (w [C, Vpad] bf16,
    b [1, Vpad] f32).  Padding lanes carry -1e30 bias so they can never
    win the argmax and vanish from the streamed sumexp.  Call ONCE per
    decode program, outside the token loop (the pad is loop-invariant)."""
    C, V1 = w.shape
    Vpad = _round_up(V1, tv)
    wp = jnp.zeros((C, Vpad), jnp.bfloat16).at[:, :V1].set(
        w.astype(jnp.bfloat16))
    bp = jnp.full((1, Vpad), -1e30, jnp.float32).at[0, :V1].set(
        b.astype(jnp.float32))
    return wp, bp


def greedy_head(out: Array, wp: Array, bp: Array, tr: int, tv: int,
                interpret: Optional[bool] = None):
    """Fused greedy head on [R, C] core outputs with pre-padded weights.

    Returns (token [R] int32, max-logit [R] f32, logsumexp [R] f32) —
    exactly argmax / max / logsumexp of ops.core.dense(logit, out).
    Rows are padded to the plan's Rpad internally (padded rows sliced
    off before return)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, C = out.shape
    Rpad = _round_up(R, tr)
    if Rpad != R:
        out = jnp.zeros((Rpad, C), out.dtype).at[:R].set(out)
    it, mx, lse = _stream_head_padded(out, wp, bp, tr, tv,
                                      interpret=interpret)
    return it[:R], mx[:R], lse[:R]
