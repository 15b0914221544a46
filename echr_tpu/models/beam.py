"""Beam-search decoding — net-new vs the reference.

The reference plumbs a --beam_size flag but never implements beam search
(reference: OldModel_NEW.py:144-146 is a no-op assert; sample_beam is
commented out).  This is a fully jitted `lax.scan` beam search over all N
proposals of a video at once: beams live on a flattened [N*B] batch axis so
every decode step is one batched core step (MXU-sized matmuls), and beam
bookkeeping is pure gather/top_k — no host control flow.

Scoring: sum of token logprobs with optional length normalisation
score/((5+len)/6)^alpha (the GNMT length penalty); alpha=0 reproduces raw
sum-logprob ranking.  END token is id 0, matching the reference's
decode_sequence convention (misc/utils.py:24-38).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from echr_tpu.config import Config
from echr_tpu.models.contexts import Contexts
from echr_tpu.models.decoder import (
    DecoderState,
    init_state,
    precompute_attention,
    sort_ctxs_by_window,
    sort_gate,
    step_logprobs,
)

Array = jax.Array

_NEG_INF = -1e30


class BeamResult(NamedTuple):
    seq: Array  # [N, L] best sequence per proposal (0-terminated)
    logprob: Array  # [N] accumulated logprob of the best beam
    all_seqs: Array  # [N, B, L] all final beams, best first
    all_logprobs: Array  # [N, B]


def _expand_ctxs(ctxs: Contexts, beam: int) -> Contexts:
    """Tile per-proposal context rows over the beam axis: [N, ...] -> [N*B, ...].
    Video/clip features are shared across proposals and stay un-tiled."""

    def tile(x):
        if x is None:
            return None
        return jnp.repeat(x, beam, axis=0)

    return Contexts(
        video=ctxs.video,
        event=tile(ctxs.event),
        clip_feats=ctxs.clip_feats,
        clip_mask=tile(ctxs.clip_mask),
        prop_mask=tile(ctxs.prop_mask),
    )


def _beam_step(params, cfg: Config, bctx: Contexts, pre_att, carry, t):
    """One beam-search step over a flattened [N*B] beam axis — shared by
    beam_search's scan/while forms and beam_search_batched's vmapped body.
    carry = (state, logprobs [N*B, V1], scores [N, B], finished [N, B],
    tokens [N, B, L]); t may be a traced loop counter."""
    state, logprobs, scores, finished, tokens = carry
    N, B = finished.shape
    V1 = cfg.decoder.CG_vocab_size + 1
    lp = logprobs.reshape(N, B, V1)

    # finished beams may only "emit" END with 0 added score
    end_only = jnp.full((V1,), _NEG_INF).at[0].set(0.0)
    lp = jnp.where(finished[..., None], end_only[None, None, :], lp)

    cand = scores[..., None] + lp  # [N, B, V1]
    flat = cand.reshape(N, B * V1)
    top_scores, top_idx = jax.lax.top_k(flat, B)  # [N, B]
    src_beam = top_idx // V1  # [N, B]
    tok = (top_idx % V1).astype(jnp.int32)

    # reorder running sequences and append the chosen token
    tokens = jnp.take_along_axis(tokens, src_beam[..., None], axis=1)
    was_finished = jnp.take_along_axis(finished, src_beam, axis=1)
    emit = jnp.where(was_finished, 0, tok)
    tokens = tokens.at[:, :, t].set(emit)
    finished = was_finished | (tok == 0)

    # reorder decoder state: flat index n*B + src_beam
    flat_src = (jnp.arange(N)[:, None] * B + src_beam).reshape(-1)
    state = DecoderState(state.h[:, flat_src], state.c[:, flat_src])

    logprobs_next, state = step_logprobs(
        params, cfg, emit.reshape(-1), bctx, pre_att, state
    )
    return (state, logprobs_next, top_scores, finished, tokens)


def beam_search(
    params,
    cfg: Config,
    ctxs: Contexts,
    beam_size: int,
    length_alpha: float = 0.0,
    early_exit: Optional[bool] = None,
) -> BeamResult:
    """Decode every proposal with beam search in one jitted scan.

    Rows with prop_mask==0 (bucket padding) decode garbage from their
    degenerate [0,1) windows (and the early-exit path may freeze them
    mid-decode); their outputs are zeroed post-loop so both loop forms
    return identical tensors for every row — no unspecified region."""
    N = ctxs.prop_mask.shape[0]
    B = beam_size
    L = cfg.decoder.CG_seq_length
    V1 = cfg.decoder.CG_vocab_size + 1

    # window-sort for the tile-skipping score kernel (round 4; greedy
    # decode got this first): beam tiling already clusters the B copies of
    # each proposal, sorting clusters across proposals too.  Beam search
    # is deterministic and every op is per-proposal (reshape/top_k/gather
    # on the n axis), so sort + un-permute below is bit-exact.
    ctxs, cfg, inv_order = sort_ctxs_by_window(cfg, ctxs)

    bctx = _expand_ctxs(ctxs, B)
    pre_att = precompute_attention(params, cfg, bctx)

    state0 = init_state(params, cfg, bctx, N * B)
    # <bos> step
    it0 = jnp.zeros((N * B,), jnp.int32)
    logprobs, state = step_logprobs(params, cfg, it0, bctx, pre_att, state0)

    # beam scores: only beam 0 live initially so identical first-step beams
    # don't duplicate candidates
    scores0 = jnp.tile(jnp.where(jnp.arange(B) == 0, 0.0, _NEG_INF)[None, :], (N, 1))
    finished0 = jnp.zeros((N, B), bool)
    tokens0 = jnp.zeros((N, B, L), jnp.int32)

    def step(carry, t):
        return _beam_step(params, cfg, bctx, pre_att, carry, t)

    if early_exit is None:
        # vmapped/batched callers pass False: under vmap the loop runs to the
        # last unfinished beam across the whole batch, so scan is faster
        early_exit = bool(cfg.runtime.decode_early_exit)
    if early_exit:
        # once every beam of every proposal is finished the remaining steps
        # are provable no-ops (each finished beam's only candidate is END at
        # +0, top_k keeps the already-sorted scores, tokens stay 0) — a
        # while_loop skips them (the reference's break, OldModel_NEW.py:122)
        pad_prop = (ctxs.prop_mask <= 0)  # [N] bucket-padding proposals

        def cond(carry):
            t = carry[0]
            finished = carry[1][3]
            # padded proposals decode garbage from their degenerate [0,1)
            # window and may never emit END — exclude them from the
            # all-finished test (like the greedy exit's prop_mask guard)
            return (t < L) & jnp.logical_not(jnp.all(finished | pad_prop[:, None]))

        def wbody(carry):
            t, inner = carry
            return t + 1, step(inner, t)

        _, (state, _, scores, finished, tokens) = jax.lax.while_loop(
            cond, wbody,
            (jnp.asarray(0, jnp.int32), (state, logprobs, scores0, finished0, tokens0)),
        )
    else:
        (state, _, scores, finished, tokens), _ = jax.lax.scan(
            lambda c, t: (step(c, t), None),
            (state, logprobs, scores0, finished0, tokens0), jnp.arange(L)
        )

    # zero bucket-padding rows: the scan path decodes garbage for them and
    # the early-exit path freezes them mid-decode — normalising both to
    # (tokens=0, score=0) makes the two loop forms return identical tensors
    pad = ctxs.prop_mask <= 0  # [N]
    tokens = jnp.where(pad[:, None, None], 0, tokens)
    scores = jnp.where(pad[:, None], 0.0, scores)

    if length_alpha > 0.0:
        lengths = jnp.sum(tokens != 0, axis=2).astype(jnp.float32) + 1.0
        norm = jnp.power((5.0 + lengths) / 6.0, length_alpha)
        ranked = scores / norm
    else:
        ranked = scores
    order = jnp.argsort(-ranked, axis=1)
    all_seqs = jnp.take_along_axis(tokens, order[..., None], axis=1)
    all_scores = jnp.take_along_axis(scores, order, axis=1)
    if inv_order is not None:  # undo the window sort (bit-exact)
        all_seqs, all_scores = all_seqs[inv_order], all_scores[inv_order]
    return BeamResult(all_seqs[:, 0], all_scores[:, 0], all_seqs, all_scores)


def beam_search_batched(
    params,
    cfg: Config,
    ctxs_b: Contexts,  # leaves with leading [Bv] video axis
    beam_size: int,
    length_alpha: float = 0.0,
) -> BeamResult:
    """beam_search over a [Bv]-video Contexts batch with ONE batch-global
    early exit — the beam twin of decoder.decoder_sample_batched_greedy.

    beam_search's per-video while_loop is useless under vmap (the loop runs
    to the LAST unfinished beam of the whole batch), so batched callers
    historically forced the fixed-length scan.  Here the nesting is
    inverted: lax.while_loop OUTSIDE, jax.vmap(_beam_step) INSIDE, exiting
    when every live beam of every video is finished.  Outputs are identical
    to the vmapped scan form: once a video's beams are all finished its
    steps are provable no-ops (each finished beam's only candidate is END
    at +0 score, top_k keeps the already-sorted order, tokens stay 0), and
    bucket-padding rows are zeroed post-loop exactly like beam_search.
    Equality vs the scan form is pinned in test_decode_early_exit.py.

    Returns a BeamResult with a leading [Bv] axis on every field."""
    Bv, N = ctxs_b.prop_mask.shape
    B = beam_size
    L = cfg.decoder.CG_seq_length

    # per-video window sort; the gate (and the sort's static cfg
    # transformation — the decode T-ceiling raise) is derived once OUTSIDE
    # the vmap from the shared sort_gate helper (see
    # decoder_sample_batched_greedy)
    will_sort = sort_gate(cfg, ctxs_b)
    cfg_setup = cfg

    def setup(ctxs):
        c = cfg_setup
        inv = None
        if will_sort:
            ctxs, c, inv = sort_ctxs_by_window(c, ctxs)
        bctx = _expand_ctxs(ctxs, B)
        pre_att = precompute_attention(params, c, bctx)
        state0 = init_state(params, c, bctx, N * B)
        it0 = jnp.zeros((N * B,), jnp.int32)
        logprobs, state = step_logprobs(params, c, it0, bctx, pre_att, state0)
        return ctxs, bctx, pre_att, state, logprobs, inv

    ctxs_b, bctx_b, pre_b, state_b, logprobs_b, inv_b = jax.vmap(setup)(ctxs_b)
    if will_sort:
        cfg = cfg.replace_in(
            "runtime",
            pallas_decode_t_max=cfg.runtime.pallas_decode_t_max_sorted)

    scores0 = jnp.tile(
        jnp.where(jnp.arange(B) == 0, 0.0, _NEG_INF)[None, None, :],
        (Bv, N, 1))
    finished0 = jnp.zeros((Bv, N, B), bool)
    tokens0 = jnp.zeros((Bv, N, B, L), jnp.int32)
    pad_prop_b = ctxs_b.prop_mask <= 0  # [Bv, N] (post-sort order)

    def cond(carry):
        t, inner = carry
        finished = inner[3]
        return (t < L) & jnp.logical_not(
            jnp.all(finished | pad_prop_b[:, :, None]))

    def wbody(carry):
        t, inner = carry

        def one(bctx, pre, st, lp, sc, fin, tok):
            return _beam_step(params, cfg, bctx, pre,
                              (st, lp, sc, fin, tok), t)

        inner = jax.vmap(one)(bctx_b, pre_b, *inner)
        return t + 1, inner

    _, (_, _, scores, finished, tokens) = jax.lax.while_loop(
        cond, wbody,
        (jnp.asarray(0, jnp.int32),
         (state_b, logprobs_b, scores0, finished0, tokens0)))

    # normalise bucket-padding rows (see beam_search)
    tokens = jnp.where(pad_prop_b[:, :, None, None], 0, tokens)
    scores = jnp.where(pad_prop_b[:, :, None], 0.0, scores)

    if length_alpha > 0.0:
        lengths = jnp.sum(tokens != 0, axis=3).astype(jnp.float32) + 1.0
        norm = jnp.power((5.0 + lengths) / 6.0, length_alpha)
        ranked = scores / norm
    else:
        ranked = scores
    order = jnp.argsort(-ranked, axis=2)
    all_seqs = jnp.take_along_axis(tokens, order[..., None], axis=2)
    all_scores = jnp.take_along_axis(scores, order, axis=2)
    if inv_b is not None:  # undo the per-video window sort (bit-exact)
        all_seqs = jnp.take_along_axis(
            all_seqs, inv_b[:, :, None, None], axis=1)
        all_scores = jnp.take_along_axis(all_scores, inv_b[:, :, None], axis=1)
    return BeamResult(all_seqs[:, :, 0], all_scores[:, :, 0],
                      all_seqs, all_scores)
