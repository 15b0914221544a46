"""Beam search: beam-1 == greedy; larger beams never score worse; eval path."""
import jax
import jax.numpy as jnp
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.steps import init_train_state
from echr_tpu.models.beam import beam_search
from echr_tpu.models.captioner import ProposalBatch, make_contexts
from echr_tpu.models.decoder import decoder_sample
from echr_tpu.models.registry import init_captioner, init_tap
from echr_tpu.models.sst import sst_forward


def _setup(tmp_path):
    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(3)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    batch, meta = loader.get_batch("train")
    while meta.proposal_num <= 0 or meta.n_frames <= 1:
        batch, meta = loader.get_batch("train")
    tap_feats, _ = sst_forward(state.tap_params, jnp.asarray(batch.feats))
    props = ProposalBatch(jnp.asarray(batch.ind_select), jnp.asarray(batch.soi),
                          jnp.asarray(batch.prop_mask))
    ctxs = make_contexts(state.cg_params, cfg, tap_feats, jnp.asarray(batch.feats),
                         jnp.asarray(batch.lda), props,
                         frame_mask=jnp.asarray(batch.frame_mask))
    return cfg, state, ctxs, loader


def test_beam1_matches_greedy(tmp_path):
    cfg, state, ctxs, _ = _setup(tmp_path)
    g_seq, g_logps, active = decoder_sample(state.cg_params["decoder"], cfg, ctxs)
    b = beam_search(state.cg_params["decoder"], cfg, ctxs, beam_size=1)
    g = np.asarray(g_seq)
    bs = np.asarray(b.seq)
    # compare up to each greedy row's end (greedy zero-masks after the global
    # break; beam keeps decoding per-row)
    for i in range(g.shape[0]):
        row = g[i]
        L = int((row > 0).sum())
        np.testing.assert_array_equal(bs[i, :L], row[:L])


def test_wider_beam_no_worse(tmp_path):
    cfg, state, ctxs, _ = _setup(tmp_path)
    b1 = beam_search(state.cg_params["decoder"], cfg, ctxs, beam_size=1)
    b4 = beam_search(state.cg_params["decoder"], cfg, ctxs, beam_size=4)
    assert (np.asarray(b4.logprob) >= np.asarray(b1.logprob) - 1e-4).all()
    # beams are returned best-first
    al = np.asarray(b4.all_logprobs)
    assert (np.diff(al, axis=1) <= 1e-5).all()


def test_beam_eval_path(tmp_path):
    from echr_tpu.engine.evaluate import eval_split

    cfg, state, _, loader = _setup(tmp_path)
    preds, scores, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "pb.json"),
        {"num_vids_eval": 1, "val_all_metrics": False, "topN": 10, "beam_size": 3},
        flag_eval_what="cg",
    )
    assert len(preds) >= 1
    for vid, info in preds.items():
        for p in info:
            assert "sentence" in p


def test_beam_batched_matches_single(tmp_path):
    import jax.numpy as jnp

    from echr_tpu.engine.steps import beam_decode_step, beam_decode_step_batched
    from echr_tpu.models.sst import sst_forward

    cfg, state, ctxs, loader = _setup(tmp_path)
    batch, meta = loader.get_batch("train")
    while meta.proposal_num <= 0 or meta.n_frames <= 1:
        batch, meta = loader.get_batch("train")
    tap_feats, _ = sst_forward(state.tap_params, jnp.asarray(batch.feats))
    from echr_tpu.models.captioner import ProposalBatch

    props = ProposalBatch(jnp.asarray(batch.ind_select), jnp.asarray(batch.soi),
                          jnp.asarray(batch.prop_mask))
    seq1, lp1 = beam_decode_step(
        state.cg_params, cfg, tap_feats, jnp.asarray(batch.feats),
        jnp.asarray(batch.lda), jnp.asarray(batch.frame_mask), props, 3)
    stack = lambda x: jnp.stack([x, x])  # noqa: E731
    import jax

    props_b = jax.tree.map(stack, props)
    seqB, lpB = beam_decode_step_batched(
        state.cg_params, cfg, stack(tap_feats), stack(jnp.asarray(batch.feats)),
        stack(jnp.asarray(batch.lda)), stack(jnp.asarray(batch.frame_mask)),
        props_b, 3)
    np.testing.assert_array_equal(np.asarray(seqB[0]), np.asarray(seq1))
    np.testing.assert_array_equal(np.asarray(seqB[1]), np.asarray(seq1))
    np.testing.assert_allclose(np.asarray(lpB[0]), np.asarray(lp1), atol=1e-4)


def test_beam_batched_eval_path(tmp_path):
    """beam_size > 1 through the fast batched eval pipeline: the vmapped
    beam search decodes every group, records are beam-scored."""
    from echr_tpu.engine.evaluate import eval_split_batched

    cfg, state, _, loader = _setup(tmp_path)
    preds, scores, _ = eval_split_batched(
        state.tap_params, state.cg_params, loader, cfg,
        str(tmp_path / "pbb.json"),
        {"num_vids_eval": 2, "val_all_metrics": False, "topN": 10,
         "beam_size": 3, "get_eval_loss": False},
        flag_eval_what="cg", batch_videos=2,
    )
    assert len(preds) >= 1
    for vid, info in preds.items():
        for p in info:
            assert "sentence" in p
            assert np.isfinite(p["sentence_confidence"])


def test_sorted_beam_is_bit_exact(tmp_path):
    """runtime.sort_decode_props now covers beam search too (round 4):
    window-sorting ctxs rows + un-permuting the outputs must be invisible
    — beam search is deterministic and every op is per-proposal, so the
    sorted run reproduces the unsorted one exactly (mirrors
    test_sorted_decode_is_bit_exact for greedy)."""
    cfg, state, ctxs, _ = _setup(tmp_path)
    base = cfg.replace_in("runtime", use_pallas=True)
    b_off = beam_search(state.cg_params["decoder"],
                        base.replace_in("runtime", sort_decode_props=False),
                        ctxs, beam_size=4)
    b_on = beam_search(state.cg_params["decoder"], base, ctxs, beam_size=4)
    np.testing.assert_array_equal(np.asarray(b_off.all_seqs),
                                  np.asarray(b_on.all_seqs))
    np.testing.assert_allclose(np.asarray(b_off.all_logprobs),
                               np.asarray(b_on.all_logprobs), atol=0, rtol=0)
    np.testing.assert_array_equal(np.asarray(b_off.seq), np.asarray(b_on.seq))
