"""Early-exit greedy decode (lax.while_loop) == fixed-length scan decode.

The reference breaks its sample loop when every sequence has emitted the
end token (OldModel_NEW.py:173-181); our scan emulated that by masking,
and runtime.decode_early_exit turns it into actually-saved device steps.
These tests pin that both loop forms produce identical (seq, logps, active)
in every regime: no sequence finishing, all finishing immediately, and
under vmap (the batched serving pipeline's shape).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echr_tpu.config import flagship_config
from echr_tpu.models.captioner import ProposalBatch, captioner_sample
from echr_tpu.models.registry import init_captioner, init_tap
from echr_tpu.models.sst import sst_forward


@pytest.fixture(scope="module")
def setup():
    cfg = flagship_config().replace_in(
        "data", synthetic=True, lda_dim=100, time_buckets=(64,))
    cfg = cfg.replace_in("decoder", CG_vocab_size=50, CG_seq_length=12)
    cfg = cfg.replace_in("runtime", compute_dtype="float32", use_pallas=False)
    cfg = cfg.validate()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tap_params, cg_params = init_tap(k1, cfg), init_captioner(k2, cfg)
    T, N = 64, 8
    r = np.random.RandomState(0)
    feats = jnp.asarray(r.randn(T, cfg.tap.video_dim).astype(np.float32))
    lda = jnp.asarray(r.randn(cfg.data.lda_dim).astype(np.float32))
    fm = jnp.ones((T,), jnp.float32)
    starts = r.randint(0, T - 8, size=N)
    lens = r.randint(2, 10, size=N)
    soi = jnp.asarray(np.stack([starts, np.minimum(starts + lens, T)], 1).astype(np.int32))
    props = ProposalBatch(soi[:, 1] - 1, soi, jnp.ones((N,), jnp.float32))
    tap_feats, _ = sst_forward(tap_params, feats, train=False)
    return cfg, cg_params, tap_feats, feats, lda, fm, props


def _run(cfg, cg, tap_feats, feats, lda, fm, props, greedy=True, rng=None):
    s, l, a = captioner_sample(cg, cfg, tap_feats, feats, lda, props,
                               frame_mask=fm, greedy=greedy, rng=rng)
    return np.asarray(s), np.asarray(l), np.asarray(a)


@pytest.mark.parametrize("greedy", [True, False])
def test_while_equals_scan(setup, greedy):
    cfg, cg, *rest = setup
    rng = None if greedy else jax.random.PRNGKey(7)
    s1, l1, a1 = _run(cfg, cg, *rest, greedy=greedy, rng=rng)
    s2, l2, a2 = _run(cfg.replace_in("runtime", decode_early_exit=False),
                      cg, *rest, greedy=greedy, rng=rng)
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    assert np.array_equal(a1, a2)


def test_while_equals_scan_when_exiting_early(setup):
    """Bias the logit head toward the end token so the loop actually exits."""
    cfg, cg, *rest = setup
    cg2 = jax.tree.map(lambda x: x, cg)
    b = np.zeros(cfg.decoder.CG_vocab_size + 1, np.float32)
    b[0] = 5.0  # strong <eos> pull: greedy ends every sequence at step 1
    cg2["decoder"]["logit"]["b"] = jnp.asarray(b)
    s1, l1, a1 = _run(cfg, cg2, *rest)
    s2, l2, a2 = _run(cfg.replace_in("runtime", decode_early_exit=False),
                      cg2, *rest)
    assert a1.sum() < cfg.decoder.CG_seq_length  # exit actually triggered
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    assert np.array_equal(a1, a2)


@pytest.mark.parametrize("eos_bias", [0.0, 5.0])
def test_beam_while_equals_scan(setup, eos_bias):
    """Beam search early exit: once all beams finish, remaining steps are
    no-ops (finished beams re-emit END at +0 score) — while_loop == scan."""
    from echr_tpu.models.beam import beam_search
    from echr_tpu.models.captioner import make_contexts

    cfg, cg, tap_feats, feats, lda, fm, props = setup
    cg2 = jax.tree.map(lambda x: x, cg)
    b = np.zeros(cfg.decoder.CG_vocab_size + 1, np.float32)
    b[0] = eos_bias
    cg2["decoder"]["logit"]["b"] = jnp.asarray(b)
    ctxs = make_contexts(cg2, cfg, tap_feats, feats, lda, props,
                         frame_mask=fm, train=False)
    r1 = beam_search(cg2["decoder"], cfg, ctxs, 3)
    r2 = beam_search(cg2["decoder"],
                     cfg.replace_in("runtime", decode_early_exit=False), ctxs, 3)
    assert np.array_equal(np.asarray(r1.seq), np.asarray(r2.seq))
    np.testing.assert_allclose(np.asarray(r1.logprob), np.asarray(r2.logprob), atol=1e-6)
    assert np.array_equal(np.asarray(r1.all_seqs), np.asarray(r2.all_seqs))


def test_beam_early_exit_with_padded_proposals(setup):
    """Bucket-padding proposals (prop_mask==0) must not block the beam
    early exit (their degenerate windows may never emit END); padded rows
    are zeroed post-loop so BOTH loop forms return identical FULL-N
    tensors — no unspecified region for future all_seqs consumers."""
    from echr_tpu.models.beam import beam_search
    from echr_tpu.models.captioner import make_contexts

    cfg, cg, tap_feats, feats, lda, fm, props = setup
    cg2 = jax.tree.map(lambda x: x, cg)
    b = np.zeros(cfg.decoder.CG_vocab_size + 1, np.float32)
    b[0] = 5.0
    cg2["decoder"]["logit"]["b"] = jnp.asarray(b)
    pm = np.asarray(props.prop_mask).copy()
    pm[-3:] = 0.0  # last rows are padding
    props_pad = props._replace(prop_mask=jnp.asarray(pm))
    ctxs = make_contexts(cg2, cfg, tap_feats, feats, lda, props_pad,
                         frame_mask=fm, train=False)
    r1 = beam_search(cg2["decoder"], cfg, ctxs, 3)
    r2 = beam_search(cg2["decoder"],
                     cfg.replace_in("runtime", decode_early_exit=False), ctxs, 3)
    assert np.array_equal(np.asarray(r1.seq), np.asarray(r2.seq))
    np.testing.assert_allclose(np.asarray(r1.logprob),
                               np.asarray(r2.logprob), atol=1e-6)
    assert np.array_equal(np.asarray(r1.all_seqs), np.asarray(r2.all_seqs))
    np.testing.assert_allclose(np.asarray(r1.all_logprobs),
                               np.asarray(r2.all_logprobs), atol=1e-6)
    # padded rows normalised to (tokens=0, score=0) on both paths
    assert not np.asarray(r1.all_seqs)[-3:].any()
    assert not np.asarray(r1.all_logprobs)[-3:].any()


def test_while_under_vmap(setup):
    """decode_step_batched vmaps decoder_sample; while_loop must batch."""
    cfg, cg, tap_feats, feats, lda, fm, props = setup
    B = 3
    f = jax.vmap(lambda th, f_, l_, fm_, pr: captioner_sample(
        cg, cfg, th, f_, l_, pr, frame_mask=fm_, greedy=True))
    s, _, _ = f(jnp.stack([tap_feats] * B), jnp.stack([feats] * B),
                jnp.stack([lda] * B), jnp.stack([fm] * B),
                ProposalBatch(jnp.stack([props.ind_select] * B),
                              jnp.stack([props.soi] * B),
                              jnp.stack([props.prop_mask] * B)))
    s_single, _, _ = _run(cfg, cg, tap_feats, feats, lda, fm, props)
    for i in range(B):
        assert np.array_equal(np.asarray(s[i]), s_single)


def test_sorted_decode_is_bit_exact(setup):
    """runtime.sort_decode_props (the tile-skip kernel's window clustering)
    must be invisible: every decoder op is row-independent in N, so sorting
    ctxs rows + unsorting outputs reproduces the unsorted decode exactly.
    use_pallas=True routes through attention_scores_masked (interpret mode
    on CPU) when the bucket supports it, jnp otherwise — exact either way."""
    cfg, cg, *rest = setup
    base = cfg.replace_in("runtime", use_pallas=True)
    s1, l1, a1 = _run(base.replace_in("runtime", sort_decode_props=False),
                      cg, *rest)
    s2, l2, a2 = _run(base, cg, *rest)
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=0, rtol=0)
    assert np.array_equal(a1, a2)


def test_sorted_decode_batched_bit_exact(setup):
    """Same under vmap (the batched serving pipeline)."""
    cfg, cg, tap_feats, feats, lda, fm, props = setup
    from echr_tpu.engine.steps import decode_step_batched

    B = 2
    tile = lambda x: jnp.asarray(np.stack([np.asarray(x)] * B))
    args = (tile(tap_feats), tile(feats), tile(lda), tile(fm),
            ProposalBatch(tile(props.ind_select), tile(props.soi),
                          tile(props.prop_mask)))
    base = cfg.replace_in("runtime", use_pallas=True)
    s1, l1, a1 = decode_step_batched(
        cg, base.replace_in("runtime", sort_decode_props=False), *args)
    s2, l2, a2 = decode_step_batched(cg, base, *args)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=0, rtol=0)


# ---------------------------------------------------------------------------
# batch-global early exit (decoder_sample_batched_greedy): while_loop OUTSIDE
# jax.vmap(step) — one loop serves the whole batch and exits when every video
# is finished, vs the historical vmapped fixed-length scan.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def batch_setup(setup):
    """B=3 heterogeneous videos (different feats, lda, proposal layouts)."""
    cfg, cg, *_ = setup
    from echr_tpu.models.sst import sst_forward

    T, N, B = 64, 8, 3
    tap_params = init_tap(jax.random.PRNGKey(3), cfg)
    rows = []
    for b in range(B):
        r = np.random.RandomState(100 + b)
        feats = jnp.asarray(r.randn(T, cfg.tap.video_dim).astype(np.float32))
        lda = jnp.asarray(r.randn(cfg.data.lda_dim).astype(np.float32))
        fm = jnp.ones((T,), jnp.float32)
        starts = r.randint(0, T - 8, size=N)
        lens = r.randint(2, 10, size=N)
        soi = jnp.asarray(np.stack([starts, np.minimum(starts + lens, T)], 1)
                          .astype(np.int32))
        pm = np.ones((N,), np.float32)
        if b == 1:
            pm[-2:] = 0.0  # one video with padded proposal rows
        props = ProposalBatch(soi[:, 1] - 1, soi, jnp.asarray(pm))
        tap_feats, _ = sst_forward(tap_params, feats, train=False)
        rows.append((tap_feats, feats, lda, fm, props))
    stack = lambda i: jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[row[i] for row in rows])
    return cfg, cg, tuple(stack(i) for i in range(5))


def _run_batched(cfg, cg, args):
    from echr_tpu.engine.steps import decode_step_batched

    s, l, a = decode_step_batched(cg, cfg, *args)
    return np.asarray(s), np.asarray(l), np.asarray(a)


def test_batched_early_exit_equals_scan(batch_setup):
    cfg, cg, args = batch_setup
    s1, l1, a1 = _run_batched(cfg, cg, args)
    s2, l2, a2 = _run_batched(
        cfg.replace_in("runtime", decode_early_exit_batched=False), cg, args)
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    assert np.array_equal(a1, a2)


def test_batched_early_exit_fires(batch_setup):
    """Strong <eos> bias: the batch-global loop actually exits early while
    outputs stay identical to the scan form (incl. per-video active rows)."""
    cfg, cg, args = batch_setup
    cg2 = jax.tree.map(lambda x: x, cg)
    b = np.zeros(cfg.decoder.CG_vocab_size + 1, np.float32)
    b[0] = 5.0
    cg2["decoder"]["logit"]["b"] = jnp.asarray(b)
    s1, l1, a1 = _run_batched(cfg, cg2, args)
    s2, l2, a2 = _run_batched(
        cfg.replace_in("runtime", decode_early_exit_batched=False), cg2, args)
    assert (a1.sum(axis=1) < cfg.decoder.CG_seq_length).all()
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=1e-6)
    assert np.array_equal(a1, a2)


def test_batched_early_exit_sorted_bit_exact(batch_setup):
    """Direct decoder_sample_batched_greedy with the window sort enabled
    (sort_gate true: use_pallas + clip windows) must bit-match the unsorted
    run — covers the batched inv-order unsort of [B, N, L] outputs."""
    from echr_tpu.models.captioner import make_contexts
    from echr_tpu.models.decoder import decoder_sample_batched_greedy

    cfg, cg, args = batch_setup
    tap_feats, feats, lda, fm, props = args

    def outputs(c):
        def mk(th, f, l, fm_, pr):
            return make_contexts(cg, c, th, f, l, pr, frame_mask=fm_,
                                 train=False)
        ctxs_b = jax.vmap(mk)(tap_feats, feats, lda, fm, props)
        s, l, a = decoder_sample_batched_greedy(cg["decoder"], c, ctxs_b)
        return np.asarray(s), np.asarray(l), np.asarray(a)

    base = cfg.replace_in("runtime", use_pallas=True)
    s1, l1, a1 = outputs(base.replace_in("runtime", sort_decode_props=False))
    s2, l2, a2 = outputs(base)
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=0, rtol=0)
    assert np.array_equal(a1, a2)


# ---------------------------------------------------------------------------
# batch-global early exit for BEAM search (beam_search_batched)
# ---------------------------------------------------------------------------


def _run_beam_batched(cfg, cg, args, beam=3, alpha=0.7):
    from echr_tpu.engine.steps import beam_decode_step_batched

    s, lp = beam_decode_step_batched(cg, cfg, *args, beam_size=beam,
                                     length_alpha=alpha)
    return np.asarray(s), np.asarray(lp)


@pytest.mark.parametrize("eos_bias", [0.0, 5.0])
def test_beam_batched_early_exit_equals_scan(batch_setup, eos_bias):
    """beam_decode_step_batched: the batch-global while_loop form must match
    the vmapped fixed-length scan exactly, both when no beam finishes early
    (untrained) and when every beam finishes at t=1 (EOS-biased head)."""
    cfg, cg, args = batch_setup
    cg2 = cg
    if eos_bias:
        cg2 = jax.tree.map(lambda x: x, cg)
        b = np.asarray(cg2["decoder"]["logit"]["b"]).copy()
        b[0] += eos_bias
        cg2["decoder"]["logit"]["b"] = jnp.asarray(b)
    s1, l1 = _run_beam_batched(cfg, cg2, args)
    s2, l2 = _run_beam_batched(
        cfg.replace_in("runtime", decode_early_exit_batched=False), cg2, args)
    assert np.array_equal(s1, s2)
    np.testing.assert_allclose(l1, l2, atol=1e-6)


@pytest.mark.parametrize("eos_bias,temperature", [(0.0, 1.0), (12.0, 0.7)])
def test_batched_early_exit_sampled_equals_scan(batch_setup, eos_bias,
                                                temperature):
    """Multinomial batched decode (sample_max=0 eval / SCST rollouts): the
    batch-global while_loop must reproduce the vmapped scan's token draws
    bit-for-bit — per-step keys are derived by step INDEX (fold_in(rng,
    10_000+t)), so executing fewer steps changes no executed step's key.
    eos_bias=12 makes the categorical all-but-certain to emit END at t=1,
    so the early exit actually fires."""
    import jax

    cfg, cg, args = batch_setup
    cg2 = cg
    if eos_bias:
        cg2 = jax.tree.map(lambda x: x, cg)
        b = np.asarray(cg2["decoder"]["logit"]["b"]).copy()
        b[0] += eos_bias
        cg2["decoder"]["logit"]["b"] = jnp.asarray(b)
    from echr_tpu.engine.steps import decode_step_batched

    rng = jax.random.PRNGKey(21)
    s1, l1, a1 = decode_step_batched(cg2, cfg, *args, greedy=False,
                                     temperature=temperature, rng=rng)
    s2, l2, a2 = decode_step_batched(
        cg2, cfg.replace_in("runtime", decode_early_exit_batched=False),
        *args, greedy=False, temperature=temperature, rng=rng)
    if eos_bias:
        assert (np.asarray(a1).sum(axis=1) < cfg.decoder.CG_seq_length).all()
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))


def test_rl_rollout_batched_early_exit_equals_scan(tmp_path):
    """SCST rollout (sampled train-mode decode + greedy eval baseline):
    the batch-global early-exit route must return the exact trajectories
    the scan form samples — the update replays gen_seq, so any token drift
    here would silently change the policy gradient."""
    import jax

    from test_rl_vjp import _setup

    from echr_tpu.engine.steps import rl_rollout_step_batched

    cfg, stacked, fresh_state = _setup(tmp_path)
    st = fresh_state()
    step_rng = jax.random.PRNGKey(42)
    on = cfg.replace_in("runtime", decode_early_exit_batched=True)
    off = cfg.replace_in("runtime", decode_early_exit_batched=False)
    tap_a, gen_a, greedy_a = rl_rollout_step_batched(
        st.tap_params, st.cg_params, stacked, on, "tap_cg", step_rng)
    tap_b, gen_b, greedy_b = rl_rollout_step_batched(
        st.tap_params, st.cg_params, stacked, off, "tap_cg", step_rng)
    np.testing.assert_array_equal(np.asarray(gen_a), np.asarray(gen_b))
    np.testing.assert_array_equal(np.asarray(greedy_a), np.asarray(greedy_b))
    np.testing.assert_allclose(np.asarray(tap_a), np.asarray(tap_b),
                               atol=1e-6)


def test_beam_batched_early_exit_sorted_bit_exact(batch_setup):
    """beam_search_batched with the window sort enabled must bit-match the
    unsorted run — covers the batched [Bv, N, B, L] inv-order unsort."""
    from echr_tpu.models.beam import beam_search_batched
    from echr_tpu.models.captioner import make_contexts

    cfg, cg, args = batch_setup
    tap_feats, feats, lda, fm, props = args

    def outputs(c):
        def mk(th, f, l, fm_, pr):
            return make_contexts(cg, c, th, f, l, pr, frame_mask=fm_,
                                 train=False)
        ctxs_b = jax.vmap(mk)(tap_feats, feats, lda, fm, props)
        r = beam_search_batched(cg["decoder"], c, ctxs_b, 3, 0.7)
        return (np.asarray(r.seq), np.asarray(r.logprob),
                np.asarray(r.all_seqs), np.asarray(r.all_logprobs))

    base = cfg.replace_in("runtime", use_pallas=True)
    o1 = outputs(base.replace_in("runtime", sort_decode_props=False))
    o2 = outputs(base)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(a, b)
