"""Streaming greedy decode head (ops/pallas_head): correctness vs the jnp
head, plan feasibility, and the decoder integration gates.

The kernel fuses the [R, C] x [C, V+1] logit matmul with its
argmax/max/logsumexp consumers (reference head form:
models/OldModel_NEW.py:133-137 logit + log_softmax + greedy argmax).
CPU runs exercise the kernel in Pallas interpret mode at the OP level
only — the decoder gate keeps production CPU paths on the jnp head so
cross-path tie-breaking on near-uniform logits stays bit-identical
(docs: CLAUDE.md untrained-tie note).  On a real TPU the gate is ON and
test_decoder_equality_tpu pins full-decode token equality.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echr_tpu.ops.pallas_head import (greedy_head, head_plan,
                                      pad_head_weights)


def _ref_head(out, w, b):
    logits = jnp.dot(out.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32) + b.astype(jnp.float32)
    return (jnp.argmax(logits, axis=1).astype(jnp.int32),
            jnp.max(logits, axis=1),
            jax.scipy.special.logsumexp(logits, axis=1))


@pytest.mark.parametrize("R,C,V1", [
    (128, 96, 301),    # per-video prop bucket, odd vocab
    (120, 64, 1201),   # non-multiple rows
    (512, 256, 6001),  # flagship-ish vocab
    (8, 8, 129),       # minimal
])
def test_streaming_head_matches_jnp(R, C, V1):
    plan = head_plan(R, C, V1)
    assert plan is not None
    tr, tv, _, _ = plan
    r = np.random.RandomState(R + V1)
    w = jnp.asarray((r.randn(C, V1) * 0.05).astype(np.float32))
    b = jnp.asarray((r.randn(V1) * 0.1).astype(np.float32))
    out = jnp.asarray((r.randn(R, C) * 0.3).astype(np.float32))
    wp, bp = pad_head_weights(w, b, tv)
    it, mx, lse = greedy_head(out, wp, bp, tr, tv)
    it_r, mx_r, lse_r = _ref_head(out, w, b)
    np.testing.assert_array_equal(np.asarray(it), np.asarray(it_r))
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_r), atol=1e-4)


def test_cross_tile_tie_keeps_first_index():
    """jnp.argmax takes the FIRST max; a later vocab tile must not steal an
    exact tie (strict > in the merge)."""
    C, V1 = 8, 2048  # two 1024-tiles
    plan = head_plan(8, C, V1)
    tr, tv, _, _ = plan
    assert V1 // tv >= 2, "fixture needs >= 2 vocab tiles"
    w = np.zeros((C, V1), np.float32)
    b = np.zeros((V1,), np.float32)
    # out row of ones -> logits = column sums; put the SAME max in both
    # tiles (cols 3 and 1024+7): first index must win
    w[:, 3] = 1.0
    w[:, tv + 7] = 1.0
    out = jnp.ones((8, C), jnp.float32)
    wp, bp = pad_head_weights(jnp.asarray(w), jnp.asarray(b), tv)
    it, _, _ = greedy_head(out, wp, bp, tr, tv)
    assert np.all(np.asarray(it) == 3)


def test_head_plan_infeasible_returns_none():
    # enormous C: no (TR, TV) fits the VMEM budget
    assert head_plan(1024, 4_000_000, 6001) is None
    assert head_plan(0, 512, 100) is None


def test_decoder_gate_off_paths():
    """The decoder only streams the head on greedy, non-forced, eval-mode,
    bf16, TPU-backend calls."""
    from echr_tpu.config import Config
    from echr_tpu.models.decoder import _stream_head_setup

    cfg = Config()
    params = {"logit": {"w": jnp.zeros((16, 33), jnp.bfloat16),
                        "b": jnp.zeros((33,), jnp.float32)}}
    on_tpu = jax.default_backend() == "tpu"
    R = 4096  # at/above the measured min-rows floor
    # the fully-eligible call only fires on a real TPU backend
    got = _stream_head_setup(params, cfg, R, True, None, False, None)
    assert (got is not None) == on_tpu
    # below the row floor the jnp head wins (measured) — unless forced
    assert _stream_head_setup(params, cfg, 128, True, None, False, None) is None
    forced = _stream_head_setup(params, cfg, 128, True, None, False, True)
    assert (forced is not None) == on_tpu
    # every gate individually forces the jnp head
    assert _stream_head_setup(params, cfg, R, False, None, False, None) is None
    assert _stream_head_setup(params, cfg, R, True,
                              jnp.zeros((8, 4), jnp.int32), False, None) is None
    assert _stream_head_setup(params, cfg, R, True, None, True, None) is None
    assert _stream_head_setup(params, cfg, R, True, None, False, False) is None
    f32p = {"logit": {"w": jnp.zeros((16, 33), jnp.float32),
                      "b": jnp.zeros((33,), jnp.float32)}}
    assert _stream_head_setup(f32p, cfg, R, True, None, False, None) is None
    cfg_off = cfg.replace_in("runtime", use_pallas_head=False)
    assert _stream_head_setup(params, cfg_off, R, True, None, False, None) is None


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full-decode equality needs the real TPU kernel")
def test_decoder_equality_tpu():
    """Greedy decode with the streaming head is token-identical (and logprob
    ~equal) to the jnp head on the real TPU, per-video and batched."""
    from echr_tpu.config import Config
    from echr_tpu.models.captioner import make_contexts
    from echr_tpu.models.registry import init_captioner
    from echr_tpu.models.decoder import (decoder_sample,
                                         decoder_sample_batched)
    from echr_tpu.engine.steps import _cast
    from echr_tpu.models.captioner import ProposalBatch

    cfg = Config().replace_in("runtime", compute_dtype="bfloat16")
    cfg = cfg.replace_in("decoder", CG_vocab_size=500, CG_seq_length=12)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    cg = _cast(params, cfg)
    T, N, B = 64, 128, 32  # B*N = 4096: the batched gate fires naturally
    r = np.random.RandomState(0)
    mk = lambda: make_contexts(
        cg, cfg, jnp.asarray(r.randn(T, cfg.tap.hidden_dim), jnp.float32),
        jnp.asarray(r.randn(T, cfg.tap.video_dim), jnp.float32),
        jnp.asarray(r.randn(cfg.data.lda_dim), jnp.float32),
        ProposalBatch(jnp.asarray(r.randint(1, T, (N,))),
                      jnp.asarray(np.sort(r.randint(0, T, (N, 2)), axis=1)),
                      jnp.ones((N,), jnp.float32)),
        jnp.ones((T,), jnp.float32), False)
    ctxs = mk()
    # stream_head=True: explicit opt-in past the min-rows perf floor so the
    # per-video form exercises the kernel at this test's small N
    seq_k, logp_k, act_k = decoder_sample(cg["decoder"], cfg, ctxs,
                                          stream_head=True)
    seq_j, logp_j, act_j = decoder_sample(cg["decoder"], cfg, ctxs,
                                          stream_head=False)
    np.testing.assert_array_equal(np.asarray(seq_k), np.asarray(seq_j))
    np.testing.assert_allclose(np.asarray(logp_k), np.asarray(logp_j),
                               atol=5e-4)
    np.testing.assert_array_equal(np.asarray(act_k), np.asarray(act_j))

    ctxs_b = jax.tree.map(lambda x: jnp.stack([x] * B), ctxs)
    seq_b, logp_b, act_b = decoder_sample_batched(cg["decoder"], cfg, ctxs_b)
    cfg_off = cfg.replace_in("runtime", use_pallas_head=False)
    seq_o, logp_o, act_o = decoder_sample_batched(cg["decoder"], cfg_off,
                                                  ctxs_b)
    np.testing.assert_array_equal(np.asarray(seq_b), np.asarray(seq_o))
    np.testing.assert_allclose(np.asarray(logp_b), np.asarray(logp_o),
                               atol=5e-4)
