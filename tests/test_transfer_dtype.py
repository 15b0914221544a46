"""bf16 feature transfer: halved host->device payload, identical outputs.

runtime.transfer_dtype="bfloat16" quantises the C3D feature payload to
bf16 for the upload and upcasts on device.  Under a bf16 compute_dtype
every feats consumer (SST input matmul, segment_mean, attention
precompute / weighted sum) casts to bf16 before its matmul anyway, so the
quantisation is provably a no-op — pinned here end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.evaluate import eval_split_batched
from echr_tpu.engine.steps import init_train_state
from echr_tpu.models.registry import init_captioner, init_tap


def test_bf16_transfer_identical_predictions_under_bf16_compute(tmp_path):
    cfg = tiny_cfg(tmp_path).replace_in("runtime", compute_dtype="bfloat16")
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    kw = {"num_vids_eval": 2, "val_all_metrics": False, "topN": 15,
          "language_eval": False, "get_eval_loss": False}
    preds_f32, _, _ = eval_split_batched(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "a.json"),
        kw, flag_eval_what="tap_cg", batch_videos=4)
    cfg_bf = cfg.replace_in("runtime", transfer_dtype="bfloat16")
    preds_bf16, _, _ = eval_split_batched(
        state.tap_params, state.cg_params, loader, cfg_bf, str(tmp_path / "b.json"),
        kw, flag_eval_what="tap_cg", batch_videos=4)
    assert set(preds_f32) == set(preds_bf16) and preds_f32
    for vid in preds_f32:
        assert len(preds_f32[vid]) == len(preds_bf16[vid])
        for pa, pb in zip(preds_f32[vid], preds_bf16[vid]):
            assert pa["sentence"] == pb["sentence"], vid
            assert pa["timestamp"] == pb["timestamp"]
            assert pa["proposal_score"] == pb["proposal_score"]  # bit-equal
            # the two cfgs compile separate executables; XLA:CPU AOT-cache
            # entries built under different machine-feature flags can
            # differ from fresh compiles at ~1e-5 (freshly compiled, the
            # sums agree bit-for-bit — verified; see also the dense-op
            # no-op test below, which runs inside ONE executable)
            np.testing.assert_allclose(
                pa["sentence_confidence"], pb["sentence_confidence"], atol=1e-3)


def test_bf16_quantisation_is_noop_through_bf16_matmuls():
    """The core claim in isolation: x @ W in bf16 compute gives the same
    result for f32 inputs and bf16-quantised-then-upcast inputs."""
    from echr_tpu.ops.core import dense, dense_init

    r = np.random.RandomState(0)
    p = dense_init(jax.random.PRNGKey(0), 24, 16)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    x = jnp.asarray(r.randn(7, 24).astype(np.float32))
    xq = jnp.asarray(np.asarray(x).astype(jnp.bfloat16)).astype(jnp.float32)
    a = dense(p, x, jnp.bfloat16)
    b = dense(p, xq, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
