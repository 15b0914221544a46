"""Every decoder core in the registry trains and decodes end-to-end."""
import jax
import numpy as np
import pytest

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.steps import decode_step, init_train_state, train_step
from echr_tpu.engine.train import _stack_batch
from echr_tpu.models.captioner import ProposalBatch
from echr_tpu.models.decoder import CORE_REGISTRY
from echr_tpu.models.registry import init_captioner, init_tap
from echr_tpu.models.sst import sst_forward

NEEDS_INPUT_FEATS = {"show_attend_tell", "all_img"}


@pytest.mark.parametrize("model", sorted(CORE_REGISTRY))
def test_core_variant_end_to_end(tmp_path, model):
    import jax.numpy as jnp

    cfg = tiny_cfg(tmp_path)
    cfg = cfg.replace_in("decoder", caption_model=model,
                         CG_num_layers=3 if model == "three_stream" else 2)
    if model in NEEDS_INPUT_FEATS:
        # these cores concat selected contexts into the rnn input
        # (reference: get_input_feats); give them video+event+clip
        cfg = cfg.replace_in("context", CG_input_feats_type="V+E+C",
                             CG_init_feats_type="V+E")
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    batch, meta = loader.get_batch("train")
    while meta.proposal_num <= 0 or meta.n_frames <= 1:
        batch, meta = loader.get_batch("train")

    state, metrics = train_step(state, _stack_batch(batch), rng, cfg, "tap_cg")
    assert np.isfinite(float(metrics["loss"])), model

    tap_feats, _ = sst_forward(state.tap_params, jnp.asarray(batch.feats))
    props = ProposalBatch(
        jnp.asarray(batch.ind_select), jnp.asarray(batch.soi), jnp.asarray(batch.prop_mask)
    )
    seq, logps, active = decode_step(
        state.cg_params, cfg, tap_feats, jnp.asarray(batch.feats),
        jnp.asarray(batch.lda), jnp.asarray(batch.frame_mask), props,
    )
    assert seq.shape == (cfg.tap.prop_sample_num, cfg.decoder.CG_seq_length)
    assert np.isfinite(np.asarray(logps)).all(), model
