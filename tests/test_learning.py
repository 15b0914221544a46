"""Learning dynamics: the TAP model actually learns on synthetic data
(features carry event-correlated structure), and caption NLL decreases
under teacher forcing."""
import jax
import numpy as np

from test_train_e2e import tiny_cfg

from echr_tpu.data.dataset import build_dataset
from echr_tpu.data.loader import Loader
from echr_tpu.engine.steps import init_train_state, train_step, val_loss_step
from echr_tpu.engine.train import _stack_batch
from echr_tpu.models.registry import init_captioner, init_tap


def _avg_val_loss(state, loader, cfg, key, n=3):
    vals = []
    loader.reset_iterator("val")
    for _ in range(n):
        batch, meta = loader.get_batch("val")
        if meta.proposal_num <= 0 or meta.n_frames <= 1:
            continue
        m = val_loss_step(state.tap_params, state.cg_params, batch, cfg, phase="tap_cg")
        vals.append(float(m[key]))
    return float(np.mean(vals))


def test_losses_decrease(tmp_path):
    cfg = tiny_cfg(tmp_path, **{"train.lr": 2e-3})
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    tap0 = _avg_val_loss(state, loader, cfg, "tap_loss")
    cg0 = _avg_val_loss(state, loader, cfg, "cg_loss")

    steps = 0
    while steps < 30:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num <= 0 or meta.n_frames <= 1:
            continue
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, _stack_batch(batch), k, cfg, "tap_cg")
        steps += 1

    tap1 = _avg_val_loss(state, loader, cfg, "tap_loss")
    cg1 = _avg_val_loss(state, loader, cfg, "cg_loss")
    assert tap1 < tap0, (tap0, tap1)
    assert cg1 < cg0, (cg0, cg1)


def test_tap_score_separation_improves(tmp_path):
    """After pre_tap training the model scores positive anchors above
    negatives (mean-score margin on held-out videos grows) — F1@topN is too
    coarse to move in a short test, score separation is the direct signal."""
    from echr_tpu.models.sst import sst_forward

    cfg = tiny_cfg(tmp_path, **{"train.lr": 2e-3,
                                "data.synthetic_num_videos": 16})
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(1)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    def margin():
        import jax.numpy as jnp

        vals = []
        loader.reset_iterator("val")
        for _ in range(4):
            batch, meta = loader.get_batch("val")
            if meta.proposal_num <= 0 or meta.n_frames <= 1:
                continue
            _, scores = sst_forward(state.tap_params, jnp.asarray(batch.feats))
            s = np.asarray(scores)
            pos = (np.asarray(batch.tap_labels) > 0) & (np.asarray(batch.tap_masks) > 0)
            neg = (np.asarray(batch.tap_labels) == 0) & (np.asarray(batch.tap_masks) > 0)
            vals.append(float(s[pos].mean() - s[neg].mean()))
        return float(np.mean(vals))

    m0 = margin()
    steps = 0
    while steps < 100:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num <= 0 or meta.n_frames <= 1:
            continue
        rng, k = jax.random.split(rng)
        state, _ = train_step(state, _stack_batch(batch), k, cfg, "tap")
        steps += 1
    m1 = margin()
    assert m1 > m0 + 0.01, (m0, m1)


def test_reverse_w0_flips_weights(tmp_path):
    cfg = tiny_cfg(tmp_path)
    ds = build_dataset(cfg)
    loader = Loader(ds, cfg, seed=0)
    b1, _ = loader.get_batch("train")
    cfg2 = tiny_cfg(tmp_path, **{"train.reverse_w0": True})
    loader2 = Loader(build_dataset(cfg2), cfg2, seed=0)
    b2, _ = loader2.get_batch("train")
    np.testing.assert_allclose(np.asarray(b2.w1), 1.0 - np.asarray(b1.w1), atol=1e-7)
