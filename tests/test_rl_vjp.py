"""Resident-VJP SCST: the rollout exports its sampled-pass VJP residuals as
device arrays and the update is pullback + Adam only (engine/steps.py
"Resident-VJP SCST", VERDICT r3 weak-6 follow-through).  Must be a pure
restructuring: same rollout outputs, same update, same metrics as the
two-program rollout/update pair."""
import numpy as np


def _setup(tmp_path):
    import jax

    from test_train_e2e import tiny_cfg

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.steps import init_train_state
    from echr_tpu.engine.train import _collate
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    tap0, cg0 = init_tap(rng, cfg), init_captioner(rng, cfg)

    rows = []
    while len(rows) < 2:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num > 0 and meta.n_frames > 1:
            rows.append(batch)
    stacked = _collate(rows)

    def fresh_state():
        # update steps donate their state buffers — each path gets its own
        return init_train_state(cfg, jax.tree.map(np.array, tap0),
                                jax.tree.map(np.array, cg0))

    return cfg, stacked, fresh_state


def test_resident_vjp_matches_two_program(tmp_path):
    import jax
    import jax.numpy as jnp

    from echr_tpu.engine.steps import (
        rl_pullback_update_step_batched,
        rl_rollout_step_batched,
        rl_rollout_vjp_step_batched,
        rl_update_step_batched,
    )

    cfg, stacked, fresh_state = _setup(tmp_path)
    step_rng = jax.random.PRNGKey(42)
    phase = "tap_cg"

    st_a = fresh_state()
    tap_l_a, gen_a, greedy_a = rl_rollout_step_batched(
        st_a.tap_params, st_a.cg_params, stacked, cfg, phase, step_rng
    )
    st_b = fresh_state()
    tap_l_b, logps_b, gen_b, greedy_b, res = rl_rollout_vjp_step_batched(
        st_b.tap_params, st_b.cg_params, stacked, cfg, phase, step_rng
    )

    # the vjp rollout's sampled pass and greedy baseline trace the same
    # per-row ops with the same rng splits — outputs must agree (token
    # ids are argmax/categorical draws, tolerate nothing)
    np.testing.assert_array_equal(np.asarray(gen_a), np.asarray(gen_b))
    np.testing.assert_array_equal(np.asarray(greedy_a), np.asarray(greedy_b))
    np.testing.assert_allclose(np.asarray(tap_l_a), np.asarray(tap_l_b),
                               atol=1e-6)
    assert len(res) > 0  # residuals actually exported

    reward = jnp.asarray(
        np.random.RandomState(3).uniform(-0.5, 0.5,
                                         np.asarray(gen_a).shape)
        .astype(np.float32))

    new_a, m_a = rl_update_step_batched(
        st_a, stacked, cfg, phase, step_rng, gen_a, reward
    )
    new_b, m_b = rl_pullback_update_step_batched(
        st_b, stacked, cfg, phase, step_rng, gen_b, reward,
        tap_l_b, logps_b, res,
    )

    for k in m_a:
        np.testing.assert_allclose(
            float(np.asarray(m_a[k])), float(np.asarray(m_b[k])),
            atol=1e-6, err_msg=f"metric {k}")
    # updated parameters: the pullback applies the SAME cotangents through
    # the same backward structure the forced replay linearizes — grads (and
    # therefore Adam updates) match to float tolerance
    la = jax.tree.leaves(new_a.cg_params) + jax.tree.leaves(new_a.tap_params)
    lb = jax.tree.leaves(new_b.cg_params) + jax.tree.leaves(new_b.tap_params)
    assert len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   atol=2e-5, rtol=1e-5)


def test_resident_vjp_layout_guard(tmp_path):
    """The pullback update re-traces the forward to rebuild the residual
    layout; a divergent trace (different batch shapes) must fail loudly,
    not corrupt gradients."""
    import jax
    import jax.numpy as jnp
    import pytest

    from echr_tpu.engine.steps import (
        rl_pullback_update_step_batched,
        rl_rollout_vjp_step_batched,
    )

    cfg, stacked, fresh_state = _setup(tmp_path)
    step_rng = jax.random.PRNGKey(1)
    st = fresh_state()
    tap_l, logps, gen, _, res = rl_rollout_vjp_step_batched(
        st.tap_params, st.cg_params, stacked, cfg, "tap_cg", step_rng
    )
    reward = jnp.zeros(np.asarray(gen).shape, jnp.float32)
    # drop one residual array -> layout mismatch -> loud trace-time error
    with pytest.raises(Exception, match="residual layout|resident-vjp"):
        rl_pullback_update_step_batched(
            st, stacked, cfg, "tap_cg", step_rng, gen, reward,
            tap_l, logps, tuple(res)[:-1],
        )
