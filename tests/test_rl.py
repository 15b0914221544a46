"""Self-critical (SCST) path: rollout/replay logprob equality and update."""
import numpy as np
import pytest


def test_rl_rollout_replay_and_update(tmp_path):
    import jax
    import jax.numpy as jnp

    from test_train_e2e import tiny_cfg

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.rl import self_critical_reward
    from echr_tpu.engine.steps import (
        _rl_forward,
        init_train_state,
        rl_rollout_step,
        rl_update_step,
    )
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    batch, meta = loader.get_batch("train")
    while meta.proposal_num <= 0 or meta.n_frames <= 1:
        batch, meta = loader.get_batch("train")

    step_rng = jax.random.PRNGKey(42)
    tap_l, gen_seq, greedy_seq = rl_rollout_step(
        state.tap_params, state.cg_params, batch, cfg, "tap_cg", step_rng
    )
    assert np.isfinite(float(tap_l))

    # replay must reproduce the rollout's logprobs bit-for-bit
    _, _, _, logps_roll = _rl_forward(
        state.tap_params, state.cg_params, cfg, batch, "tap_cg", step_rng
    )
    _, _, _, logps_replay = _rl_forward(
        state.tap_params, state.cg_params, cfg, batch, "tap_cg", step_rng,
        forced=gen_seq,
    )
    m = (np.asarray(gen_seq) > 0)
    np.testing.assert_allclose(
        np.asarray(logps_replay)[m], np.asarray(logps_roll)[m], atol=1e-6
    )

    gt_sentences = [meta.sentences[int(j)] for j in meta.cg_select]
    reward = self_critical_reward(
        np.asarray(gen_seq), np.asarray(greedy_seq), gt_sentences,
        dataset.ix_to_word, np.asarray(batch.prop_mask),
    )
    assert reward.shape == np.asarray(gen_seq).shape

    # snapshot BEFORE the update: rl_update_step donates its state buffers
    a = np.asarray(jax.tree.leaves(state.cg_params)[0])
    new_state, metrics = rl_update_step(
        state, batch, cfg, "tap_cg", step_rng, gen_seq, jnp.asarray(reward)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved when reward is nonzero somewhere
    if np.abs(reward).sum() > 0:
        b = jax.tree.leaves(new_state.cg_params)[0]
        assert not np.array_equal(a, np.asarray(b))


def test_self_critical_in_train_loop(tmp_path):
    from test_train_e2e import tiny_cfg

    from echr_tpu.engine.train import train

    cfg = tiny_cfg(tmp_path, **{"train.self_critical_after": 0})
    out = train(cfg, max_iterations=4)
    assert out["iteration"] == 4


def test_rl_rollout_batched_matches_single_rows(tmp_path):
    """Batched rollout row i == single-video rollout with the row's rng
    split (the per-row rng contract rl_update_step_batched relies on)."""
    import jax

    from test_train_e2e import tiny_cfg

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.steps import (
        init_train_state,
        rl_rollout_step,
        rl_rollout_step_batched,
    )
    from echr_tpu.engine.train import _collate
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    rows = []
    while len(rows) < 2:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num > 0 and meta.n_frames > 1:
            rows.append(batch)
    stacked = _collate(rows)

    step_rng = jax.random.PRNGKey(7)
    tap_l_b, gen_b, greedy_b = rl_rollout_step_batched(
        state.tap_params, state.cg_params, stacked, cfg, "tap_cg", step_rng
    )
    rngs = jax.random.split(step_rng, 2)
    for i, row in enumerate(rows):
        tap_l, gen, greedy = rl_rollout_step(
            state.tap_params, state.cg_params, row, cfg, "tap_cg", rngs[i]
        )
        np.testing.assert_allclose(
            float(np.asarray(tap_l_b)[i]), float(tap_l), atol=1e-5
        )
        # token equality can flip on vmapped-vs-single reassociation ties;
        # near-uniform untrained logits make the sampled tokens the
        # sensitive ones — compare and tolerate a tiny flip rate
        same = (np.asarray(gen_b)[i] == np.asarray(gen)).mean()
        assert same > 0.95, f"row {i}: only {same:.2%} sampled tokens agree"
        same_g = (np.asarray(greedy_b)[i] == np.asarray(greedy)).mean()
        assert same_g > 0.95, f"row {i}: only {same_g:.2%} greedy tokens agree"


def test_self_critical_batched_in_train_loop(tmp_path):
    import jax

    from test_train_e2e import tiny_cfg

    from echr_tpu.engine.train import train

    cfg = tiny_cfg(tmp_path, **{"train.self_critical_after": 0,
                                "train.batch_size": 2})
    out = train(cfg, max_iterations=3)
    assert out["iteration"] == 3


def test_self_critical_batched_mesh(tmp_path):
    """Batched SCST with the video batch sharded over a single-host
    (4 data x 2 model) mesh: the vmapped rollout + policy-gradient update
    are partitioned by XLA exactly like train_step's dp x tp path.

    Runs in a fresh subprocess (same reason as the mesh train test: the
    XLA:CPU compiler segfaults compiling new SPMD programs after the full
    suite's hundreds of cached executables)."""
    import json
    import os
    import subprocess
    import sys

    from test_train_e2e import tiny_cfg

    cfg = tiny_cfg(tmp_path, **{"train.self_critical_after": 0,
                                "train.batch_size": 4})
    cfg = cfg.replace_in("runtime", mesh_shape=(4, 2))
    cfg = cfg.replace_in("data", synthetic_vocab_size=59)  # V+1=60 over tp=2
    cfg_path = tmp_path / "rl_mesh_cfg.json"
    cfg_path.write_text(cfg.to_json())

    script = (
        "import sys;"
        f"sys.path.insert(0, {repr(os.getcwd())});"
        "from echr_tpu.config import Config;"
        "from echr_tpu.engine.train import train;"
        f"cfg = Config.from_json(open({repr(str(cfg_path))}).read());"
        "out = train(cfg, max_iterations=2);"
        "print('RL_MESH_OK', out['iteration'])"
    )
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=420)
    assert "RL_MESH_OK 2" in res.stdout, res.stdout + res.stderr


def test_self_critical_shard_map_mode(tmp_path):
    """SCST under spmd_mode='shard_map': the train steps take the
    shard_map route (Pallas train kernel kept) while the auto-partitioned
    rl rollout/update jits get the remat cfg (use_pallas_train stripped —
    GSPMD would replicate the opaque pallas_call).  Subprocess for the
    usual SPMD-compile reason."""
    import os
    import subprocess
    import sys

    from test_train_e2e import tiny_cfg

    cfg = tiny_cfg(tmp_path, **{"train.self_critical_after": 0,
                                "train.batch_size": 8})
    # build_mesh spans all 8 virtual devices; batch_size must match the
    # data axis.  One 8-row collated batch per ~epoch of the 8-video
    # synthetic set -> give the curriculum room for 2 RL iterations
    cfg = cfg.replace_in("train", cg_epochs=6)
    cfg = cfg.replace_in("runtime", mesh_shape=(8, 1), spmd_mode="shard_map")
    cfg_path = tmp_path / "rl_sm_cfg.json"
    cfg_path.write_text(cfg.to_json())

    script = (
        "import sys;"
        f"sys.path.insert(0, {repr(os.getcwd())});"
        "from echr_tpu.config import Config;"
        "from echr_tpu.engine.train import train;"
        f"cfg = Config.from_json(open({repr(str(cfg_path))}).read());"
        "out = train(cfg, max_iterations=2);"
        "print('RL_SM_OK', out['iteration'])"
    )
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=420)
    assert "RL_SM_OK 2" in res.stdout, res.stdout + res.stderr


def test_reward_pool_matches_serial():
    """RewardPool.score == in-process _score_rows — the SCST host-reward
    parallelization (engine/rl.RewardPool) must be a pure speedup."""
    from echr_tpu.engine.rl import RewardPool, _score_rows

    rows = [
        (0, "a man is running", "a man runs", "the man is running fast"),
        (1, "a dog barks", "a cat sits", "a dog is barking loudly"),
        (2, "", "something", "a person speaks"),
        (3, "cooking in a kitchen", "cooking", "a woman cooks in a kitchen"),
        (4, "a man plays guitar", "a man plays", "someone plays a guitar"),
    ]
    serial = dict(_score_rows(rows, 1.0))
    pool = RewardPool(workers=2)
    try:
        pooled = dict(pool.score(rows, 1.0, chunks=2))
    finally:
        pool.shutdown()
    assert set(pooled) == set(serial)
    for i in serial:
        np.testing.assert_allclose(pooled[i], serial[i], rtol=0, atol=0)


def test_reward_batched_matches_per_video():
    """self_critical_reward_batched == per-video self_critical_reward."""
    from echr_tpu.engine.rl import (
        self_critical_reward,
        self_critical_reward_batched,
    )

    vocab = {str(i): w for i, w in enumerate(
        ["<pad>", "a", "man", "runs", "dog", "barks", "fast"], start=0)}
    r = np.random.RandomState(0)
    B, N, L = 3, 4, 5
    gen = r.randint(0, 7, size=(B, N, L))
    greedy = r.randint(0, 7, size=(B, N, L))
    gts = {b: [f"a man runs {b} {i}" for i in range(N)] for b in range(B)}
    masks = {b: (r.rand(N) > 0.3).astype(np.float32) for b in range(B)}
    batched = self_critical_reward_batched(
        {b: gen[b] for b in range(B)}, {b: greedy[b] for b in range(B)},
        gts, vocab, masks, B, meteor_weight=0.7)
    for b in range(B):
        single = self_critical_reward(gen[b], greedy[b], gts[b], vocab,
                                      masks[b], meteor_weight=0.7)
        np.testing.assert_allclose(batched[b], single, atol=0)
