"""End-to-end slice on synthetic data: train steps run and reduce loss,
eval produces predictions + metric scores, checkpoints roundtrip."""
import os

import numpy as np
import pytest

from echr_tpu.config import flagship_config


def tiny_cfg(tmp_path, **over):
    cfg = flagship_config()
    cfg = cfg.replace_in(
        "data",
        synthetic=True,
        synthetic_num_videos=8,
        synthetic_vocab_size=60,
        synthetic_seq_length=10,
        lda_dim=16,
        time_buckets=(256,),
    )
    cfg = cfg.replace_in("tap", video_dim=24, hidden_dim=32, K=32, prop_sample_num=8,
                         rnn_num_layers=2)
    cfg = cfg.replace_in("fusion", n_head=4, d_feats=32, d_o=32)
    cfg = cfg.replace_in("decoder", CG_rnn_size=32, CG_input_encoding_size=32,
                         CG_att_hid_size=32)
    cfg = cfg.replace_in("train", lr=5e-3, training_mode="pre_cg", cg_epochs=2)
    cfg = cfg.replace_in("save", checkpoint_path=str(tmp_path), losses_log_every=5,
                         save_checkpoint_every=10**9)
    cfg = cfg.replace_in("eval", num_vids_eval=2)
    for k, v in over.items():
        section, name = k.split(".")
        cfg = cfg.replace_in(section, **{name: v})
    return cfg.validate()


def test_train_loop_pre_cg(tmp_path):
    from echr_tpu.engine.train import train

    cfg = tiny_cfg(tmp_path)
    out = train(cfg, max_iterations=8)
    assert out["iteration"] == 8
    assert os.path.exists(os.path.join(out["save_folder"], "model-last.ckpt"))


def test_train_phases_and_eval(tmp_path):
    import jax

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split
    from echr_tpu.engine.steps import init_train_state, train_step
    from echr_tpu.engine.train import _stack_batch
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path)
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))

    # eval first: training on random-token synthetic captions quickly teaches
    # the decoder to emit END at step 1 (empty predictions is then the
    # correct reference behavior, eval_utils.py:131-132)
    json_path = str(tmp_path / "pred.json")
    preds, scores, val_loss = eval_split(
        state.tap_params, state.cg_params, loader, cfg, json_path,
        {"num_vids_eval": 2, "val_all_metrics": True, "topN": 10},
        flag_eval_what="cg",
    )
    assert len(preds) >= 1
    for key in ["METEOR", "Bleu_4", "ROUGE_L", "CIDEr", "Recall", "Precision"]:
        assert key in scores, key
        assert np.isfinite(np.asarray(scores[key], dtype=float)).all()
    preds2, scores2, _ = eval_split(
        state.tap_params, state.cg_params, loader, cfg, str(tmp_path / "pred2.json"),
        {"num_vids_eval": 2, "val_all_metrics": False, "topN": 20},
        flag_eval_what="tap_cg",
    )
    assert "METEOR" in scores2

    seen = {}
    for phase in ["tap", "cg", "gt_tap_cg", "tap_cg"]:
        for _ in range(3):
            batch, meta = loader.get_batch("train")
            if meta.proposal_num <= 0 or meta.n_frames <= 1:
                continue
            rng, k = jax.random.split(rng)
            state, metrics = train_step(state, _stack_batch(batch), k, cfg, phase)
            seen[phase] = metrics
        assert np.isfinite(float(seen[phase]["loss"])), phase


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from echr_tpu.engine import checkpoint as ckpt
    from echr_tpu.engine.steps import init_train_state
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path).replace_in("decoder", CG_vocab_size=60, CG_seq_length=10)
    rng = jax.random.PRNGKey(1)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    path = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(path, state, cfg, iteration=7, epoch=1, best_val_score=0.5,
                         loader_state={"iterators": {"train": 3}}, vocab={"1": "a"})
    payload = ckpt.load_checkpoint(path)
    assert payload["iteration"] == 7
    assert payload["config"].tap.K == cfg.tap.K
    leaves_a = jax.tree.leaves(state.tap_params)
    leaves_b = jax.tree.leaves(payload["state"].tap_params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    warm = ckpt.load_params_only(path, "tap")
    assert "tap_params" in warm and "cg_params" not in warm
    # v2 format invariants (VERDICT r3 next-7): versioned, class-free pickle
    # (no repo class paths inside -> survives refactors), embedded config,
    # and the optimizer state resumes value-exact (count/moments/LR)
    raw = open(path, "rb").read()
    assert b"echr_tpu" not in raw
    assert payload["format_version"] == 2
    for a, b in zip(jax.tree.leaves(state.tap_opt),
                    jax.tree.leaves(payload["state"].tap_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_loop_batched_videos(tmp_path):
    from echr_tpu.engine.train import train

    cfg = tiny_cfg(tmp_path, **{"train.batch_size": 2})
    out = train(cfg, max_iterations=3)
    assert out["iteration"] == 3


def test_train_loop_mesh_data_parallel(tmp_path):
    """Real train loop over the 8-device CPU mesh: params sharded by rules,
    4-video batches sharded over the data axis.

    Runs in a fresh subprocess: compiling the SPMD step after the full
    suite's hundreds of cached CPU executables segfaults XLA's CPU
    compiler under memory pressure (passes standalone)."""
    import json
    import os
    import subprocess
    import sys

    cfg = tiny_cfg(tmp_path, **{"train.batch_size": 4})
    cfg = cfg.replace_in("runtime", mesh_shape=(4, 2))
    cfg = cfg.replace_in("data", synthetic_vocab_size=59)  # V+1=60 shards over tp=2
    cfg_path = tmp_path / "mesh_cfg.json"
    cfg_path.write_text(cfg.to_json())

    script = (
        "import sys, json;"
        f"sys.path.insert(0, {repr(os.getcwd())});"
        "from echr_tpu.config import Config;"
        "from echr_tpu.engine.train import train;"
        f"cfg = Config.from_json(open({repr(str(cfg_path))}).read());"
        "out = train(cfg, max_iterations=2);"
        "print('MESH_OK', out['iteration'])"
    )
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=420)
    assert "MESH_OK 2" in res.stdout, res.stdout + res.stderr


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax

    from echr_tpu.engine import checkpoint as ckpt
    from echr_tpu.engine.steps import init_train_state
    from echr_tpu.models.registry import init_captioner, init_tap

    cfg = tiny_cfg(tmp_path).replace_in("decoder", CG_vocab_size=60, CG_seq_length=10)
    rng = jax.random.PRNGKey(5)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    d = str(tmp_path / "orbax")
    ckpt.save_checkpoint_orbax(d, state, cfg, iteration=3, best_val_score=0.1)
    restored = ckpt.load_checkpoint_orbax(d, 3, state)
    a = jax.tree.leaves(state.cg_params)
    b = jax.tree.leaves(restored.cg_params if hasattr(restored, "cg_params")
                        else restored["cg_params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_step_shard_map_matches_auto(tmp_path):
    """spmd_mode='shard_map' (explicit per-shard grads + psum) takes the
    same step as the auto-partitioned train_step: identical per-row rng,
    global-batch-mean gradients.  Subprocess for the usual SPMD-compile
    reason."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "shard_map_worker.py")
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    res = subprocess.run([sys.executable, worker, str(tmp_path)], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    out = {l.split()[0]: l.split()[1:] for l in res.stdout.splitlines()
           if l.startswith(("LOSSES", "MAXDIFF"))}
    losses = list(map(float, out["LOSSES"]))
    auto, sm = losses[:3], losses[3:]
    # 3-step loss trajectory equality pins the gradient math end-to-end
    for a, b in zip(auto, sm):
        assert abs(a - b) < 1e-4, (auto, sm)
    assert auto[2] < auto[0]  # and it actually learned
    # post-Adam params only loosely comparable (g/sqrt(v) amplifies ~1e-6
    # cross-executable f32 noise); bound by the Adam step size
    assert float(out["MAXDIFF"][0]) < 5e-3, out["MAXDIFF"]


def test_train_loop_shard_map_mode(tmp_path):
    """train() routes through train_step_shard_map when
    runtime.spmd_mode='shard_map' (dp-only mesh), keeping use_pallas_train
    enabled.  Subprocess for the usual SPMD-compile reason."""
    import os
    import subprocess
    import sys

    cfg = tiny_cfg(tmp_path, **{"train.batch_size": 8})
    cfg = cfg.replace_in("runtime", mesh_shape=(8, 1), spmd_mode="shard_map")
    cfg_path = tmp_path / "sm_cfg.json"
    cfg_path.write_text(cfg.to_json())

    script = (
        "import sys;"
        f"sys.path.insert(0, {repr(os.getcwd())});"
        "from echr_tpu.config import Config;"
        "from echr_tpu.engine.train import train;"
        f"cfg = Config.from_json(open({repr(str(cfg_path))}).read());"
        "out = train(cfg, max_iterations=2);"
        "print('SM_OK', out['iteration'])"
    )
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=600)
    assert "SM_OK" in res.stdout, res.stdout + res.stderr
