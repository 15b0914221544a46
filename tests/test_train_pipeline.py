"""Pipelined train loop (runtime.train_pipeline, engine/train._TrainPrep):
the producer thread + deferred metrics fetch must be an INVISIBLE
performance structure — bit-identical training trajectory, identical
checkpoint/resume semantics, and clean SIGTERM preemption — vs the
synchronous loop (which itself mirrors the reference's, train.py:252-349).
"""
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np

from test_train_e2e import tiny_cfg


def _pipeline_cfg(tmp_path, pipelined: bool, run_id: str, **over):
    cfg = tiny_cfg(tmp_path, **{"train.batch_size": 4, **over})
    # several epoch wraps in few iterations (8 synthetic videos / B=4 = 2
    # groups per epoch) + a step-decay LR change pin the epoch_at_step /
    # epoch_after replay and the set_lr scheduling
    cfg = cfg.replace_in("train", cg_epochs=8, learning_rate_decay_start=1,
                         learning_rate_decay_every=2,
                         learning_rate_decay_rate=0.5)
    cfg = cfg.replace_in("runtime", train_pipeline=pipelined, train_inflight=3)
    return cfg.replace(run_id=run_id)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_pipelined_matches_sync_trajectory(tmp_path):
    """Same seed, same iterations -> bitwise-identical params, identical
    loss histories (the deferred metrics fetch must not reorder or drop
    per-step losses), identical epoch bookkeeping."""
    from echr_tpu.engine.train import train

    outs = {}
    for name, flag in (("sync", False), ("pipe", True)):
        cfg = _pipeline_cfg(tmp_path / name, flag, run_id=name)
        outs[name] = train(cfg, max_iterations=12)

    s, p = outs["sync"], outs["pipe"]
    # the 8-epoch curriculum exhausts at 10 updates (bad-video skips eat
    # some pulls) — before max_iterations, which also pins the
    # curriculum-exhausted epoch bookkeeping of the pipelined exit path
    assert p["iteration"] == s["iteration"] == 10
    assert p["epoch"] == s["epoch"]
    for a, b in zip(_leaves(s["state"].tap_params), _leaves(p["state"].tap_params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(_leaves(s["state"].cg_params), _leaves(p["state"].cg_params)):
        np.testing.assert_array_equal(a, b)


def test_pipelined_loss_histories_match_sync(tmp_path):
    """histories['loss'] at the log boundaries — accumulated through the
    batched deferred fetch — must equal the synchronous per-step sums."""
    from echr_tpu.engine import checkpoint as ckpt
    from echr_tpu.engine.train import train

    hist = {}
    for name, flag in (("sync", False), ("pipe", True)):
        cfg = _pipeline_cfg(tmp_path / name, flag, run_id=name)
        cfg = cfg.replace_in("save", losses_log_every=4)
        out = train(cfg, max_iterations=8)
        payload = ckpt.load_checkpoint(
            os.path.join(out["save_folder"], "model-last.ckpt"))
        hist[name] = payload["histories"]["loss"]
    assert hist["pipe"] == hist["sync"]
    assert set(hist["pipe"].keys()) == {4, 8}


def test_pipelined_checkpoint_rewinds_producer_runahead(tmp_path):
    """Checkpoints must record the CONSUMED loader cursor, not the prep
    thread's run-ahead: interrupt at iter 4, resume to 8 — the resumed
    trajectory must be bitwise identical to the synchronous loop doing the
    same interrupt+resume (a run-ahead cursor in the checkpoint would skip
    the queued-but-unconsumed videos on resume)."""
    from echr_tpu.engine.train import train

    finals = {}
    for name, flag in (("sync", False), ("pipe", True)):
        cfg = _pipeline_cfg(tmp_path / name, flag, run_id=name)
        out = train(cfg, max_iterations=4)
        assert out["iteration"] == 4
        cfg2 = cfg.replace_in("save", start_from=name)
        out = train(cfg2, max_iterations=8)
        assert out["iteration"] == 8
        finals[name] = out["state"]
    for a, b in zip(_leaves(finals["sync"].cg_params),
                    _leaves(finals["pipe"].cg_params)):
        np.testing.assert_array_equal(a, b)


def test_pipelined_sigterm_preempts_cleanly(tmp_path):
    """SIGTERM mid-run: the pipelined loop must stop at an iteration
    boundary, join the prep thread, rewind the loader, write a resumable
    model-last.ckpt, and exit 0 (mirrors test_preemption.py for the
    synchronous loop)."""
    cfg = _pipeline_cfg(tmp_path, True, run_id="PREP")
    cfg = cfg.replace_in("train", cg_epochs=10**6)
    cfg = cfg.replace_in("save", losses_log_every=1)
    cfg_path = tmp_path / "prep_cfg.json"
    cfg_path.write_text(cfg.to_json())

    script = (
        "import sys, logging;"
        f"sys.path.insert(0, {repr(os.getcwd())});"
        "logging.basicConfig(level=logging.INFO);"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from echr_tpu.config import Config;"
        "from echr_tpu.engine.train import train;"
        f"cfg = Config.from_json(open({repr(str(cfg_path))}).read());"
        "out = train(cfg);"
        "print('PREEMPT_EXIT', out['iteration'], flush=True)"
    )
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
    out_path = tmp_path / "child.log"
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen([sys.executable, "-c", script], env=env,
                                stdout=out_f, stderr=subprocess.STDOUT,
                                text=True)
        try:
            deadline = time.time() + 300
            while time.time() < deadline:
                if "iter 1 (" in out_path.read_text():
                    break
                if proc.poll() is not None:
                    raise AssertionError(
                        "child exited early:\n" + out_path.read_text())
                time.sleep(0.5)
            else:
                raise AssertionError(
                    "no training iteration within 300s:\n" + out_path.read_text())
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
    log_text = out_path.read_text()
    assert rc == 0, log_text
    assert "PREEMPT_EXIT" in log_text, log_text
    ckpt_path = tmp_path / "PREP" / "model-last.ckpt"
    assert ckpt_path.exists(), log_text

    # and the checkpoint resumes (pipelined again)
    from echr_tpu.config import Config
    from echr_tpu.engine.train import train

    cfg2 = Config.from_json(cfg_path.read_text())
    cfg2 = cfg2.replace_in("save", start_from="PREP")
    from echr_tpu.engine import checkpoint as ckpt

    it0 = ckpt.load_checkpoint(str(ckpt_path))["iteration"]
    out = train(cfg2, max_iterations=it0 + 2)
    assert out["iteration"] == it0 + 2


def test_pipelined_preempt_before_first_item_keeps_pristine_cursor(
        tmp_path, monkeypatch):
    """Preemption landing while the producer is still staging the FIRST
    group must checkpoint the pre-producer loader cursor (review r4): the
    prep thread pulls from __init__, so a post-construction state()
    snapshot can already contain run-ahead — resuming from it would skip
    pulled-but-never-trained videos."""
    import threading

    from echr_tpu.engine import checkpoint as ckpt
    from echr_tpu.engine import train as T

    cfg = _pipeline_cfg(tmp_path, True, run_id="ZERO")

    # preemption already hit when the loop starts; queue kept empty by
    # holding the producer inside its first compress call, AFTER the first
    # loader pull advanced the cursor
    monkeypatch.setattr(T, "_install_preemption_handler",
                        lambda: {"hit": True})
    monkeypatch.setattr(T, "_restore_preemption_handler", lambda box: None)

    pulled = threading.Event()
    orig_compress = T._compress_batch

    def slow_compress(batch, cfg_):
        pulled.set()
        time.sleep(2.0)  # hold the producer past the consumer's exit
        return orig_compress(batch, cfg_)

    monkeypatch.setattr(T, "_compress_batch", slow_compress)

    # signal from the loader pull too (ADVICE r4): compress only runs on
    # good-video pulls, so if the producer's first pulls were all bad videos
    # and the abort landed between pulls the event would never fire and the
    # test would block 20 s on a healthy run
    from echr_tpu.data.loader import Loader

    orig_get = Loader.get_batch

    def get_and_signal(self, *a, **k):
        out = orig_get(self, *a, **k)
        pulled.set()
        return out

    monkeypatch.setattr(Loader, "get_batch", get_and_signal)

    out = T.train(cfg)
    assert pulled.wait(timeout=20), "producer never pulled a batch"
    assert out["iteration"] == 0

    payload = ckpt.load_checkpoint(
        os.path.join(out["save_folder"], "model-last.ckpt"))
    st = payload["loader_state"]
    assert st["iterators"].get("train", 0) == 0, (
        "checkpoint cursor contains producer run-ahead")
    assert st["epochs"].get("train", 0) == 0


def test_pipelined_prep_failure_propagates(tmp_path, monkeypatch):
    """A failure inside the prep thread (compress/collate/upload) must
    re-raise on the main thread and leave no live train-prep thread
    (mirrors the batched-eval prep-thread guarantee)."""
    import threading

    import pytest

    from echr_tpu.engine import train as T

    cfg = _pipeline_cfg(tmp_path, True, run_id="FAIL")
    calls = {"n": 0}
    orig = T._compress_batch

    def boom(batch, cfg_):
        calls["n"] += 1
        if calls["n"] > 5:
            raise RuntimeError("synthetic prep failure")
        return orig(batch, cfg_)

    monkeypatch.setattr(T, "_compress_batch", boom)
    with pytest.raises(RuntimeError, match="synthetic prep failure"):
        T.train(cfg, max_iterations=50)
    names = ("train-prep", "train-put")  # both producer stages (r5 split)
    deadline = time.time() + 15
    while time.time() < deadline:
        if not [t for t in threading.enumerate() if t.name in names]:
            break
        time.sleep(0.2)
    assert not [t for t in threading.enumerate() if t.name in names]
