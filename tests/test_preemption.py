"""Graceful preemption (net-new, SURVEY §5.3): SIGTERM mid-training must
checkpoint at the next iteration boundary, exit cleanly, and leave a
resumable model-last.ckpt — the reference dies mid-step and relies on a
manual --start_from restart with whatever checkpoint happened to exist."""
import os
import signal
import subprocess
import sys
import time

from test_train_e2e import tiny_cfg


def test_sigterm_checkpoints_and_resumes(tmp_path):
    cfg = tiny_cfg(tmp_path).replace(run_id="PRE")
    # run "forever": only the signal ends it
    cfg = cfg.replace_in("train", cg_epochs=10**6)
    cfg = cfg.replace_in("save", losses_log_every=1)
    cfg_path = tmp_path / "pre_cfg.json"
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
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
    })
    out_path = tmp_path / "child.log"
    with open(out_path, "w") as out_f:
        proc = subprocess.Popen([sys.executable, "-c", script], env=env,
                                stdout=out_f, stderr=subprocess.STDOUT,
                                text=True)
        try:
            # wait until the loop is demonstrably iterating, then preempt
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
    assert "preemption" in log_text, log_text

    from echr_tpu.engine import checkpoint as ckpt

    ckpt_path = os.path.join(str(tmp_path), "PRE", "model-last.ckpt")
    assert os.path.exists(ckpt_path), os.listdir(os.path.join(str(tmp_path), "PRE"))
    payload = ckpt.load_checkpoint(ckpt_path)
    it0 = payload["iteration"]
    assert it0 >= 1

    # resume continues from the preempted iteration (reference resume
    # semantics, train.py:133-148 / SURVEY §3.5)
    from echr_tpu.engine.train import train

    cfg_r = cfg.replace_in("save", start_from="PRE")
    out = train(cfg_r, max_iterations=it0 + 2)
    assert out["iteration"] == it0 + 2, (it0, out["iteration"])
