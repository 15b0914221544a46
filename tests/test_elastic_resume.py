"""Elastic resume (net-new, SURVEY §5.3/5.4): a checkpoint written under
one device topology resumes under another — (8,1) dp mesh -> (4,2) dp x tp
mesh -> single device — because checkpoint leaves are host numpy and the
training-data order is topology-independent (replicated host pipeline).
With graceful preemption (test_preemption.py) this is the full
preemptible-pool story: lose the pool, come back on whatever topology is
available, continue at the exact iteration.  Subprocess for the usual
SPMD-compile reason."""
import os
import subprocess
import sys


def test_resume_across_topologies(tmp_path):
    script = f"""
import sys
sys.path.insert(0, {repr(os.getcwd())}); sys.path.insert(0, {repr(os.path.join(os.getcwd(), "tests"))})
import jax; jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from test_train_e2e import tiny_cfg
from echr_tpu.engine.train import train
from echr_tpu.engine import checkpoint as ckpt

tmp = Path({repr(str(tmp_path))})
cfg = tiny_cfg(tmp).replace(run_id="EL")
cfg = cfg.replace_in("train", batch_size=8, cg_epochs=50)

out = train(cfg.replace_in("runtime", mesh_shape=(8, 1)), max_iterations=2)
assert out["iteration"] == 2, out["iteration"]

cfg42 = cfg.replace_in("runtime", mesh_shape=(4, 2)).replace_in("save", start_from="EL")
out = train(cfg42, max_iterations=4)
assert out["iteration"] == 4, out["iteration"]

cfg1 = cfg.replace_in("train", batch_size=2).replace_in("save", start_from="EL")
out = train(cfg1, max_iterations=6)
assert out["iteration"] == 6, out["iteration"]

payload = ckpt.load_checkpoint(str(tmp / "EL" / "model-last.ckpt"))
assert payload["iteration"] == 6, payload["iteration"]

# cross-version resume (VERDICT r3 next-7): rewrite the checkpoint in the
# round-1..3 v1 format (raw TrainState/optax pytree pickle, no
# format_version) and resume from it -- v1 read-compat must hold.
import pickle
p = str(tmp / "EL" / "model-last.ckpt")
v1 = dict(payload)
v1.pop("config", None); v1.pop("config_json", None); v1.pop("format_version", None)
with open(p, "wb") as f:
    pickle.dump(v1, f, protocol=pickle.HIGHEST_PROTOCOL)  # state: raw pytree
out = train(cfg1, max_iterations=8)
assert out["iteration"] == 8, out["iteration"]

# and the rewritten artifact is v2 again (saves always write the new format)
raw = open(p, "rb").read()
assert ckpt.load_checkpoint(p)["format_version"] == 2
assert b"echr_tpu" not in raw  # class-free: survives refactors
print("ELASTIC_OK")
"""
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
    })
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=580)
    assert "ELASTIC_OK" in res.stdout, res.stdout + res.stderr
