"""Two-process multi-host (DCN-style) test on CPU.

Launches 2 subprocesses that join a jax.distributed cluster
(127.0.0.1 coordinator), each with 2 virtual CPU devices -> a 4-device
global data-parallel mesh.  Verifies (VERDICT r1 item 5):

  * echr_tpu.parallel.distributed.initialize wires the cluster,
  * Loader shards the train split per process (disjoint + complete) while
    val stays full on every host,
  * one globally-sharded train_step runs with batch rows from each host's
    own shard and both processes report the identical replicated loss.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch_worker_pair():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)), env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        # the worker runs a one-step cluster check, a sharded eval sweep,
        # three short multi-host train() loops (dp, resume, dp x tp) and
        # their gating evals; cold-cache XLA:CPU compiles dominate (~15 min
        # observed) — the persistent compile cache cuts warm reruns to
        # minutes, but the budget must cover a cold first run under
        # full-suite contention
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    return procs, outs


def _retry_gloo_flake(launch, attempts=3):
    """Run `launch() -> (procs, outs)`, retrying on the Gloo-deadline flake.

    XLA:CPU's Gloo communicator init has a HARDCODED 30 s rendezvous
    deadline (no jax/XLA knob).  Communicators are cached per device
    GROUP (not per executable — established empirically by
    tests/gloo_warmup_worker.py), and parallel.mesh.build_mesh now warms
    every group at mesh construction while inter-process skew is small,
    so the historical flake (compile skew > 30 s before the first psum
    over a fresh mesh) should be gone.  The retry stays as
    belt-and-braces for groups created outside build_mesh (e.g. a first
    collective over a device set no mesh warmed), but only for this
    exact failure signature.
    """
    for attempt in range(attempts):
        procs, outs = launch()
        if all(p.returncode == 0 for p in procs):
            break
        gloo_flake = attempt < attempts - 1 and any(
            "Gloo context initialization failed" in out
            and "DEADLINE_EXCEEDED" in out
            for out in outs
        )
        if not gloo_flake:
            break
    return procs, outs


def test_two_process_data_parallel_step():
    procs, outs = _retry_gloo_flake(_launch_worker_pair)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    shards, losses, evals, eval_shards = {}, {}, {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD "):
                d = json.loads(line[6:])
                shards[d["pid"]] = d
            elif line.startswith("LOSS "):
                d = json.loads(line[5:])
                losses[d["pid"]] = d["loss"]
            elif line.startswith("EVAL_SHARD "):
                d = json.loads(line[11:])
                eval_shards[d["pid"]] = d
            elif line.startswith("EVAL "):
                d = json.loads(line[5:])
                evals[d["pid"]] = d

    assert set(shards) == {0, 1} and set(losses) == {0, 1}
    full = shards[0]["full_train"]
    s0, s1 = shards[0]["train"], shards[1]["train"]
    # disjoint, complete, strided by process_index
    assert set(s0) & set(s1) == set()
    assert sorted(s0 + s1) == sorted(full)
    assert s0 == full[0::2] and s1 == full[1::2]
    # val split NOT sharded (checkpoint gating needs full-split scores)
    assert shards[0]["val"] == shards[1]["val"]
    # replicated global loss identical across hosts
    assert np.isfinite(losses[0])
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)

    # --- multi-host eval sweep: val sharded per process for eval, and the
    # prediction allgather returns the FULL split identically on every host
    assert set(evals) == {0, 1} and set(eval_shards) == {0, 1}
    v0, v1 = eval_shards[0]["val_shard"], eval_shards[1]["val_shard"]
    full_val = eval_shards[0]["full_val"]
    assert set(v0) & set(v1) == set()
    assert sorted(v0 + v1) == sorted(full_val)
    # merged predictions cover videos from BOTH shards (> one shard's worth)
    assert evals[0]["n_preds"] == evals[1]["n_preds"]
    assert evals[0]["n_preds"] > len(v0) and evals[0]["n_preds"] > len(v1)
    # identical full-split scores and gathered val-losses on both processes
    assert evals[0]["meteor"] == pytest.approx(evals[1]["meteor"], abs=1e-9)
    assert evals[0]["val_loss"] == pytest.approx(evals[1]["val_loss"], rel=1e-6)

    # --- multi-host train() end-to-end (VERDICT r2 next-4)
    trains, params = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("TRAIN "):
                d = json.loads(line[6:])
                trains[d["pid"]] = d
            elif line.startswith("PARAMS "):
                d = json.loads(line[7:])
                params[d["pid"]] = d["digest"]
    assert set(trains) == {0, 1}
    # both processes made the identical best-checkpoint decision ...
    assert trains[0]["best_val_score"] == pytest.approx(
        trains[1]["best_val_score"], abs=1e-12)
    assert trains[0]["iteration"] == trains[1]["iteration"] >= 3
    # ... and trained to identical global params (replicated arrays)
    assert params[0] == pytest.approx(params[1], rel=1e-9)
    # SINGLE WRITER: checkpoint/log/config written by process 0 only
    assert trains[0]["has_last_ckpt"] and trains[0]["has_train_log"] \
        and trains[0]["has_config"]
    assert not trains[1]["has_last_ckpt"] and not trains[1]["has_train_log"] \
        and not trains[1]["has_config"]

    # --- multi-host resume: checkpoint leaves re-globalized, one more
    # sharded step, identical state and gating decision on both processes
    resumes = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESUME "):
                d = json.loads(line[7:])
                resumes[d["pid"]] = d
    assert set(resumes) == {0, 1}
    assert resumes[0]["iteration"] == resumes[1]["iteration"] == 4
    assert resumes[0]["changed"] and resumes[1]["changed"]  # a step was taken
    assert resumes[0]["digest"] == pytest.approx(resumes[1]["digest"], rel=1e-9)
    assert resumes[0]["best_val_score"] == pytest.approx(
        resumes[1]["best_val_score"], abs=1e-12)

    # --- multi-host dp x tp training: model-sharded leaves localized via
    # the collective allgather for eval/checkpoint/histograms
    tps = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("TPTRAIN "):
                d = json.loads(line[8:])
                tps[d["pid"]] = d
    assert set(tps) == {0, 1}
    assert tps[0]["iteration"] == tps[1]["iteration"] >= 2
    assert tps[0]["best_val_score"] == pytest.approx(
        tps[1]["best_val_score"], abs=1e-12)
    assert tps[0]["digest"] == pytest.approx(tps[1]["digest"], rel=1e-9)
    assert tps[0]["has_last_ckpt"] and not tps[1]["has_last_ckpt"]

    # --- multi-host batched SCST: each process scores only its resident
    # rows; the shard-local reward assembly must keep the global update —
    # and therefore the replicated params — identical on both processes
    rls = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RLTRAIN "):
                d = json.loads(line[8:])
                rls[d["pid"]] = d
    assert set(rls) == {0, 1}
    assert rls[0]["iteration"] == rls[1]["iteration"] == 2
    assert rls[0]["digest"] == pytest.approx(rls[1]["digest"], rel=1e-9)


def test_loader_sharding_explicit_args():
    """Host-side sharding semantics without any jax cluster."""
    from test_train_e2e import tiny_cfg

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader

    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = tiny_cfg(pathlib.Path(td))
        ds = build_dataset(cfg)
        l0 = Loader(ds, cfg, seed=0, process_index=0, process_count=3)
        l1 = Loader(ds, cfg, seed=0, process_index=1, process_count=3)
        l2 = Loader(ds, cfg, seed=0, process_index=2, process_count=3)
        tr = ds.split_ix["train"]
        got = sorted(l0.split_order["train"] + l1.split_order["train"]
                     + l2.split_order["train"])
        assert got == sorted(tr)
        assert l0.split_size("val") == len(ds.split_ix["val"])  # val full
        # single process: identical to the dataset order
        lall = Loader(ds, cfg, seed=0, process_index=0, process_count=1)
        assert sorted(lall.split_order["train"]) == sorted(tr)


def test_cli_multihost_env_init(tmp_path):
    """Operator launch path: `python -m echr_tpu.cli.train` joined into a
    2-process cluster purely via ECHR_COORDINATOR/ECHR_NUM_PROCESSES/
    ECHR_PROCESS_ID (parallel.distributed.maybe_initialize_from_env) —
    the same command on every host, no code.  Asserts both processes
    train to completion and the run artifacts are single-writer."""
    import subprocess
    import sys

    from echr_tpu.config import flagship_config

    cfg = flagship_config()
    cfg = cfg.replace_in("data", synthetic=True, synthetic_num_videos=8,
                         synthetic_vocab_size=61, synthetic_seq_length=10,
                         lda_dim=16, time_buckets=(256,), shuffle=False)
    cfg = cfg.replace_in("tap", video_dim=24, hidden_dim=32, K=32,
                         prop_sample_num=8, rnn_num_layers=2)
    cfg = cfg.replace_in("fusion", n_head=4, d_feats=32, d_o=32)
    cfg = cfg.replace_in("decoder", CG_rnn_size=32, CG_input_encoding_size=32,
                         CG_att_hid_size=32)
    cfg = cfg.replace_in("train", training_mode="pre_cg", cg_epochs=1,
                         batch_size=4, lr=5e-3)
    cfg = cfg.replace_in("save", save_checkpoint_every=10**9,
                         losses_log_every=1)
    cfg = cfg.replace(run_id="CLIMH").validate()

    run_dirs = []

    def _launch():
        # fresh artifact dirs per attempt so a retried run's single-writer
        # assertions are not polluted by the aborted attempt's files
        adir = tmp_path / f"attempt{len(run_dirs)}"
        run_dirs.append(adir)
        port = _free_port()
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update({
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
                "ECHR_COORDINATOR": f"127.0.0.1:{port}",
                "ECHR_NUM_PROCESSES": "2",
                "ECHR_PROCESS_ID": str(pid),
                "PYTHONPATH": os.path.dirname(os.path.dirname(__file__)),
            })
            cdir = adir / f"p{pid}"
            cfg_p = cfg.replace_in("save", checkpoint_path=str(cdir))
            cfg_path = adir / f"cli_mh_{pid}.json"
            cfg_path.parent.mkdir(parents=True, exist_ok=True)
            cfg_path.write_text(cfg_p.to_json())
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "echr_tpu.cli.train",
                 "--config_json", str(cfg_path)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            ))
        outs = [p.communicate(timeout=1500)[0] for p in procs]
        return procs, outs

    procs, outs = _retry_gloo_flake(_launch)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"cli worker {pid} failed:\n{out[-4000:]}"
    # single-writer artifacts: config.json/train.log under process 0 only
    adir = run_dirs[-1]
    assert (adir / "p0" / "CLIMH" / "config.json").exists()
    assert not (adir / "p1" / "CLIMH" / "config.json").exists()


def test_mesh_warmup_survives_cross_process_compile_skew():
    """build_mesh's Gloo warmup makes mesh collectives skew-tolerant.

    XLA:CPU creates one Gloo communicator per device GROUP, lazily, at
    the first collective over that group, with a hard ~30 s rendezvous
    deadline — and compile skew between processes routinely exceeds that
    under full-suite load (the historical test_multihost flake).
    parallel.mesh._warmup_mesh_collectives establishes the communicators
    at mesh construction, while skew is milliseconds; afterwards the
    group is CACHED per device set and op-level waits tolerate arbitrary
    skew.  The worker proves it with an explicit 35 s sleep between mesh
    construction and the first real psum — without the warmup this exact
    setup dies with "Gloo context initialization failed:
    DEADLINE_EXCEEDED: GetKeyValue() timed out with key:
    cpu:gloo/0,1,2048,2049/..." (reproduced, 2026-08; warmup=0 arm of
    tests/gloo_warmup_worker.py)."""
    worker = os.path.join(os.path.dirname(__file__), "gloo_warmup_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)), env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "35", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "PSUM_OK 4.0" in out, out[-2000:]
