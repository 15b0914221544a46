"""Worker process for the 2-process multi-host test (run via subprocess).

Usage: python multihost_worker.py <coordinator_port> <process_id>
Env (set by the parent test): JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=2

Each process: joins the cluster (echr_tpu.parallel.distributed.initialize),
builds its per-host-sharded Loader over the shared synthetic dataset, then
runs ONE globally-sharded data-parallel train step (batch rows from ITS OWN
shard) and prints the replicated global loss.  The parent asserts the
shards are disjoint/complete and both processes agree on the loss.
"""
import json
import sys

import numpy as np


def main(port: int, pid: int) -> None:
    import jax

    # the container's sitecustomize registers the axon TPU plugin and can
    # flip jax_platforms after env vars are read; force CPU like conftest
    jax.config.update("jax_platforms", "cpu")

    # share the suite's persistent compile cache: the worker compiles three
    # train() loops (dp, resume, dp x tp) and the eval programs — cold that
    # is ~10+ min of XLA:CPU work, warm it is seconds
    from echr_tpu.utils.cache import enable_persistent_compile_cache
    import os as _os

    enable_persistent_compile_cache(
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      ".jax_cache"))

    from echr_tpu.parallel.distributed import initialize

    initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    from jax.sharding import NamedSharding, PartitionSpec as P

    from echr_tpu.config import flagship_config
    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.steps import init_train_state, train_step
    from echr_tpu.engine.train import _collate
    from echr_tpu.models.registry import init_captioner, init_tap
    from echr_tpu.parallel.distributed import global_mesh

    cfg = flagship_config()
    # vocab 61 -> V+1 = 62 divides tp=2, so the embed/logit leaves REALLY
    # shard over the model axis in the dp x tp section below (an odd V+1
    # would silently replicate them via param_sharding_rules' fits() check)
    cfg = cfg.replace_in("data", synthetic=True, synthetic_num_videos=8,
                         synthetic_vocab_size=61, synthetic_seq_length=10,
                         lda_dim=16, time_buckets=(256,), shuffle=False)
    cfg = cfg.replace_in("tap", video_dim=24, hidden_dim=32, K=32,
                         prop_sample_num=8, rnn_num_layers=2)
    cfg = cfg.replace_in("fusion", n_head=4, d_feats=32, d_o=32)
    cfg = cfg.replace_in("decoder", CG_rnn_size=32, CG_input_encoding_size=32,
                         CG_att_hid_size=32)
    cfg = cfg.validate()

    dataset = build_dataset(cfg)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    # per-host shard resolved automatically from the jax runtime
    loader = Loader(dataset, cfg, seed=0)
    print("SHARD", json.dumps({
        "pid": pid,
        "train": loader.split_order["train"],
        "val": loader.split_order["val"],
        "full_train": dataset.split_ix["train"],
    }), flush=True)

    mesh = global_mesh(dp=4, tp=1)  # pure data-parallel over 4 global devices

    # identical params on every process (same PRNGKey), made global/replicated
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    tap_params = init_tap(k1, cfg)
    cg_params = init_captioner(k2, cfg)

    def make_global(spec):
        sharding = NamedSharding(mesh, spec)

        def g(x):
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(sharding, x)

        return g

    tap_params = jax.tree.map(make_global(P()), tap_params)
    cg_params = jax.tree.map(make_global(P()), cg_params)

    # 2 local batch rows from THIS host's shard -> global [4, ...] batch
    rows = []
    while len(rows) < 2:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num > 0 and meta.n_frames > 1:
            rows.append((batch, meta))
    local = _collate([b for b, _ in rows])  # [2, ...] (single time bucket)
    batch_g = jax.tree.map(make_global(P("data")), local)

    with (jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh):
        state = init_train_state(cfg, tap_params, cg_params)
        state, metrics = train_step(state, batch_g, k3, cfg, "tap_cg")
        jax.block_until_ready(metrics)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    print("LOSS", json.dumps({"pid": pid, "loss": loss}), flush=True)
    assert np.isfinite(loss)

    # --- multi-host eval sweep: each process evaluates ITS shard of val,
    # predictions/losses allgathered over the cluster so both report the
    # FULL split identically (engine.evaluate.eval_split_batched multihost) —
    import os
    import tempfile

    import jax.numpy as jnp

    from echr_tpu.engine.evaluate import eval_split_batched

    # local (per-process) param copies: the eval loop is process-local
    # compute; only the final prediction gather crosses processes
    tap_local = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), state.tap_params)
    cg_local = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), state.cg_params)
    ev_loader = Loader(dataset, cfg, seed=0, shard_splits=("train", "val"))
    print("EVAL_SHARD", json.dumps({
        "pid": pid,
        "val_shard": ev_loader.split_order["val"],
        "full_val": dataset.split_ix["val"],
    }), flush=True)
    json_path = os.path.join(tempfile.gettempdir(), f"mh_eval_{port}.json")
    preds, score, val_losses = eval_split_batched(
        tap_local, cg_local, ev_loader, cfg, json_path,
        eval_kwargs={"language_eval": True, "get_eval_loss": True},
        flag_eval_what="cg", batch_videos=2, multihost=True,
    )
    print("EVAL", json.dumps({
        "pid": pid,
        "n_preds": len(preds),
        "meteor": float(np.mean(score.get("METEOR", np.array(0.0)))),
        "val_loss": [float(x) for x in val_losses[:3]],
    }), flush=True)

    # --- multi-host train() END TO END (VERDICT r2 next-4): the full loop
    # with a global-mesh sharded batch, process-0-only checkpoint/log/TB
    # writes, and gating eval through eval_split_batched(multihost=True).
    # Per-process checkpoint_path stands in for a shared FS so the parent
    # can assert SINGLE-WRITER behavior (ckpt files only under pid 0).
    from echr_tpu.engine.train import train

    tcfg = cfg.replace(run_id=f"MH{port}")
    tcfg = tcfg.replace_in("save", checkpoint_path=os.path.join(
        tempfile.gettempdir(), f"mh_train_{port}_{pid}"),
        save_checkpoint_every=2, min_epoch_when_save=-1)
    tcfg = tcfg.replace_in("train", batch_size=4, lr=5e-3)
    tcfg = tcfg.replace_in("eval", num_vids_eval=0, fast_eval_cg=True,
                           batch_videos=2)
    out = train(tcfg, max_iterations=3)
    folder = out["save_folder"]
    print("TRAIN", json.dumps({
        "pid": pid,
        "best_val_score": float(out["best_val_score"]),
        "iteration": out["iteration"],
        "folder": folder,
        "has_last_ckpt": os.path.exists(os.path.join(folder, "model-last.ckpt")),
        "has_train_log": os.path.exists(os.path.join(folder, "train.log")),
        "has_config": os.path.exists(os.path.join(folder, "config.json")),
    }), flush=True)
    # a step-level invariant: the trained params are identical across
    # processes (global replicated arrays) — print a digest
    leaves = jax.tree_util.tree_leaves(out["state"].cg_params)
    digest = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    print("PARAMS", json.dumps({"pid": pid, "digest": digest}), flush=True)

    # --- multi-host RESUME: non-zero processes fetch process 0's checkpoint
    # (a shared FS makes this a no-op in production), then every process
    # resumes and takes one more globally-sharded step — exercising the
    # checkpoint-leaf re-globalization (train._replicate_global) and the
    # identical post-resume gating decision.
    import shutil

    from echr_tpu.parallel.distributed import allgather_object

    allgather_object(("ckpt_written", pid))  # barrier: p0's files on disk
    if pid != 0:
        src = os.path.join(tempfile.gettempdir(), f"mh_train_{port}_0", f"MH{port}")
        for name in ("model-last.ckpt", "model-last.ckpt.config.json"):
            sp = os.path.join(src, name)
            if os.path.exists(sp):
                shutil.copyfile(sp, os.path.join(folder, name))
    rcfg = tcfg.replace_in("save", start_from=f"MH{port}", start_from_mode="last")
    out2 = train(rcfg, max_iterations=4)
    leaves2 = jax.tree_util.tree_leaves(out2["state"].cg_params)
    digest2 = float(sum(np.abs(np.asarray(x)).sum() for x in leaves2))
    print("RESUME", json.dumps({
        "pid": pid,
        "iteration": out2["iteration"],
        "best_val_score": float(out2["best_val_score"]),
        "digest": digest2,
        "changed": bool(abs(digest2 - digest) > 0),
    }), flush=True)

    # --- multi-host dp x tp: mesh (2, 2) over the 4 global devices — the
    # vocab-sharded logit/embed leaves (V+1 = 62 divides tp=2) live
    # model-sharded over each process's two local devices (the model axis
    # is the fast mesh axis, so tp stays within a host and dp crosses DCN),
    # and the gating eval / checkpoint / histograms localize them through
    # the collective resharding allgather (engine.train._localize).
    from echr_tpu.engine.train import _localize
    from echr_tpu.parallel.distributed import global_mesh

    t2cfg = tcfg.replace(run_id=f"MHTP{port}")
    t2cfg = t2cfg.replace_in("runtime", mesh_shape=(2, 2))
    t2cfg = t2cfg.replace_in("train", batch_size=2)
    t2cfg = t2cfg.replace_in("save", checkpoint_path=os.path.join(
        tempfile.gettempdir(), f"mh_tp_{port}_{pid}"))
    out3 = train(t2cfg, max_iterations=2)
    folder3 = out3["save_folder"]
    loc = _localize(out3["state"].cg_params, global_mesh(tp=2))
    digest3 = float(sum(np.abs(x).sum() for x in jax.tree_util.tree_leaves(loc)))
    print("TPTRAIN", json.dumps({
        "pid": pid,
        "best_val_score": float(out3["best_val_score"]),
        "iteration": out3["iteration"],
        "digest": digest3,
        "has_last_ckpt": os.path.exists(os.path.join(folder3, "model-last.ckpt")),
    }), flush=True)

    # --- multi-host batched SCST: the vmapped rollout/update shards over
    # the global data axis; each process computes METEOR rewards only for
    # the batch rows resident on ITS devices and the rows are assembled
    # shard-locally into one global reward array
    # (train._self_critical_step_batched multihost path).  The invariant:
    # both processes end with the identical global params — any divergence
    # in the cross-process reward assembly would desync them immediately.
    scfg = tcfg.replace(run_id=f"MHRL{port}")
    scfg = scfg.replace_in("save", checkpoint_path=os.path.join(
        tempfile.gettempdir(), f"mh_rl_{port}_{pid}"))
    scfg = scfg.replace_in("train", self_critical_after=0, batch_size=4,
                           lr=5e-4)
    out4 = train(scfg, max_iterations=2)
    leaves4 = jax.tree_util.tree_leaves(out4["state"].cg_params)
    digest4 = float(sum(np.abs(np.asarray(x)).sum() for x in leaves4))
    print("RLTRAIN", json.dumps({
        "pid": pid,
        "iteration": out4["iteration"],
        "digest": digest4,
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
