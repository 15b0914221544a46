"""Subprocess worker: one train step, spmd_mode auto vs shard_map.

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Prints MAXDIFF <float> and LOSSES <a> <b> for the parent test to assert.
"""
import sys

import numpy as np


def main(tmp: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from test_train_e2e import tiny_cfg

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.steps import (
        init_train_state,
        train_step,
        train_step_shard_map,
    )
    from echr_tpu.engine.train import _collate
    from echr_tpu.models.registry import init_captioner, init_tap
    from echr_tpu.parallel.mesh import build_mesh, shard_params
    from echr_tpu.utils.cache import enable_persistent_compile_cache
    import os

    enable_persistent_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))

    cfg = tiny_cfg(pathlib.Path(tmp))
    # f32 so the two summation orders (global mean vs local-mean + pmean)
    # compare tightly; shard_map mode is dp-only
    cfg = cfg.replace_in("runtime", compute_dtype="float32")
    dataset = build_dataset(cfg)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    loader = Loader(dataset, cfg, seed=0)
    rows = []
    while len(rows) < 4:
        batch, meta = loader.get_batch("train")
        if meta.proposal_num > 0 and meta.n_frames > 1:
            rows.append(batch)
    stacked = _collate(rows)

    mesh = build_mesh(shape=(4, 1), devices=jax.devices()[:4])
    batch_g = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data"))),
        stacked,
    )
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    tap0 = shard_params(init_tap(k1, cfg), mesh)
    cg0 = shard_params(init_captioner(k2, cfg), mesh)

    def fresh():
        return init_train_state(
            cfg, jax.tree.map(jnp.array, tap0), jax.tree.map(jnp.array, cg0))

    # 3 steps on the same batch in each mode: step k's loss reflects the
    # params produced by steps <k, so trajectory equality pins the gradient
    # math, not just the forward (post-Adam params themselves amplify
    # ~1e-6 f32 reassociation noise by g/sqrt(v) normalisation and are
    # only loosely comparable)
    keys = jax.random.split(k3, 3)

    def run(step_fn):
        st, ls = fresh(), []
        for k in keys:
            st, m = step_fn(st, k)
            ls.append(float(np.asarray(m["loss"])))
        return st, ls

    st_a, loss_a = run(lambda st, k: train_step(st, batch_g, k, cfg, "tap_cg"))
    st_b, loss_b = run(lambda st, k: train_step_shard_map(
        st, batch_g, k, cfg, "tap_cg", mesh=mesh))
    diffs = [
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(jax.tree_util.tree_leaves(st_a.cg_params),
                        jax.tree_util.tree_leaves(st_b.cg_params))
    ] + [
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(jax.tree_util.tree_leaves(st_a.tap_params),
                        jax.tree_util.tree_leaves(st_b.tap_params))
    ]
    print("LOSSES", " ".join(f"{x:.8f}" for x in loss_a + loss_b), flush=True)
    print("MAXDIFF", max(diffs), flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
