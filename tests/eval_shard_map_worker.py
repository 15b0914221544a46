"""Subprocess worker: batched eval, spmd_mode='shard_map' vs single-chip.

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Exercises every shard_map eval step (encode, device top-N select, val-loss,
greedy decode, beam decode, multinomial sampling) over a dp mesh and checks
predictions/losses against the single-chip pipeline.  Prints OK <tag> per
comparison and ALL_OK at the end for the parent test to assert.
"""
import sys


def main(tmp: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import numpy as np

    from test_train_e2e import tiny_cfg

    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader
    from echr_tpu.engine.evaluate import eval_split_batched
    from echr_tpu.engine.steps import init_train_state
    from echr_tpu.models.registry import init_captioner, init_tap
    from echr_tpu.parallel.mesh import build_mesh

    cfg = tiny_cfg(pathlib.Path(tmp))
    dataset = build_dataset(cfg)
    loader = Loader(dataset, cfg, seed=0)
    cfg = cfg.replace_in("decoder", CG_vocab_size=dataset.vocab_size,
                         CG_seq_length=dataset.seq_length)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(cfg, init_tap(rng, cfg), init_captioner(rng, cfg))
    cfg_sm = cfg.replace_in("runtime", spmd_mode="shard_map")
    mesh = build_mesh(shape=(4, 1))

    def run(cfg_, mesh_, name, extra):
        kw = {"val_all_metrics": False, "topN": 15, "language_eval": False,
              "get_eval_loss": True}
        kw.update(extra)
        return eval_split_batched(
            state.tap_params, state.cg_params, loader, cfg_,
            f"{tmp}/{name}.json", kw, flag_eval_what="tap_cg",
            batch_videos=3, mesh=mesh_,  # 3: not a dp multiple (padding path)
        )

    def compare(tag, extra):
        pa, _, la = run(cfg, None, f"{tag}_a", extra)
        pb, _, lb = run(cfg_sm, mesh, f"{tag}_b", extra)
        assert set(pa) == set(pb) and pa, (tag, sorted(pa), sorted(pb))
        for vid in pa:
            assert len(pa[vid]) == len(pb[vid]), (tag, vid)
            for ra, rb in zip(pa[vid], pb[vid]):
                assert ra["sentence"] == rb["sentence"], (tag, vid, ra, rb)
                assert ra["timestamp"] == rb["timestamp"], (tag, vid)
                np.testing.assert_allclose(
                    ra["sentence_confidence"], rb["sentence_confidence"],
                    rtol=1e-4, atol=1e-5)
        if extra.get("get_eval_loss", True):
            np.testing.assert_allclose(la[:3], lb[:3], rtol=1e-3)
        print("OK", tag)

    compare("greedy", {})  # encode + device select + val-loss + greedy decode
    compare("beam", {"beam_size": 2, "get_eval_loss": False})
    # same per-row rng as the auto path: sampled tokens must agree
    compare("sample", {"sample_max": 0, "temperature": 1.0, "sample_seed": 3,
                       "get_eval_loss": False})

    # serving rides the same routed steps: CaptionService output equality
    from echr_tpu.serve import CaptionRequest, CaptionService

    vocab = loader.dataset.ix_to_word
    rs = np.random.RandomState(0)
    reqs = [
        CaptionRequest(
            vid=f"s{i}",
            feats=rs.randn(50 + 7 * i, cfg.tap.video_dim).astype(np.float32),
            duration=30.0 + i,
            lda=rs.randn(cfg.data.lda_dim).astype(np.float32),
        )
        for i in range(5)
    ]
    svc_a = CaptionService(cfg, state.tap_params, state.cg_params, vocab,
                           batch_videos=3, topN=10)
    svc_b = CaptionService(cfg_sm, state.tap_params, state.cg_params, vocab,
                           batch_videos=3, topN=10, mesh=mesh)
    assert svc_b._use_sm
    ca, cb = svc_a.caption(reqs), svc_b.caption(reqs)
    assert set(ca) == set(cb) == {f"s{i}" for i in range(5)}
    for vid in ca:
        assert len(ca[vid]) == len(cb[vid]), vid
        for x, y in zip(ca[vid], cb[vid]):
            assert x.sentence == y.sentence, (vid, x, y)
            assert x.timestamp == y.timestamp, vid
    print("OK serve")
    print("ALL_OK")


if __name__ == "__main__":
    main(sys.argv[1])
