"""Frame-axis sharded encoder == unsharded encoder (8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echr_tpu.config import flagship_config
from echr_tpu.models.registry import init_tap
from echr_tpu.models.sst import sst_forward
from echr_tpu.ops.recurrent import lstm_cell_init, lstm_layer
from echr_tpu.parallel.mesh import build_mesh
from echr_tpu.parallel.sequence import sequence_sharded_lstm_layer, sequence_sharded_sst


@pytest.fixture(scope="module")
def mesh():
    if jax.local_device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return build_mesh(shape=(8, 1))


def test_sharded_lstm_layer_matches(mesh):
    rng = jax.random.PRNGKey(0)
    T, B, D, H = 64, 2, 16, 32
    p = lstm_cell_init(rng, D, H)
    xs = jax.random.normal(jax.random.fold_in(rng, 1), (T, B, D))
    ref, _ = lstm_layer(p, xs)
    got = sequence_sharded_lstm_layer(p, xs, mesh, "data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_sst_matches(mesh):
    cfg = flagship_config()
    cfg = cfg.replace_in("tap", video_dim=16, hidden_dim=32, K=16, rnn_num_layers=2)
    cfg = cfg.replace_in("data", lda_dim=8)
    cfg = cfg.replace_in("decoder", CG_vocab_size=50, CG_seq_length=8)
    params = init_tap(jax.random.PRNGKey(1), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(2), (128, 16))
    ref_h, ref_s = sst_forward(params, feats)
    got_h, got_s = sequence_sharded_sst(params, feats, mesh, "data")
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-5)


def test_global_mesh_rejects_nondividing_tp():
    """A requested tensor-parallel degree that does not divide the device
    count must fail fast, not silently degrade to dp-only (review r3)."""
    from echr_tpu.parallel.distributed import global_mesh

    if jax.device_count() % 3 == 0:
        pytest.skip("needs a device count not divisible by 3")
    with pytest.raises(ValueError, match="tensor-parallel"):
        global_mesh(tp=3)


def test_global_mesh_rejects_partial_dp():
    """An explicit dp with dp*tp != device_count must also fail fast —
    build_mesh would otherwise silently rebuild as (n//tp, tp), discarding
    the requested data-parallel degree (review r3, fourth session)."""
    from echr_tpu.parallel.distributed import global_mesh

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    with pytest.raises(ValueError, match="dp\\*tp"):
        global_mesh(dp=jax.device_count() // 2 - 1, tp=2)


def test_global_mesh_honors_tp():
    from echr_tpu.parallel.distributed import global_mesh

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    m = global_mesh(tp=2)
    assert m.shape["model"] == 2
    assert m.shape["data"] == jax.device_count() // 2
