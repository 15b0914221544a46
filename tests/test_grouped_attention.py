"""Group-shared windowed attention == full-T masked attention (f32 exact).

Infrastructure op (not wired into decode — measured slower integrated, see
ops/attention.py header + docs/BENCH_NOTES.md); this pins its correctness:
for windows that fit their group's slice (grouped_tg_required), the grouped
step equals the dense masked step.
"""
import jax
import jax.numpy as jnp
import numpy as np

from echr_tpu.ops.attention import (
    additive_attention_init,
    additive_attention_precompute,
    additive_attention_step,
    grouped_attention_precompute,
    grouped_attention_step,
    grouped_tg_required,
)


def test_grouped_equals_dense():
    T, H, D, N, NG = 96, 64, 48, 32, 8
    r = np.random.RandomState(0)
    p = additive_attention_init(jax.random.PRNGKey(0), D, H, H)
    feats = jnp.asarray(r.randn(T, D).astype(np.float32) * 0.5)
    h = jnp.asarray(r.randn(N, H).astype(np.float32) * 0.5)
    starts = r.randint(0, T - 20, size=N)
    lens = r.randint(2, 16, size=N)
    ends = np.minimum(starts + lens, T)
    mask = np.zeros((N, T), np.float32)
    for n in range(N):
        mask[n, starts[n]:ends[n]] = 1.0
    mask = jnp.asarray(mask)
    soi = np.stack([starts, ends], 1)

    need = grouped_tg_required(soi, NG)
    tg = min(T, ((need + 7) // 8) * 8)
    pre = additive_attention_precompute(p, feats)

    att_dense, _ = additive_attention_step(p, h, feats, pre, mask,
                                           compute_dtype=jnp.float32)
    grp = grouped_attention_precompute(mask, tg, NG)
    att_grp = grouped_attention_step(p, h, feats, pre, grp, jnp.float32)
    np.testing.assert_allclose(np.asarray(att_dense), np.asarray(att_grp),
                               atol=1e-5)

    # the additive_attention_step grouping= entry point routes identically
    att_grp2, w = additive_attention_step(p, h, feats, pre, mask,
                                          compute_dtype=jnp.float32,
                                          grouping=grp)
    assert w is None
    np.testing.assert_allclose(np.asarray(att_grp), np.asarray(att_grp2), atol=0)


def test_grouped_tg_required_batched():
    soi = np.array([[[0, 10], [5, 20], [40, 60], [50, 90]]])  # [1, 4, 2]
    need = grouped_tg_required(soi, 2)
    # groups after sorting: {0-20}, {40-90} -> spans 20 and 50
    assert need == 50


def test_grouped_tg_required_rejects_ragged():
    """grouped_attention_precompute requires ng | N (dense reshapes); the
    host-side helper enforces the same contract so the two halves of the
    API agree on ragged inputs."""
    import pytest

    soi = np.array([[0, 10], [5, 20], [40, 60]])  # N=3
    with pytest.raises(ValueError, match="must divide"):
        grouped_tg_required(soi, 2)
