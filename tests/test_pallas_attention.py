"""Pallas fused attention-score kernel vs the jnp formulation (interpret
mode on CPU; the real kernel runs in bench/eval on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from echr_tpu.ops import pallas_attention
from echr_tpu.ops.attention import additive_attention_init, additive_attention_step
from echr_tpu.ops.core import dense


def test_pallas_scores_match_jnp():
    rng = jax.random.PRNGKey(0)
    T, H, N, D = 128, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    pre_att = jax.random.normal(jax.random.fold_in(rng, 1), (T, H))
    att_h = jax.random.normal(jax.random.fold_in(rng, 2), (N, H))
    ref = dense(p["alpha_net"], jnp.tanh(pre_att[None] + att_h[:, None]))[..., 0]
    got = pallas_attention.attention_scores(pre_att, att_h, p["alpha_net"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_attention_step_pallas_flag_consistent():
    rng = jax.random.PRNGKey(1)
    T, H, N, D = 128, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    feats = jax.random.normal(jax.random.fold_in(rng, 3), (T, D))
    pre_att = dense(p["ctx2att"], feats)
    h = jax.random.normal(jax.random.fold_in(rng, 4), (N, H))
    mask = (jax.random.uniform(jax.random.fold_in(rng, 5), (N, T)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    a1, w1 = additive_attention_step(p, h, feats, pre_att, mask, use_pallas=False)
    a2, w2 = additive_attention_step(p, h, feats, pre_att, mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


def test_unsupported_shapes_fall_back():
    rng = jax.random.PRNGKey(2)
    p = additive_attention_init(rng, 10, 96, 96)  # H=96 not /128
    feats = jax.random.normal(rng, (60, 10))  # T=60 not /8... (60 is /4)
    pre_att = dense(p["ctx2att"], feats)
    h = jax.random.normal(rng, (50, 96))  # N=50 not /64
    mask = jnp.ones((50, 60))
    a, w = additive_attention_step(p, h, feats, pre_att, mask, use_pallas=True)
    assert a.shape == (50, 10)


def test_supported_gate_is_path_specific():
    """The measured T crossover gates only the NO-GRAD decode kernel:
    the differentiable training kernel wins at every bucket (fwd+bwd,
    docs/BENCH_NOTES.md 'Pallas score kernel T crossover') and keeps
    T > 384; the decode path falls back to the jnp formulation there."""
    from echr_tpu.ops import pallas_attention as PA

    pre_small = jnp.zeros((256, 128), jnp.float32)
    pre_big = jnp.zeros((512, 128), jnp.float32)
    q = jnp.zeros((64, 128), jnp.float32)
    assert PA.supported(pre_small, q)
    assert PA.supported(pre_small, q, differentiable=True)
    assert not PA.supported(pre_big, q)  # decode: past the crossover
    assert PA.supported(pre_big, q, differentiable=True)  # train: no ceiling
    # sorted-window callers (decoder_sample's window sort) swap in the
    # higher runtime.pallas_decode_t_max_sorted ceiling: tile-skipping on
    # clustered windows moves the measured crossover past T=512
    from echr_tpu.config import flagship_config

    cfg = flagship_config()
    assert cfg.runtime.pallas_decode_t_max_sorted == 512
    assert PA.supported(pre_big, q, t_max=cfg.runtime.pallas_decode_t_max_sorted)
    pre_huge = jnp.zeros((1024, 128), jnp.float32)
    assert not PA.supported(pre_huge, q,
                            t_max=cfg.runtime.pallas_decode_t_max_sorted)


def test_pallas_scores_diff_grads_match_jnp():
    """Differentiable fused kernel: VJP vs autodiff of the jnp formulation
    (all four inputs, random cotangent)."""
    rng = jax.random.PRNGKey(3)
    T, H, N = 128, 128, 16
    w = jax.random.normal(jax.random.fold_in(rng, 1), (H, 1)) * 0.1
    b = jax.random.normal(jax.random.fold_in(rng, 2), (1,))
    pre_att = jax.random.normal(jax.random.fold_in(rng, 3), (T, H))
    att_h = jax.random.normal(jax.random.fold_in(rng, 4), (N, H))
    ct = jax.random.normal(jax.random.fold_in(rng, 5), (N, T))
    p = {"w": w, "b": b}

    def loss_ref(pre, q, pp):
        s = dense(pp, jnp.tanh(pre[None] + q[:, None]))[..., 0]
        return jnp.sum(s * ct)

    def loss_pallas(pre, q, pp):
        return jnp.sum(pallas_attention.attention_scores_diff(pre, q, pp) * ct)

    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2))(pre_att, att_h, p)
    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2))(pre_att, att_h, p)
    for r, g in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_pallas_scores_diff_grads_vmapped_multiblock():
    """Batched (vmap) + multi-block grid (N, T > one tile): the accumulation
    pattern across grid steps must stay exact."""
    rng = jax.random.PRNGKey(4)
    B, T, H, N = 3, 256, 128, 24
    w = jax.random.normal(jax.random.fold_in(rng, 1), (H, 1)) * 0.1
    b = jnp.zeros((1,))
    pre_att = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, H))
    att_h = jax.random.normal(jax.random.fold_in(rng, 3), (B, N, H))
    ct = jax.random.normal(jax.random.fold_in(rng, 4), (B, N, T))
    p = {"w": w, "b": b}

    def loss_ref(pre, q, pp):
        s = jax.vmap(lambda a, c: dense(pp, jnp.tanh(a[None] + c[:, None]))[..., 0])(pre, q)
        return jnp.sum(s * ct)

    def loss_pallas(pre, q, pp):
        s = jax.vmap(lambda a, c: pallas_attention.attention_scores_diff(a, c, pp))(pre, q)
        return jnp.sum(s * ct)

    ref_g = jax.grad(loss_ref, argnums=(0, 1, 2))(pre_att, att_h, p)
    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2))(pre_att, att_h, p)
    for r, g in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(got_g)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_attention_step_train_pallas_matches_remat():
    """The training-path routing (use_pallas=True, remat=True ->
    attention_scores_diff) equals the jnp remat path in value AND gradient
    through the full attention step (softmax + weighted sum)."""
    rng = jax.random.PRNGKey(5)
    T, H, N, D = 128, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    feats = jax.random.normal(jax.random.fold_in(rng, 1), (T, D))
    h = jax.random.normal(jax.random.fold_in(rng, 2), (N, H))
    mask = (jax.random.uniform(jax.random.fold_in(rng, 3), (N, T)) > 0.3).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)

    def loss(pp, use_pallas):
        pre_att = dense(pp["ctx2att"], feats)
        att, _ = additive_attention_step(pp, h, feats, pre_att, mask,
                                         use_pallas=use_pallas, remat=True)
        return jnp.sum(att * att)

    v_ref, g_ref = jax.value_and_grad(lambda pp: loss(pp, False))(p)
    v_got, g_got = jax.value_and_grad(lambda pp: loss(pp, True))(p)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    for r, g in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_attention_fused_matches_unfused():
    """Fully fused (flash-style) kernel == scores + masked_softmax + AV,
    including a fully-masked row -> zeros.  Measured SLOWER than the
    unfused form on TPU (fifth negative result, BENCH_NOTES) — kept as
    exact-parity-tested infrastructure, not wired into decode."""
    from echr_tpu.ops.masked import masked_softmax

    rng = jax.random.PRNGKey(6)
    T, H, N, D = 256, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    pre = jax.random.normal(jax.random.fold_in(rng, 1), (T, H))
    q = jax.random.normal(jax.random.fold_in(rng, 2), (N, H))
    feats = jax.random.normal(jax.random.fold_in(rng, 3), (T, D))
    mask = (jax.random.uniform(jax.random.fold_in(rng, 4), (N, T)) > 0.3
            ).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)
    mask = mask.at[3].set(0.0)  # fully-masked row

    s = dense(p["alpha_net"], jnp.tanh(pre[None] + q[:, None]))[..., 0]
    w = masked_softmax(s, mask, axis=-1)
    ref = jnp.dot(w.astype(jnp.bfloat16), feats.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    got = pallas_attention.attention_fused(pre, q, p["alpha_net"], mask, feats)
    assert bool((np.asarray(got)[3] == 0).all())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_masked_kernel_matches_on_unmasked_positions():
    """attention_scores_masked == attention_scores wherever mask==1;
    fully-masked tiles are zero-filled and never consumed (masked_softmax)."""
    rng = jax.random.PRNGKey(3)
    T, H, N, D = 256, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    pre_att = jax.random.normal(jax.random.fold_in(rng, 1), (T, H))
    att_h = jax.random.normal(jax.random.fold_in(rng, 2), (N, H))
    # start-sorted short windows: clusters fully-masked tiles
    mask = np.zeros((N, T), np.float32)
    r = np.random.RandomState(0)
    starts = np.sort(r.randint(0, T - 8, size=N))
    lens = r.randint(2, 40, size=N)
    for n in range(N):
        mask[n, starts[n]:min(starts[n] + lens[n], T)] = 1.0
    mask = jnp.asarray(mask)
    full = pallas_attention.attention_scores(pre_att, att_h, p["alpha_net"])
    skip = pallas_attention.attention_scores_masked(
        pre_att, att_h, p["alpha_net"], mask)
    m = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(skip)[m], np.asarray(full)[m],
                               atol=1e-6)
    # at least one tile must actually be skipped by this geometry
    ta = np.asarray(pallas_attention.tile_any_mask(mask))
    assert (ta == 0).any()
    # skipped tiles are zero-filled
    tile = np.kron(ta, np.ones((pallas_attention._TILE_N,
                                pallas_attention._TILE_T))) > 0
    assert np.all(np.asarray(skip)[~tile] == 0.0)


def test_masked_kernel_under_vmap():
    """The batched decode path vmaps the kernel over videos."""
    rng = jax.random.PRNGKey(4)
    B, T, H, N, D = 3, 128, 128, 16, 96
    p = additive_attention_init(rng, D, H, H)
    pre_att = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, H))
    att_h = jax.random.normal(jax.random.fold_in(rng, 2), (B, N, H))
    mask = (jax.random.uniform(jax.random.fold_in(rng, 5), (B, N, T)) > 0.5
            ).astype(jnp.float32)
    got = jax.vmap(lambda pa, q, m: pallas_attention.attention_scores_masked(
        pa, q, p["alpha_net"], m))(pre_att, att_h, mask)
    ref = jax.vmap(lambda pa, q: pallas_attention.attention_scores(
        pa, q, p["alpha_net"]))(pre_att, att_h)
    m = np.asarray(mask) > 0
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(ref)[m],
                               atol=1e-6)
