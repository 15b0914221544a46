"""SST temporal action proposal model.

Capability parity with the reference SST (reference: models/sst_model.py):
a stacked LSTM over the frame-feature sequence followed by a K-way sigmoid
scorer — score[t, k] is the confidence that the anchor ``(t-k-1, t]`` is an
event.  The LSTM hidden sequence doubles as the frame-level representation
(``tap_feats``) consumed by the hierarchical context builder.

TPU-native: `lax.scan` recurrence with the input projection hoisted into
one MXU matmul (ops.recurrent.lstm_layer); statically-padded [T] with a
frame mask — pad frames only ever sit *after* valid ones, so the causal
recurrence over valid prefixes is unaffected.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from echr_tpu.config import Config
from echr_tpu.ops.core import dense, dense_init
from echr_tpu.ops.recurrent import lstm_stack, lstm_stack_init

Array = jax.Array

# lax.scan unroll for the frame recurrence: the body is one tiny
# [B, H] @ [H, 4H] matmul, so loop overhead is a real fraction of each
# step; 8 measures ~12% faster at flagship encode dims and is bit-exact
# (docs/BENCH_NOTES.md).
_SCAN_UNROLL = 8


def init_sst(rng: Array, cfg: Config):
    k_rnn, k_out, k_red = jax.random.split(rng, 3)
    input_dim = cfg.tap.video_dim
    p = {
        "rnn": lstm_stack_init(k_rnn, input_dim, cfg.tap.hidden_dim, cfg.tap.rnn_num_layers),
        "scores": dense_init(k_out, cfg.tap.hidden_dim, cfg.tap.K),
    }
    if cfg.tap.reduce_input_dim_layer:
        # reference: sst_model.py:32-33 honors an optional reduce_dim_layer
        p["reduce_dim"] = dense_init(k_red, cfg.tap.raw_input_dim, cfg.tap.video_dim)
    return p


def sst_forward(
    params,
    feats: Array,
    train: bool = False,
    rng: Optional[Array] = None,
    dropout_rate: float = 0.5,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """feats [T, D] -> (tap_feats [T, H], proposal_scores [T, K] in (0,1))."""
    if "reduce_dim" in params:
        feats = dense(params["reduce_dim"], feats, compute_dtype)
    xs = feats[:, None, :]  # [T, 1, D] — single-video fast path
    hs, _ = lstm_stack(
        params["rnn"], xs, dropout_rate=dropout_rate, train=train, rng=rng,
        compute_dtype=compute_dtype, unroll=_SCAN_UNROLL,
    )
    tap_feats = hs[:, 0, :]  # [T, H]
    scores = jax.nn.sigmoid(dense(params["scores"], tap_feats, compute_dtype))
    return tap_feats, scores


def sst_forward_batched(
    params,
    feats: Array,
    train: bool = False,
    rng: Optional[Array] = None,
    dropout_rate: float = 0.5,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """Batched variant: feats [B, T, D] -> ([B, T, H], [B, T, K]).

    The reference is hard-wired to one video per step (SURVEY §2.2); the
    batched path is what data-parallel training shards over the mesh.
    """
    if "reduce_dim" in params:
        feats = dense(params["reduce_dim"], feats, compute_dtype)
    xs = jnp.swapaxes(feats, 0, 1)  # [T, B, D]
    hs, _ = lstm_stack(
        params["rnn"], xs, dropout_rate=dropout_rate, train=train, rng=rng,
        compute_dtype=compute_dtype, unroll=_SCAN_UNROLL,
    )
    tap_feats = jnp.swapaxes(hs, 0, 1)  # [B, T, H]
    scores = jax.nn.sigmoid(dense(params["scores"], tap_feats, compute_dtype))
    return tap_feats, scores
