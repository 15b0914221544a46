"""Frame-axis (sequence) sharding — the long-video escape hatch.

The reference processes one video's whole C3D sequence on one device
(SURVEY §5.7: T ~ 10^2-10^3, no sequence parallelism exists or is needed at
that scale).  For much longer videos the limiting resource is activation
memory: this module shards the frame axis of the SST encoder across the
mesh with `shard_map`:

  * the input projection x@W_ih, the K-way scorer, and every downstream
    frame-parallel op (clip attention precompute, segment pooling) are
    embarrassingly parallel over T and run fully sharded;
  * the LSTM recurrence is inherently sequential, so the carry travels
    around the ring with `lax.ppermute`: in round k device k scans its
    chunk from the true carry and hands (h, c) to device k+1.  Each device
    stores only its T/n chunk of activations — memory scales 1/n while the
    recurrence stays (unavoidably) serial in wall-clock.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from echr_tpu.ops.recurrent import _gates

Array = jax.Array


def sequence_sharded_lstm_layer(
    p, xs: Array, mesh: Mesh, axis_name: str = "data"
) -> Array:
    """One LSTM layer over [T, B, in] with the frame axis sharded over
    `axis_name`.  Returns the hidden sequence [T, B, H] (same sharding).
    T must be divisible by the axis size."""
    n = mesh.shape[axis_name]
    T, B, _ = xs.shape
    assert T % n == 0, f"frame axis {T} must divide over {n} devices"
    H = p["w_hh"].shape[0]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None, None)),
        out_specs=P(axis_name, None, None),
    )
    def run(p_local, xs_local):
        # frame-parallel input projection (local chunk only)
        pre = jnp.dot(xs_local, p_local["w_ih"], preferred_element_type=jnp.float32)
        if "b_ih" in p_local:
            pre = pre + p_local["b_ih"] + p_local["b_hh"]
        w_hh = p_local["w_hh"]

        def step(carry, pre_t):
            h, c = carry
            z = pre_t + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
            i, f, g, o = _gates(z, H)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        my = jax.lax.axis_index(axis_name)
        # the initial carry must be marked varying over the shard axis or the
        # scan carry types mismatch (output depends on sharded data)
        z = jnp.zeros((B, H), jnp.float32)
        if hasattr(jax.lax, "pcast"):
            zero = jax.lax.pcast(z, axis_name, to="varying")
        else:  # older jax
            zero = jax.lax.pvary(z, (axis_name,))
        carry = (zero, zero)
        out = jnp.zeros_like(pre[..., :H])
        perm = [(i, (i + 1) % n) for i in range(n)]
        # ring rounds: in round k only device k's scan starts from the true
        # carry; ppermute hands it to k+1 for the next round
        for k in range(n):
            (hT, cT), hs = jax.lax.scan(step, carry, pre)
            mine = my == k
            out = jnp.where(mine, hs, out)
            carry_out = (
                jnp.where(mine, hT, carry[0]),
                jnp.where(mine, cT, carry[1]),
            )
            carry = (
                jax.lax.ppermute(carry_out[0], axis_name, perm),
                jax.lax.ppermute(carry_out[1], axis_name, perm),
            )
        return out

    return run(p, xs)


def sequence_sharded_sst(params, feats: Array, mesh: Mesh, axis_name: str = "data"):
    """SST encoder with the frame axis sharded (stacked layers + scorer).

    feats [T, D] -> (tap_feats [T, H], proposal scores [T, K]); outputs are
    sharded over the frame axis on `axis_name`.
    """
    from echr_tpu.ops.core import dense

    xs = feats[:, None, :]
    h = xs
    for lp in params["rnn"]:
        h = sequence_sharded_lstm_layer(lp, h, mesh, axis_name)
    tap_feats = h[:, 0, :]
    scores = jax.nn.sigmoid(dense(params["scores"], tap_feats))  # frame-parallel
    return tap_feats, scores
