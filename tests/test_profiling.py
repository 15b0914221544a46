"""Profiling harness: timing with host-fetch barriers."""
import jax
import jax.numpy as jnp

from echr_tpu.utils.profiling import StepTimer, time_fn


def test_time_fn():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    stats = time_fn(f, x, iters=4, warmup=1)
    assert stats["mean_s"] > 0 and stats["p50_s"] > 0
    assert stats["min_s"] <= stats["mean_s"] * 1.5


def test_step_timer():
    t = StepTimer()
    t.tick()
    t.tick()
    assert t.rate() >= 0
    t.reset()
    assert t.n == 0
