from echr_tpu.metrics.eval_score import eval_score  # noqa: F401
