.PHONY: test test-fast bench native dryrun dressrehearsal clean

# Full-scale ON-DISK dress rehearsal (VERDICT r4 next-3): export the
# synthetic corpus to the real ActivityNet layout (~6.5k videos, ~3 GB),
# run stage-1+2 training short and the fullscale val eval FROM DISK.
dressrehearsal:
	python experiments/dressrehearsal.py

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_labels.py tests/test_metrics.py tests/test_native.py tests/test_loader.py tests/test_cli.py -q

bench:
	python bench.py

native:
	$(MAKE) -C echr_tpu/native

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py

clean:
	rm -rf .jax_cache save echr_tpu/native/echr_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
