.PHONY: test native bench bench-fx demo dryrun clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-fx:
	python -m caltech_bifrost_dsp_tpu.scripts.bench_fx

demo:
	JAX_PLATFORMS=cpu python examples/demo.py

dryrun:
	JAX_PLATFORMS=cpu \
	XLA_FLAGS="--xla_force_host_platform_device_count=8" \
	python __graft_entry__.py dryrun 8

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
