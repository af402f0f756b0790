.PHONY: test test-tpu bench parity lint

test:
	python -m pytest tests/ -x -q

# on-hardware tier: compiled Pallas kernels, e2e on the chip
# (skips gracefully when no TPU is attached)
test-tpu:
	python -m pytest tests_tpu/ -q

bench:
	python bench.py --verbose

parity:
	python scripts/parity_check.py

lint:
	ruff check jolideco_tpu tests tests_tpu || true
