.PHONY: test test-tpu test-tpu-artifact bench parity lint

test:
	python -m pytest tests/ -x -q

# on-hardware tier: compiled Pallas kernels, e2e on the chip
# (skips gracefully when no TPU is attached)
test-tpu:
	python -m pytest tests_tpu/ -q

# same tier with per-test subprocess timeouts + TPUTESTS.json artifact:
# a wedged TPU tunnel records a failure instead of hanging forever
test-tpu-artifact:
	python scripts/run_tpu_tests.py --out TPUTESTS.json

bench:
	python bench.py --verbose

parity:
	python scripts/parity_check.py

lint:
	ruff check jolideco_tpu tests tests_tpu || true
