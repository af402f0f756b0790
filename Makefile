.PHONY: test bench parity lint

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py --verbose

parity:
	python scripts/parity_check.py

lint:
	ruff check jolideco_tpu tests || true
