# Development gates — the reference's CI is a format check + a build
# (/root/reference/.github/workflows/main.yml:15-30); the TPU rebuild's
# equivalents are a bytecode-compile gate (build analog) and the CPU test
# suite (run on 8 virtual devices by tests/conftest.py).

PY ?= python

.PHONY: check lint test test-tpu bench

check: lint test

lint:
	$(PY) -m compileall -q bibim_tpu tests tools bench.py __graft_entry__.py

test:
	$(PY) -m pytest tests/ -q

test-tpu:
	BIBIM_TPU_TESTS=1 $(PY) -m pytest tests/test_tpu.py -q

bench:
	$(PY) bench.py
