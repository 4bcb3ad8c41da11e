# Developer entry points (reference Makefile parity: check/test/run targets).

PY ?= python

.PHONY: check test test-full slt bench run native planner_test clean

check: native test-full slt

test:
	$(PY) -m pytest tests/ -q

test-full:
	$(PY) -m pytest tests/ -q -m ""

slt:
	$(PY) -m tests.slt_runner

planner_test:
	$(PY) -m pytest tests/test_optimizer.py -q

bench:
	$(PY) bench.py

run:
	$(PY) -m sqlrs_tpu.cli --csv-dir /root/reference/tests/csv

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
