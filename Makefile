# Verification entry points. `make check` is the round gate: the full
# pytest suite plus the full-surface DuckDB differential oracle at sf0.01.
# Both are exit-code clean or the target fails.

SF_DIR ?= /root/testdata/sf0.01
BENCH_SF_DIR ?= /root/testdata/sf0.1

.PHONY: check test diffcheck bench bench-quick

check: test diffcheck

test:
	python -m pytest tests/ -x -q

diffcheck:
	python tools/diffcheck.py $(SF_DIR)

bench:
	SPARK_GRAFT_SF_DIR=$(BENCH_SF_DIR) python bench.py

bench-quick:
	SPARK_GRAFT_SF_DIR=$(BENCH_SF_DIR) SPARK_GRAFT_BENCH_HEAVY=0 python bench.py
