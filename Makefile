# Developer targets mirroring the reference's Makefile (reference
# Makefile:1-38) adapted to this repo's plain-pip TPU environment.

PY ?= python
CPU_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: format
format:
	ruff format mjlab_tpu tests
	ruff check --fix mjlab_tpu tests

.PHONY: type
type:
	pyright mjlab_tpu

.PHONY: check
check: format type

.PHONY: test
test:
	$(PY) -m pytest tests/ -q

.PHONY: test-fast
test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

.PHONY: test-cpu
test-cpu:
	$(CPU_ENV) $(PY) -m pytest tests/ -q

.PHONY: test-cpu-fast
test-cpu-fast:
	$(CPU_ENV) $(PY) -m pytest tests/ -q -m "not slow"

.PHONY: test-all
test-all: check test

.PHONY: bench
bench:
	$(PY) bench.py

.PHONY: bench-fast
bench-fast:
	$(CPU_ENV) BENCH_FAST=1 BENCH_NUM_ENVS=4 BENCH_STEPS=3 BENCH_WARMUP=1 \
	  $(PY) bench.py

.PHONY: multichip-dryrun
multichip-dryrun:
	$(CPU_ENV) $(PY) -c \
	  "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

.PHONY: build
build:
	$(PY) -m pip wheel --no-deps -w dist .
	$(CPU_ENV) $(PY) -m pytest tests/test_env_smoke.py -q

.PHONY: bench-warm
bench-warm:
	$(PY) tools/warm_bench_cache.py
