# Developer entry points (the reference ships a Makefile + CI that runs the
# suite in two feature configurations, reference: Makefile + dusk_ci.yml;
# our analogue: full suite, kernel-only, and the native baseline).

PYTHON ?= python

.PHONY: test test-kernel test-fast test-slow test-multihost bench bench-merkle bench-sponge native clean doc

test:			## full suite on the 8-device virtual CPU mesh (~24 min, 1-core host)
	$(PYTHON) -m pytest tests/ -q

test-kernel:		## kernel/backend equivalence tests only
	$(PYTHON) -m pytest tests/test_perm_pallas.py tests/test_perm_ref.py -q

test-fast:		## fast tier: skips the compile-heavy slow-marked modules (~10 min)
	$(PYTHON) -m pytest tests/ -q -m "not slow"

test-slow:		## slow tier only (dist/fri_tpu/examples/multihost)
	$(PYTHON) -m pytest tests/ -q -m slow

test-multihost:		## the real two-process multi-host test (heavy on 1-core hosts)
	RUN_MULTIHOST=1 $(PYTHON) -m pytest tests/test_multihost.py -q

bench:			## headline TPU benchmark (one JSON line)
	$(PYTHON) bench.py

bench-merkle:
	$(PYTHON) bench.py merkle

bench-sponge:
	$(PYTHON) bench.py sponge

native:			## build the native CPU baseline library
	$(MAKE) -C native

doc:			## quick API surface listing
	$(PYTHON) -c "import hades252_tpu, inspect; print('\n'.join(sorted(n for n in dir(hades252_tpu) if not n.startswith('_'))))"

clean:
	rm -rf native/libhades_cpu.so **/__pycache__ .pytest_cache

coverage:		## line-coverage gate (>=85%, mirroring the reference codecov policy)
	$(PYTHON) tools/coverage_gate.py

lint:			## static-analysis gate (the reference CI's clippy+fmt leg)
	$(PYTHON) tools/lint.py
