# Test/dev targets.
#
# CRITICAL environment note: the axon sitecustomize claims the single TPU at
# EVERY python interpreter start; concurrent processes spin on the claim and
# can wedge the relay. CPU-side work (tests, tools) must disable it by
# clearing PALLAS_AXON_POOL_IPS. Only one TPU process may run at a time.

TEST_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

# per-file subprocesses with segfault retry: this host's XLA:CPU compiler
# crashes sporadically (see tools/run_suite.py) and would kill a single
# pytest process mid-suite
test:
	$(TEST_ENV) python tools/run_suite.py -m "not slow"

test-all:
	$(TEST_ENV) python tools/run_suite.py

native:
	$(MAKE) -C goicp_tpu/native

bench:
	python bench.py

.PHONY: test test-all native bench
