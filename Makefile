# Developer entry points.
.PHONY: test test-fast test-e2e bench native demo clean

# fast tier (<5 min on the 1-CPU box): unit/integration tests minus the
# CLI e2e tests and the heavy-trace `slow` set (see tests/conftest.py)
test-fast:
	python -m pytest tests/ -x -q -m "not e2e and not slow"

# slow tier: CLI/driver end-to-end tests + heavy-trace unit tests
test-e2e:
	python -m pytest tests/ -x -q -m "e2e or slow"

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

demo:
	python examples/behavior_transfer_demo.py --steps 100 --size 48

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	$(MAKE) -C native clean
