# Developer entry points.
.PHONY: test test-fast test-e2e bench native demo clean

# fast tier: unit/integration tests, no CLI e2e (see pyproject markers)
test-fast:
	python -m pytest tests/ -x -q -m "not e2e"

# slow tier: CLI/driver end-to-end tests
test-e2e:
	python -m pytest tests/ -x -q -m e2e

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
