# Developer entry points.
.PHONY: test bench native demo clean

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
