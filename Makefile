# Developer entry points (reference analog: pub:Makefile, SURVEY.md C11).

PY ?= python

.PHONY: test test-fast native bench clean

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -x -k "not fuzz and not multihost_driver"

native:
	$(MAKE) -C kbbq_tpu/io/native

bench:
	$(PY) bench.py --quick

clean:
	rm -f kbbq_tpu/io/native/libkbbq_io.so
	find . -name __pycache__ -type d -exec rm -rf {} +
