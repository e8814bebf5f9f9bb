# Build/test entry points (parity with the reference's Makefile +
# Makefile.go; the native lib replaces src/Makefile's libproNet.a).
PY ?= python

.PHONY: all native test bench clean

all: native

native: smore_tpu/native/libfastgraph.so

smore_tpu/native/libfastgraph.so: smore_tpu/native/fastgraph.cpp
	g++ -O3 -march=native -shared -fPIC -std=c++17 -o $@ $<

test: native
	$(PY) -m pytest tests/ -q

bench: native
	$(PY) bench.py

clean:
	rm -f smore_tpu/native/libfastgraph.so
	find . -name __pycache__ -type d -exec rm -rf {} +
