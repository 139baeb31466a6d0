# Build system (reference parity: root Makefile building the codec lib +
# converter; SURVEY.md §2 row 14).  The python package needs no build;
# `native` compiles the C++ host codec (also built lazily on first use).

CXX ?= g++
CXXFLAGS ?= -O2 -fwrapv -fPIC -std=c++17

.PHONY: all native test bench clean

all: native

native: alacjax/native/libalac_host.so

alacjax/native/libalac_host.so: alacjax/native/alac_host.cpp
	$(CXX) $(CXXFLAGS) -shared $< -o $@

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f alacjax/native/libalac_host.so
	rm -rf .jax_cache .jax_cache_cpu
