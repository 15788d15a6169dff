# Build the native engines and stage the package (mirror of the reference's
# top-level makefile role: reference makefile:1-27).

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean

.PHONY: all native test bench clean
