# Top-level targets (the analogue of the reference's recursive Makefile).

.PHONY: all native test bench demo clean

all: native

native:
	$(MAKE) -C native libdspio.so

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

demo:
	sh examples/demo.sh

clean:
	$(MAKE) -C native clean
