# Top-level convenience targets.

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test:
	./scripts/test.sh -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
