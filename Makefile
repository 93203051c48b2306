.PHONY: test native bench clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache
