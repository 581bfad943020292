.PHONY: native test bench clean

native:
	cd native && python setup.py build_ext --inplace -q && cp rna_algos_native*.so ../rna_algos_tpu/

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf native/build native/*.so rna_algos_tpu/rna_algos_native*.so
