.PHONY: native test bench clean

native:
	cd native && python setup.py build_ext --inplace -q && \
	cp scythe_native_io*.so .. 2>/dev/null || true

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf native/build native/*.so *.so
