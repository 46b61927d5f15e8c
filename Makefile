.PHONY: native test bench clean tpu-smoke

# On-device smoke lane (docs/NUMERICS.md trap list): folding guard,
# numerics canary, golden-50 at f32, moist f32 guard.  The timeout makes
# a wedged tunnel session fail loudly instead of hanging the lane.
tpu-smoke:
	timeout 900 python tools/tpu_smoke.py

native:
	cd native && python setup.py build_ext --inplace -q && \
	cp scythe_native_io*.so .. 2>/dev/null || true

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf native/build native/*.so *.so
