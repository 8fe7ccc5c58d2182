# Developer entry points.

.PHONY: test test-fast bench bench-decode bench-streaming native lint toy

# note (axon images): every python process with the default PYTHONPATH
# registers the TPU tunnel; concurrent clients get killed. CPU test runs
# drop the axon site so they never touch the chip.
test:
	env PYTHONPATH=$(PWD) JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-fast:
	env PYTHONPATH=$(PWD) JAX_PLATFORMS=cpu python -m pytest tests/ -q \
	    --ignore=tests/test_e2e_toy.py --ignore=tests/test_learning.py

bench:
	python bench.py

bench-decode:
	python bench_decode.py

bench-streaming:
	python tools/bench_streaming.py

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread native/wavio.cc -o native/libwavio.so

toy:
	cd example/asr_toy && bash run.sh
