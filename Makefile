# Developer entry points.

.PHONY: test test-fast bench bench-decode native lint toy

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --ignore=tests/test_e2e_toy.py \
	    --ignore=tests/test_learning.py

bench:
	python bench.py

bench-decode:
	python bench_decode.py

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread native/wavio.cc -o native/libwavio.so

toy:
	cd example/asr_toy && bash run.sh
