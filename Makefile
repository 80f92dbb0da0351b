.PHONY: test test-fast bench native eval clean

test:
	python -m pytest tests -q

test-fast:
	python -m pytest tests -q -x -m "not slow" -k "not parity and not train"

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -fopenmp native/audioio.cpp -o native/libsdtpu_audioio.so

eval:
	python scripts/eval_synthetic.py --cpu

clean:
	rm -rf native/*.so **/__pycache__ .pytest_cache
