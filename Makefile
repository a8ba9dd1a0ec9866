# Build / test / bench entry points (analog of the reference Makefile's
# build, check and profile targets).

PY ?= python3

.PHONY: all native test test-all check bench clean

all: native

# Build the native I/O extension in-place (optional; pure-Python fallback).
native:
	$(PY) setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -x -q

test-all:
	$(PY) -m pytest tests/ -x -q -m ""

# Run the 128x128 case end-to-end and validate against the reference
# goldens with the vendored checker (the reference's `make check`).
check:
	$(PY) -m lbm_tpu.cli run /root/reference/input_128x128.params \
	    /root/reference/obstacles_128x128.dat --output-dir /tmp/lbm_check
	$(PY) tools/check.py \
	    --ref-av-vels-file /root/reference/check/128x128.av_vels.dat \
	    --ref-final-state-file /root/reference/check/128x128.final_state.dat \
	    --av-vels-file /tmp/lbm_check/av_vels.dat \
	    --final-state-file /tmp/lbm_check/final_state.dat

bench:
	$(PY) bench.py

clean:
	rm -rf build lbm_tpu/_native/*.so lbm_tpu/_native/*.o
