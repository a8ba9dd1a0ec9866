# Build / test / bench entry points (analog of the reference Makefile's
# build, check and profile targets).

PY ?= python3

.PHONY: all native test test-all check bench clean \
	check-128x128 check-128x256 check-256x256-av check-1024x1024-av

all: native

# Build the native I/O extension in-place (optional; pure-Python fallback).
native:
	$(PY) setup.py build_ext --inplace

test:
	$(PY) -m pytest tests/ -x -q

test-all:
	$(PY) -m pytest tests/ -x -q -m ""

# Run ALL FOUR canonical cases end-to-end and validate against the
# reference goldens with the vendored checker (the reference's `make
# check`, extended to every case it ships goldens for).  256x256 and
# 1024x1024 are av_vels-only: their final_state goldens were stripped
# upstream (check/.MISSING_LARGE_BLOBS).  Any failure aborts with rc != 0.
REF := /root/reference
# NOTE: these must be STATIC pattern rules — make never applies implicit
# (plain `check-%:`) pattern rules to .PHONY targets, which silently turns
# every case into "Nothing to be done" and lets `check` report success
# without running anything.
CASES_FULL := 128x128 128x256
CASES_AV := 256x256 1024x1024
check: $(CASES_FULL:%=check-%) $(CASES_AV:%=check-%-av)
	@echo "== all four cases passed =="

$(CASES_FULL:%=check-%): check-%: $(REF)/input_%.params
	$(PY) -m lbm_tpu.cli run $(REF)/input_$*.params \
	    $(REF)/obstacles_$*.dat --output-dir /tmp/lbm_check_$*
	$(PY) tools/check.py \
	    --ref-av-vels-file $(REF)/check/$*.av_vels.dat \
	    --ref-final-state-file $(REF)/check/$*.final_state.dat \
	    --av-vels-file /tmp/lbm_check_$*/av_vels.dat \
	    --final-state-file /tmp/lbm_check_$*/final_state.dat

$(CASES_AV:%=check-%-av): check-%-av: $(REF)/input_%.params
	$(PY) -m lbm_tpu.cli run $(REF)/input_$*.params \
	    $(REF)/obstacles_$*.dat --output-dir /tmp/lbm_check_$*
	$(PY) tools/check.py \
	    --ref-av-vels-file $(REF)/check/$*.av_vels.dat \
	    --av-vels-file /tmp/lbm_check_$*/av_vels.dat

bench:
	$(PY) bench.py

clean:
	rm -rf build lbm_tpu/_native/*.so lbm_tpu/_native/*.o
