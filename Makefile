# Convenience targets ≡ the reference's final/Makefile
#   make test   ≡ mpirun -n 4 SpGEMM_mpi_omp_validity ../Matlab/validity_test.mtx 6250 2
#   make bench  ≡ running the benchmark binary
PY ?= python

.PHONY: test bench validate unit native clean

test: unit validate

unit:
	$(PY) -m pytest tests/ -x -q

# the make-test equivalent: multi-device vs serial bit-exact on the fixture
validate:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -m binary_spgemm_tpu.cli validate tests/fixtures/validity_test.mtx --oracle

bench:
	$(PY) bench.py

native:
	$(MAKE) -C binary_spgemm_tpu/native

clean:
	rm -rf .pytest_cache **/__pycache__ binary_spgemm_tpu/native/*.so
