#!/bin/sh
# Run the test suite in time-bounded chunks for CI runners with strict
# per-command timeouts (each chunk stays well under ~6 min cold on a
# 1-core box).  `python -m pytest tests/ -q` runs the same default tier
# in one go (~11 min); add -m "" for the full tier incl. slow configs.
set -e
M="${1:-not slow}"
python -m pytest tests/test_recursion.py tests/test_golden.py tests/test_pallas_kernels.py tests/test_alignment.py -q -m "$M"
python -m pytest tests/test_lattice.py tests/test_losses.py tests/test_pruning.py tests/test_edge_cases.py tests/test_serving.py -q -m "$M"
python -m pytest tests/test_stress.py tests/test_parallel.py tests/test_models.py tests/test_decoding.py tests/test_streaming.py tests/test_multiprocess.py tests/test_csrc.py tests/test_features.py tests/test_utils_and_checkpoint.py -q -m "$M"
