#!/bin/bash
# Stable full-suite runner for this environment.
#
# XLA:CPU segfaults nondeterministically inside backend_compile_and_load on
# the suite's larger compilations late in a long-lived pytest process
# (~3/5 single-process runs; see CLAUDE.md). Splitting the suite into
# several fresh processes keeps per-process compiler state small, and a
# raised stack limit guards against LLVM recursion depth. Each chunk is an
# independent pytest run; all must be green. A crashed chunk is the
# environment, not a test failure — rerun that chunk alone (it passes).
set -e
ulimit -s 65536 2>/dev/null || true
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
python -m pytest tests/test_[a-d]*.py -q "$@"
python -m pytest tests/test_[e-k]*.py -q "$@"
python -m pytest tests/test_[l-o]*.py -q "$@"
python -m pytest tests/test_[p-r]*.py -q "$@"
python -m pytest tests/test_[s-t]*.py -q "$@"
python -m pytest tests/test_[u-z]*.py -q "$@"
# extended pass (opt-in): real 2-process jax.distributed drill (~5-8 min)
if [ "${IMAGHARMONY_SUITE_EXTENDED:-0}" = "1" ]; then
  IMAGHARMONY_MULTIHOST=1 python -m pytest tests/test_multihost.py -q "$@"
fi
