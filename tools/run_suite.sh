#!/bin/bash
# Stable full-suite runner for this environment.
#
# XLA:CPU segfaults nondeterministically inside backend_compile_and_load on
# the suite's largest compilations (the full train step) late in a
# long-lived pytest process (~3/5 single-process runs; see CLAUDE.md).
# Splitting the suite into two fresh processes keeps per-process compiler
# state small, and a raised stack limit guards against LLVM recursion depth.
# Each half is an independent pytest run; both must be green.
set -e
ulimit -s 65536 2>/dev/null || true
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
python -m pytest tests/test_[a-o]*.py -q "$@"
python -m pytest tests/test_[p-z]*.py -q "$@"
# extended pass (opt-in): real 2-process jax.distributed drill (~5-8 min)
if [ "${IMAGHARMONY_SUITE_EXTENDED:-0}" = "1" ]; then
  IMAGHARMONY_MULTIHOST=1 python -m pytest tests/test_multihost.py -q "$@"
fi
