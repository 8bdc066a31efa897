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
# test_pipeline_features has grown compile-heavy enough to crash a single
# process on its own, so it runs as two alphabetical halves.
set -e
ulimit -s 65536 2>/dev/null || true
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
python -m pytest tests/test_[a-d]*.py -q "$@"
python -m pytest tests/test_[e-k]*.py -q "$@"
python -m pytest tests/test_[l-o]*.py -q "$@"
PF_A="clip_skip or denoising or dpmpp or encoder or euler_ancestral or guidance_rescale or img2img or inpainting or ip_all"
python -m pytest tests/test_pipeline_features.py -q -k "$PF_A" "$@"
python -m pytest tests/test_pipeline_features.py -q -k "not ($PF_A)" "$@"
python -m pytest tests/test_pa*.py tests/test_pipeline.py tests/test_pns.py -q "$@"
python -m pytest tests/test_re*.py tests/test_schedulers.py -q "$@"
python -m pytest tests/test_s[d-z]*.py tests/test_t*.py -q "$@"
python -m pytest tests/test_[u-z]*.py -q "$@"
# extended pass (opt-in): real 2-process jax.distributed drill (~5-8 min)
if [ "${IMAGHARMONY_SUITE_EXTENDED:-0}" = "1" ]; then
  IMAGHARMONY_MULTIHOST=1 python -m pytest tests/test_multihost.py -q "$@"
fi
