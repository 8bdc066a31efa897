"""Real multi-process jax.distributed execution (the DCN boundary).

Opt-in (IMAGHARMONY_MULTIHOST=1): spawns 2 worker processes + a control
process, each a fresh interpreter with its own virtual-CPU device set —
~2-4 min of XLA:CPU compiles, so it is excluded from the default suite
and run by tools/run_suite.sh's extended pass / by hand:

    IMAGHARMONY_MULTIHOST=1 python -m pytest tests/test_multihost.py -q

Covers SURVEY §2's "DCN across slices" claim for real: DP + FSDP train
steps over a mesh spanning two processes, cross-process grad psum, and a
distributed orbax save/restore of the sharded state (reference boundary:
run.sh:1 + train.py:492-496, accelerate's process group).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.skipif(
    os.environ.get("IMAGHARMONY_MULTIHOST", "0") != "1",
    reason="opt-in: spawns multi-minute multi-process XLA:CPU compiles "
    "(set IMAGHARMONY_MULTIHOST=1)",
)


def test_two_process_dp_fsdp_matches_single_process(tmp_path):
    from run_multihost_drill import run_drill

    summary, _ = run_drill(local_devices=2, num_processes=2, batch=8,
                           timeout=900, workdir=str(tmp_path))
    assert summary["ok"]
    assert summary["restore_maxdiff"] == 0.0
