"""Tensor-parallel sharding rules (GSPMD-style, zero model-code changes).

The reference has no TP at all (SURVEY.md §2 parallelism table); on TPU it
falls out nearly for free: annotate the *parameters* with PartitionSpecs —
column-shard the QKV/up projections, row-shard the output/down projections —
and XLA's SPMD propagation inserts the all-reduces over ICI. Convs and
norms are replicated (they are a small fraction of FLOPs and TP-sharding
convs would force NHWC channel resharding around every attention block).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagharmony_tpu.parallel.mesh import MODEL_AXIS
from imagharmony_tpu.utils import tree as tree_util

# Linears whose OUTPUT dim shards over the model axis (column parallel).
_COL = {
    "to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "to_kv",
    "q_proj", "k_proj", "v_proj",
    "net_0_proj",  # GEGLU up-projection
    "fc1", "linear1",
}
# Linears whose INPUT dim shards over the model axis (row parallel) — their
# matmul produces a partial sum that GSPMD all-reduces.
_ROW = {"to_out", "out_proj", "net_2", "fc2", "linear2"}


def tp_spec(path, leaf) -> P:
    if len(path) < 2 or getattr(leaf, "ndim", 0) == 0:
        return P()
    parent, last = path[-2], path[-1]
    if getattr(leaf, "ndim", None) == 2 and last == "weight":
        if parent in _COL:
            return P(None, MODEL_AXIS)
        if parent in _ROW:
            return P(MODEL_AXIS, None)
    if getattr(leaf, "ndim", None) == 1 and last == "bias" and parent in _COL:
        return P(MODEL_AXIS)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """Place a param tree with TP shardings on ``mesh`` (replicating
    everything the rules don't cover)."""

    def place(path, x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, tp_spec(path, x)))

    return tree_util.map_leaves_with_path(params, place)


def param_shardings(mesh: Mesh, params):
    """The NamedSharding tree matching shard_params_tp (for jit in_shardings)."""

    def spec(path, x):
        if x is None:
            return None
        return NamedSharding(mesh, tp_spec(path, x))

    return tree_util.map_leaves_with_path(params, spec)
