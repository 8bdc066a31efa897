"""FSDP-style (ZeRO-3) parameter/optimizer sharding over the data axis.

The reference trains DDP-only: every GPU holds a full replica of the
UNet + towers + AdamW moments (reference train.py:492-496 via Accelerate).
On 16 GB v5e chips that replica is the binding constraint — bs=2 live
encoders already OOMs one chip (PERF.md). TPU-native fix: shard every
large tensor (trainable params, AdamW mu/nu, frozen towers) over the
``data`` mesh axis and let GSPMD insert the all-gathers where a weight is
consumed and the reduce-scatters on the gradients. Combined with
``jax.checkpoint`` remat in the train step, weights are re-gathered during
the backward recompute — exactly ZeRO-3 semantics, with zero model-code
changes and the collectives riding ICI.

Sharding choice is purely shape-based (the largest dim divisible by the
axis size), so a param and its AdamW moments always pick the same layout,
and the rules compose with the TP specs (tp_rules.py): FSDP takes the
largest *free* dim of the base spec.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagharmony_tpu.parallel.mesh import DATA_AXIS

# Leaves smaller than this stay replicated: sharding a 32-float norm scale
# buys nothing and costs a gather. 2^13 elements = 16 KiB bf16.
MIN_SHARD_ELEMS = 2**13


def fsdp_spec(leaf, n_shards: int, *, base: P = P(), min_elems: int = MIN_SHARD_ELEMS) -> P:
    """Extend ``base`` (e.g. a TP spec, or P() for pure FSDP) by placing the
    data axis on the largest still-unsharded dim divisible by ``n_shards``.
    Returns ``base`` unchanged for small/indivisible leaves."""
    shape = getattr(leaf, "shape", None)
    if not shape or n_shards <= 1:
        return base
    size = 1
    for d in shape:
        size *= d
    if size < min_elems:
        return base
    taken = tuple(base) + (None,) * (len(shape) - len(tuple(base)))
    best = -1
    for i, d in enumerate(shape):
        if taken[i] is not None:
            continue
        if d % n_shards == 0 and (best < 0 or d > shape[best]):
            best = i
    if best < 0:
        return base
    spec = list(taken)
    spec[best] = DATA_AXIS
    return P(*spec)


def tree_shardings(mesh: Mesh, tree, *, min_elems: int = MIN_SHARD_ELEMS):
    """NamedSharding pytree for ``tree`` (params, optax state, anything):
    shape-based, so it works on optax NamedTuples where path rules can't."""
    n = mesh.shape[DATA_AXIS]

    def one(x):
        if x is None:
            return None
        return NamedSharding(mesh, fsdp_spec(x, n, min_elems=min_elems))

    return jax.tree.map(one, tree)


def shard_tree(mesh: Mesh, tree, *, min_elems: int = MIN_SHARD_ELEMS):
    """Place ``tree`` on ``mesh`` with FSDP shardings."""
    sh = tree_shardings(mesh, tree, min_elems=min_elems)
    return jax.tree.map(
        lambda x, s: None if x is None else jax.device_put(x, s), tree, sh
    )


def shard_params_tp_fsdp(mesh: Mesh, params, *, min_elems: int = MIN_SHARD_ELEMS):
    """Compose TP (path-based, model axis) with ZeRO-3 (shape-based, data
    axis): every param keeps its TP spec and additionally shards its largest
    free dim over ``data``. This is the full production layout the dryrun
    validates — DP batch × TP matmuls × FSDP storage."""
    from imagharmony_tpu.parallel import tp_rules
    from imagharmony_tpu.utils import tree as tree_util

    n = mesh.shape[DATA_AXIS]

    def place(path, x):
        if x is None:
            return None
        spec = fsdp_spec(x, n, base=tp_rules.tp_spec(path, x), min_elems=min_elems)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return tree_util.map_leaves_with_path(params, place)


def replicated_like(mesh: Mesh, tree):
    """All-replicated sharding pytree (for jit out_shardings of metrics)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: None if x is None else rep, tree)
