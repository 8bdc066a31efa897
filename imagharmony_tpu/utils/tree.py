"""Param-pytree partition/merge helpers.

The frozen/trainable split replaces the reference's requires_grad_ calls +
optimizer param selection (reference train.py:514-519, 600-601): here the
trainable subtree is an explicit pytree, so jax.grad differentiates exactly
the adapter surface and nothing else — no autograd bookkeeping on the
frozen 2.6B-param base.
"""

from __future__ import annotations

from typing import Callable, Tuple


def split_by_path(tree, predicate: Callable[[Tuple[str, ...]], bool]):
    """Split a nested dict/list tree into (selected, rest).

    Structure is preserved in both outputs; non-selected positions hold None
    (and vice versa), so ``merge`` can zip them back losslessly.
    """

    def go(node, path):
        if isinstance(node, dict):
            sel, rest = {}, {}
            for k, v in node.items():
                s, r = go(v, path + (str(k),))
                sel[k], rest[k] = s, r
            return sel, rest
        if isinstance(node, (list, tuple)):
            sel, rest = [], []
            for i, v in enumerate(node):
                s, r = go(v, path + (str(i),))
                sel.append(s)
                rest.append(r)
            return sel, rest
        if predicate(path):
            return node, None
        return None, node

    return go(tree, ())


def merge(a, b):
    """Inverse of split_by_path: overlay two same-structure trees where
    exactly one side is non-None at each leaf. A pruned subtree (whole
    branch None on one side) merges to the other side — used to drop
    frozen encoder params entirely in cached-encoder training."""
    if b is None and not isinstance(a, (dict, list, tuple)):
        return a
    if a is None and not isinstance(b, (dict, list, tuple)):
        return b
    if isinstance(a, dict) or isinstance(b, dict):
        if not isinstance(a, dict):
            return b
        if not isinstance(b, dict):
            return a if b is None else b
        return {k: merge(a[k], b[k]) for k in a}
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        if not isinstance(a, (list, tuple)):
            return b
        if not isinstance(b, (list, tuple)):
            return a if b is None else b
        return [merge(x, y) for x, y in zip(a, b)]
    return a if a is not None else b


def map_leaves_with_path(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: map_leaves_with_path(v, fn, path + (str(k),)) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [map_leaves_with_path(v, fn, path + (str(i),)) for i, v in enumerate(tree)]
    return fn(path, tree)


def count_params(tree) -> int:
    import jax

    return sum(x.size for x in jax.tree.leaves(tree))


# ---------------------------------------------------------------------------
# Trainable-surface predicates
# ---------------------------------------------------------------------------


def adapter_predicate(path) -> bool:
    """The reference's optimizer surface (train.py:600-601):
    every decoupled-attention projection (to_k_ip/to_v_ip live on all
    cross-attn layers, trained even where skip=True) + the HA module."""
    return ("to_k_ip" in path) or ("to_v_ip" in path) or (path and path[0] == "harmony")


def adapter_plus_proj_predicate(path) -> bool:
    """adapter surface + the image projection head (the reference saves it in
    checkpoints but — deliberately or not — never optimizes it,
    train.py:600; training it is the natural extension)."""
    return adapter_predicate(path) or (path and path[0] == "image_proj")
