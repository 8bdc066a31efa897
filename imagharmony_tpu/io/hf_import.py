"""Generic HuggingFace-checkpoint → param-pytree importer (torch-free).

Every model in this framework names its param tree after the HF checkpoint
tree it ingests, so importing a torch checkpoint is one mechanical walk:

    template = jax.eval_shape(lambda: unet.init(key, cfg))     # shapes only
    params   = import_tree(template, flat_state_dict)

with three transform rules:
  * linear ``weight`` (2-D): torch stores (out, in) → transpose to (in, out);
  * conv ``weight`` (4-D): torch OIHW → HWIO;
  * embedding tables and other named exceptions: copied as-is.

The flat dict values are numpy arrays (produced by io/safetensors.py or
io/torch_pickle.py — no torch dependency anywhere). This replaces the
reference's torch.load + load_state_dict path (reference
convert_bin.py:14, ip_adapter/ip_adapter.py:135-154) with a single
validated mapping that also *fails loudly* on missing/mis-shaped keys.
"""

from __future__ import annotations

import numpy as np

# Tree-path segments that are embedding-like: 2-D "weight" under these is a
# table, not a linear map — no transpose.
_EMBEDDING_PARENTS = {
    "token_embedding",
    "position_embedding",
    "modality_embed",
    "shared_embedding",
    "pos_emb",  # Resampler positional table (reference resampler.py:97)
}

# Our-tree segment → HF key segment rewrites.
_SEGMENT_REWRITES = {
    "encoder_layers": "encoder.layers",
    "net_0_proj": "net.0.proj",
    "net_2": "net.2",
}

# Modules whose ``to_out`` is an nn.ModuleList [Linear, Dropout] in the HF
# tree (diffusers Attention): our "to_out" maps to "to_out.0".
_TO_OUT_LIST = "to_out"


def flatten_tree(tree, prefix=()):
    """Yield (path_tuple, leaf) for a nested dict/list pytree.

    None leaves are structural placeholders (absent downsamplers, pruned
    frozen branches) and are skipped — they carry no parameters."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten_tree(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from flatten_tree(v, prefix + (str(i),))
    elif tree is not None:
        yield prefix, tree


def unflatten_tree(template, flat_by_path):
    if isinstance(template, dict):
        return {k: unflatten_tree(v, {p[1:]: a for p, a in flat_by_path.items() if p[0] == k})
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return [
            unflatten_tree(v, {p[1:]: a for p, a in flat_by_path.items() if p[0] == str(i)})
            for i, v in enumerate(template)
        ]
    if template is None:
        return None  # structural placeholder (absent submodule)
    return flat_by_path[()]


def path_to_hf_key(path, prefix=""):
    segs = []
    for s in path:
        segs.append(_SEGMENT_REWRITES.get(s, s))
    # diffusers Attention.to_out is a ModuleList: weight lives at to_out.0
    for i, s in enumerate(segs[:-1]):
        if s == _TO_OUT_LIST and segs[i + 1] in ("weight", "bias"):
            segs[i] = "to_out.0"
    return prefix + ".".join(segs)


def _is_embedding_path(path):
    return len(path) >= 2 and path[-2] in _EMBEDDING_PARENTS


def convert_array(path, ours_shape, arr):
    """Apply torch→ours layout transforms and validate the shape."""
    a = np.asarray(arr)
    if a.ndim == 2 and path[-1] == "weight" and not _is_embedding_path(path):
        a = a.T
    elif a.ndim == 4 and path[-1] == "weight":
        a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if tuple(a.shape) != tuple(ours_shape):
        raise ValueError(
            f"shape mismatch at {'.'.join(path)}: checkpoint {a.shape} vs model {tuple(ours_shape)}"
        )
    return a


def import_tree(template, flat_state_dict, *, prefix="", key_map=None, dtype=None, strict=True):
    """Build a param tree shaped like ``template`` from a flat HF dict.

    template: pytree of arrays or ShapeDtypeStructs (use jax.eval_shape to
              avoid allocating a random init just to throw it away).
    flat_state_dict: {hf_key: numpy array}.
    prefix:  HF key prefix, e.g. "text_model." for CLIP text towers.
    key_map: optional callable(hf_key)->hf_key for nonstandard renames.
    """
    out = {}
    missing = []
    for path, leaf in flatten_tree(template):
        key = path_to_hf_key(path, prefix)
        if key_map is not None:
            key = key_map(key)
        if key not in flat_state_dict:
            missing.append(key)
            continue
        arr = convert_array(path, leaf.shape, flat_state_dict[key])
        if dtype is not None:
            arr = arr.astype(dtype)
        elif hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        out[path] = arr
    if missing and strict:
        raise KeyError(
            f"{len(missing)} keys missing from checkpoint (first 10): {missing[:10]}"
        )
    return unflatten_tree(template, out)


def export_tree(params, *, prefix="", to_torch_layout=True):
    """Inverse of import_tree: our tree → flat {hf_key: numpy} dict.

    Used to write checkpoints the reference ecosystem can read (the 3-dict
    adapter format of reference convert_bin.py:36-43)."""
    flat = {}
    for path, leaf in flatten_tree(params):
        a = np.asarray(leaf)
        if to_torch_layout:
            if a.ndim == 2 and path[-1] == "weight" and not _is_embedding_path(path):
                a = a.T
            elif a.ndim == 4 and path[-1] == "weight":
                a = a.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        flat[path_to_hf_key(path, prefix)] = a
    return flat
