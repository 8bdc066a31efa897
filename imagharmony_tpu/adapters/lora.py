"""Low-rank adaptation (LoRA) of the frozen UNet attention projections.

Beyond the reference: its training surface is exactly the decoupled IP
projections + the HA module (reference train.py:600-601) — the frozen UNet
itself is never adapted. LoRA (arXiv 2106.09685) is the ecosystem-standard
way to widen that surface cheaply: each targeted linear W gets trainable
factors A (in, r) and B (r, out) with effective weight
``W + (alpha/r) * A @ B``; B initialises to zero so step 0 is exactly the
base model.

TPU-native shape: no module patching — the factors live in their own
pytree mirroring the UNet tree (the targeted ``weight`` leaf position holds
``{"lora_a", "lora_b"}``), and ``apply_lora`` folds the deltas into the
UNet params *functionally* before the forward pass. Under ``jax.grad`` the
delta-add routes cotangents to A/B only; at inference ``apply_lora`` on the
host merges once and the runtime cost is exactly zero — no per-call extra
matmuls, nothing for XLA to re-fuse.

Composes with everything generic-over-pytrees: grad accumulation, EMA,
FSDP sharding (shape-based), orbax resume.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from imagharmony_tpu.nn import prng

# Attention container keys whose projections LoRA may target
_ATTN_KEYS = ("attn1", "attn2")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 8
    # scaling numerator; None -> rank (so alpha/r == 1, the common default)
    alpha: float | None = None
    # which projections get factors ("to_out" covers the output projection)
    targets: Tuple[str, ...] = ("to_q", "to_k", "to_v", "to_out")
    # restrict to self ("attn1") / cross ("attn2") attention; both by default
    attn: Tuple[str, ...] = _ATTN_KEYS

    @property
    def scale(self) -> float:
        a = self.rank if self.alpha is None else self.alpha
        return a / self.rank


def _is_target(path, cfg: LoRAConfig) -> bool:
    """``path`` addresses a ``weight`` leaf inside the UNet param tree."""
    return (
        len(path) >= 3
        and path[-1] == "weight"
        and path[-2] in cfg.targets
        and path[-3] in cfg.attn
    )


def init_lora(seed, unet_params, cfg: LoRAConfig):
    """Factor pytree mirroring ``unet_params``: targeted weight positions
    hold ``{"lora_a": N(0, 1/r), "lora_b": 0}``; everything else prunes to
    None. Host-numpy init (nn/prng.py) — zero XLA compiles."""
    key = prng.ensure(seed)

    def go(node, path, k):
        if isinstance(node, dict):
            ks = k.split(len(node))
            out = {
                name: go(v, path + (name,), ks[i])
                for i, (name, v) in enumerate(node.items())
            }
            return None if all(v is None for v in out.values()) else out
        if isinstance(node, (list, tuple)):
            ks = k.split(len(node))
            out = [go(v, path + (str(i),), ks[i]) for i, v in enumerate(node)]
            return None if all(v is None for v in out) else out
        if node is None or not _is_target(path, cfg):
            return None
        d_in, d_out = node.shape
        return {
            "lora_a": k.normal((d_in, cfg.rank), np.float32,
                               stddev=1.0 / cfg.rank),
            "lora_b": np.zeros((cfg.rank, d_out), np.float32),
        }

    return go(unet_params, (), key)


def apply_lora(unet_params, lora_tree, cfg: LoRAConfig, *, scale: float = 1.0):
    """UNet params with ``W + scale * (alpha/r) * A @ B`` folded in at every
    factored position. Differentiable in the factors (training folds it
    inside ``loss_fn``); on host arrays it is the one-time inference merge."""
    import jax.numpy as jnp

    s = cfg.scale * scale

    def go(node, lora):
        if lora is None:
            return node
        if isinstance(lora, dict) and "lora_a" in lora:
            delta = jnp.dot(
                jnp.asarray(lora["lora_a"], jnp.float32),
                jnp.asarray(lora["lora_b"], jnp.float32),
            ) * s
            return (jnp.asarray(node, jnp.float32) + delta).astype(node.dtype)
        if isinstance(node, dict):
            return {k: go(v, lora.get(k) if isinstance(lora, dict) else None)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [
                go(v, lora[i] if lora is not None and i < len(lora) else None)
                for i, v in enumerate(node)
            ]
        return node

    return go(unet_params, lora_tree)


# ---------------------------------------------------------------------------
# Flat (dotted-key) interchange for safetensors export/import
# ---------------------------------------------------------------------------


def flatten(lora_tree) -> dict:
    flat = {}

    def go(node, path):
        if node is None:
            return
        if isinstance(node, dict):
            if "lora_a" in node:
                flat[".".join(path) + ".lora_a"] = np.asarray(node["lora_a"])
                flat[".".join(path) + ".lora_b"] = np.asarray(node["lora_b"])
                return
            for k, v in node.items():
                go(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                go(v, path + (str(i),))

    go(lora_tree, ())
    return flat


def unflatten(flat: dict):
    """Rebuild the nested factor tree from dotted keys. List-index segments
    (the ``transformer_blocks.N`` levels) become lists."""
    root = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            # sparse indices are real (e.g. down_blocks.0 has no attention):
            # keep list positions aligned with the param tree, None gaps
            n = max(int(k) for k in node) + 1
            return [
                listify(node[str(i)]) if str(i) in node else None
                for i in range(n)
            ]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_lora(path, lora_tree, cfg: LoRAConfig):
    from imagharmony_tpu.io import safetensors_io

    meta = {
        "format": "imagharmony-lora",
        "rank": str(cfg.rank),
        "alpha": str(cfg.rank if cfg.alpha is None else cfg.alpha),
        "targets": ",".join(cfg.targets),
        "attn": ",".join(cfg.attn),
    }
    safetensors_io.save(path, flatten(lora_tree), metadata=meta)


def load_lora(path):
    """-> (lora_tree, LoRAConfig) from a save_lora file, OR from a
    community-format UNet LoRA (kohya ``lora_unet_*`` / diffusers-peft
    ``unet.*.lora_A``) — the ecosystem files trained by sd-scripts and
    shared on model hubs. Detected by key shape; see
    ``load_community_lora`` for coverage and skipping rules."""
    from imagharmony_tpu.io import safetensors_io

    tensors, meta = safetensors_io.load(path)
    if meta.get("format") != "imagharmony-lora" and _looks_community(tensors):
        return load_community_lora(tensors)
    cfg = LoRAConfig(
        rank=int(meta.get("rank", 8)),
        alpha=float(meta["alpha"]) if "alpha" in meta else None,
        targets=tuple((meta.get("targets") or "to_q,to_k,to_v,to_out").split(",")),
        attn=tuple((meta.get("attn") or ",".join(_ATTN_KEYS)).split(",")),
    )
    return unflatten(tensors), cfg


# ---------------------------------------------------------------------------
# Community-format ingestion (kohya sd-scripts / diffusers-peft UNet LoRAs)
# ---------------------------------------------------------------------------

import re as _re

_KOHYA_BLOCK = _re.compile(
    r"^(down_blocks|up_blocks)_(\d+)_attentions_(\d+)_transformer_blocks_"
    r"(\d+)_(attn[12])_(to_q|to_k|to_v|to_out_0)$"
)
_KOHYA_MID = _re.compile(
    r"^mid_block_attentions_(\d+)_transformer_blocks_(\d+)_(attn[12])_"
    r"(to_q|to_k|to_v|to_out_0)$"
)
_PEFT_PATH = _re.compile(
    r"^(?:down_blocks|up_blocks)\.\d+\.attentions\.\d+\.transformer_blocks\."
    r"\d+\.attn[12]\.(?:to_q|to_k|to_v|to_out)$"
)
_PEFT_MID = _re.compile(
    r"^mid_block\.attentions\.\d+\.transformer_blocks\.\d+\.attn[12]\."
    r"(?:to_q|to_k|to_v|to_out)$"
)


def _looks_community(tensors) -> bool:
    return any(
        k.startswith(("lora_unet_", "lora_te", "unet.", "text_encoder"))
        for k in tensors
    )


def _community_module_path(name):
    """Community module name -> our dotted weight path, or None if the
    module is outside the attention-projection surface we adapt."""
    if name.startswith("lora_unet_"):
        body = name[len("lora_unet_"):]
        m = _KOHYA_BLOCK.match(body)
        if m:
            bk, bi, ai, ti, attn, proj = m.groups()
            proj = "to_out" if proj == "to_out_0" else proj
            return (f"{bk}.{bi}.attentions.{ai}.transformer_blocks.{ti}."
                    f"{attn}.{proj}.weight")
        m = _KOHYA_MID.match(body)
        if m:
            ai, ti, attn, proj = m.groups()
            proj = "to_out" if proj == "to_out_0" else proj
            return (f"mid_block.attentions.{ai}.transformer_blocks.{ti}."
                    f"{attn}.{proj}.weight")
        return None
    if name.startswith("unet."):
        body = name[len("unet."):].replace(".to_out.0", ".to_out")
        if _PEFT_PATH.match(body) or _PEFT_MID.match(body):
            return body + ".weight"
    return None


def load_community_lora(tensors):
    """Kohya (``lora_unet_*.lora_down/lora_up.weight`` + per-module
    ``.alpha``) or diffusers-peft (``unet.*.lora_A/lora_B.weight``) UNet
    LoRA -> (our factor tree, LoRAConfig).

    Per-module alpha/rank are folded into lora_b (the returned config's
    scale is exactly 1), so heterogeneous-rank files load correctly.
    Modules outside the UNet attention projections — text-encoder parts
    (``lora_te*``), feed-forward/conv LoRA — are SKIPPED with a loud
    warning: merging a partial adapter changes outputs vs a stack that
    applies all of it. Raises if nothing at all maps."""
    mods: dict = {}
    skipped = set()
    for k, v in tensors.items():
        for suf, slot in (
            (".lora_down.weight", "down"), (".lora_up.weight", "up"),
            (".alpha", "alpha"),
            (".lora_A.weight", "down"), (".lora_B.weight", "up"),
        ):
            if k.endswith(suf):
                mods.setdefault(k[: -len(suf)], {})[slot] = v
                break
        else:
            skipped.add(k)

    flat = {}
    for name, parts in sorted(mods.items()):
        path = _community_module_path(name)
        if path is None or "down" not in parts or "up" not in parts:
            skipped.add(name)
            continue
        down = np.asarray(parts["down"], np.float32)  # (r, in)
        up = np.asarray(parts["up"], np.float32)      # (out, r)
        r = down.shape[0]
        alpha = float(np.asarray(parts.get("alpha", r)).reshape(())[()])
        # torch W' = W + (alpha/r) * up @ down; ours is (in, out):
        # delta = down.T @ (up.T * alpha/r)
        flat[path + ".lora_a"] = down.T
        flat[path + ".lora_b"] = up.T * (alpha / r)
    if not flat:
        raise ValueError(
            "no UNet attention-projection LoRA modules found "
            f"(first skipped: {sorted(skipped)[:5]})"
        )
    if skipped:
        import logging

        logging.getLogger("imagharmony.lora").warning(
            "community LoRA: %d module(s)/key(s) outside the UNet "
            "attention-projection surface were SKIPPED (e.g. %s) — outputs "
            "will differ from stacks that apply the full adapter",
            len(skipped), sorted(skipped)[:3],
        )
    # per-module scaling already folded into lora_b -> scale must be 1
    return unflatten(flat), LoRAConfig(rank=1, alpha=1.0)


def num_params(lora_tree) -> int:
    return sum(v.size for v in flatten(lora_tree).values())


def parse_spec(spec: str, default_scale: float = 1.0):
    """Parse a CLI LoRA spec ``PATH[:SCALE]`` -> (path, scale).

    A real file whose name happens to contain a colon wins over the
    suffix interpretation. Used by the repeatable ``--lora`` flag to
    compose multiple adapters, each at its own strength (the merges are
    additive: W + Σ scale_i·ΔW_i, order-independent)."""
    import os

    if os.path.exists(spec) or ":" not in spec:
        return spec, default_scale
    path, suffix = spec.rsplit(":", 1)
    try:
        return path, float(suffix)
    except ValueError:
        return spec, default_scale
