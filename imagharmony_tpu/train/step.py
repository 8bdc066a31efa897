"""Jitted adapter-training step (the reference's train.py hot loop, §3.2).

One pure function computes: VAE encode → forward diffusion → frozen
encoders → HA fuse → image proj → UNet eps prediction → MSE — then AdamW on
exactly the trainable subtree. Under a ``data``-axis mesh, jit inserts the
gradient all-reduce automatically (replicated params × sharded batch); no
DDP wrapper, no explicit collective calls (vs reference train.py:616,694).

Gradient flow is cut at the frozen-encoder boundary with stop_gradient, so
the backward pass touches the UNet (whose activations carry adapter grads)
but never the CLIP/VAE towers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from imagharmony_tpu import dtypes
from imagharmony_tpu.adapters import harmony
from imagharmony_tpu.models import clip_text, clip_vision, unet, vae
from imagharmony_tpu.pipelines import components as comp
from imagharmony_tpu.schedulers import diffusion as sched
from imagharmony_tpu.utils import tree as tree_util


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults mirror the shipped run (reference run.sh:8-20)."""

    learning_rate: float = 2.5e-4
    weight_decay: float = 1e-2
    noise_offset: Optional[float] = None
    num_train_timesteps: int = 1000
    # loss target parametrization: "epsilon" (reference train.py:688) |
    # "v_prediction" (SD2.x-style; target = sched.velocity_target) |
    # "sample" (target = the clean latents)
    prediction_type: str = "epsilon"
    # zero terminal SNR beta rescale for v-prediction training
    # (arXiv 2305.08891 §3.1)
    rescale_zero_snr: bool = False
    # Min-SNR loss weighting (arXiv 2303.09556): per-sample MSE weighted by
    # min(SNR_t, gamma)/SNR_t (epsilon) or min(SNR_t, gamma)/(SNR_t + 1)
    # (v_prediction) — down-weights the low-noise steps that dominate the
    # unweighted loss. None (default) = uniform, the reference's objective.
    snr_gamma: Optional[float] = None
    train_image_proj: bool = False  # reference excludes it (train.py:600)
    max_grad_norm: Optional[float] = None
    gradient_checkpoint: bool = True
    # -- beyond the reference (its loop is constant-lr, no accum, no EMA:
    #    train.py:600-601, 620-710) --
    # microbatches per optimizer step: grads accumulate in a lax.scan so
    # activation memory stays that of ONE microbatch while the effective
    # batch is grad_accum x the microbatch
    grad_accum: int = 1
    # exponential moving average of the trainable subtree (standard for
    # diffusion fine-tunes); None disables
    ema_decay: Optional[float] = None
    lr_warmup_steps: int = 0
    lr_schedule: str = "constant"  # constant | cosine
    lr_total_steps: int = 0  # cosine horizon (e.g. max_steps)
    # LoRA factors on the frozen UNet attention projections, trained
    # alongside the adapters (adapters/lora.py; the reference never adapts
    # the base UNet). None disables.
    lora_rank: Optional[int] = None
    lora_alpha: Optional[float] = None
    lora_targets: str = "to_q,to_k,to_v,to_out"
    # UNet config used to mask AdamW weight decay off the *inert* IP
    # projections (skip layers never run their decoupled branch, so their
    # grads are exactly zero; torch AdamW skips None-grad params — without
    # the mask, pure decay would drift those seeded weights toward zero in
    # exported checkpoints). None → decay everything (legacy behavior).
    unet_cfg: Optional[object] = None

    def predicate(self) -> Callable:
        return (
            tree_util.adapter_plus_proj_predicate
            if self.train_image_proj
            else tree_util.adapter_predicate
        )

    def lora_config(self):
        if not self.lora_rank:
            return None
        from imagharmony_tpu.adapters import lora as lora_lib

        return lora_lib.LoRAConfig(
            rank=self.lora_rank,
            alpha=self.lora_alpha,
            targets=tuple(self.lora_targets.split(",")),
        )


def decay_mask(trainable, unet_cfg):
    """True where AdamW weight decay applies: everywhere except the inert
    to_k_ip/to_v_ip projections of UNet layers whose IP branch is skipped
    (reference skip=True layers, attention_processor.py:430)."""

    def leaf(path, x):
        if x is None:
            return None
        if path and path[0] == "unet" and ("to_k_ip" in path or "to_v_ip" in path):
            return unet_cfg.is_ip_active(".".join(path))
        return True

    return tree_util.map_leaves_with_path(trainable, leaf)


def learning_rate(cfg: TrainConfig):
    """Scalar lr, or an optax schedule when warmup/cosine is configured."""
    if cfg.lr_schedule == "cosine":
        total = max(cfg.lr_total_steps, cfg.lr_warmup_steps + 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.lr_warmup_steps, decay_steps=total,
        )
    if cfg.lr_schedule != "constant":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.lr_warmup_steps:
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps),
                optax.constant_schedule(cfg.learning_rate),
            ],
            [cfg.lr_warmup_steps],
        )
    return cfg.learning_rate


def make_optimizer(cfg: TrainConfig):
    mask = (
        None
        if cfg.unet_cfg is None
        else (lambda params: decay_mask(params, cfg.unet_cfg))
    )
    tx = optax.adamw(learning_rate(cfg), weight_decay=cfg.weight_decay, mask=mask)
    if cfg.max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx


def init_state(params, cfg: TrainConfig, *, seed=0):
    """Split params into (trainable, frozen) and build optimizer state.
    With ``lora_rank`` set, LoRA factors for the frozen UNet join the
    trainable tree under the extra top-level key ``"lora"`` (``seed``
    drives their host-side init)."""
    trainable, frozen = tree_util.split_by_path(params, cfg.predicate())
    lcfg = cfg.lora_config()
    if lcfg is not None:
        from imagharmony_tpu.adapters import lora as lora_lib

        trainable["lora"] = lora_lib.init_lora(seed, frozen["unet"], lcfg)
    opt_state = make_optimizer(cfg).init(trainable)
    state = {"trainable": trainable, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}
    if cfg.ema_decay:
        state["ema"] = jax.tree.map(jnp.asarray, trainable)
    return state, frozen


def loss_fn(
    trainable,
    frozen,
    cfgs: comp.ComponentConfigs,
    tcfg: TrainConfig,
    batch,
    rng,
    *,
    policy: dtypes.Policy = dtypes.DEFAULT,
    backend=None,
):
    # LoRA factors ride the trainable tree under "lora" (not a params-tree
    # position): fold their deltas into the UNet weights functionally —
    # grads route through the delta-add to A/B only.
    lora_tree = trainable.get("lora") if isinstance(trainable, dict) else None
    if lora_tree is not None:
        trainable = {k: v for k, v in trainable.items() if k != "lora"}
    params = tree_util.merge(trainable, frozen)
    if lora_tree is not None:
        from imagharmony_tpu.adapters import lora as lora_lib

        params["unet"] = lora_lib.apply_lora(
            params["unet"], lora_tree, tcfg.lora_config()
        )
    sg = jax.lax.stop_gradient
    r_noise, r_t, r_lat, r_off = jax.random.split(rng, 4)
    acp = sched.alphas_cumprod(sched.NoiseScheduleConfig(
        prediction_type=tcfg.prediction_type,
        rescale_betas_zero_snr=tcfg.rescale_zero_snr,
    ))

    cached = "context" in batch  # precomputed-encoder batches (train/cache.py)
    if cached and cfgs.proj_kind != "image_proj":
        raise ValueError("cached-encoder training supports proj_kind='image_proj' only")

    if cached:
        # sample the VAE posterior from cached moments (same distribution
        # as live encode; the frozen towers need not be resident at all)
        mean = batch["latent_mean"]
        std = jnp.exp(0.5 * batch["latent_logvar"])
        latents = mean + std * jax.random.normal(r_lat, mean.shape, mean.dtype)
        latents = (latents * cfgs.vae.scaling_factor).astype(policy.compute_dtype)
    else:
        # --- frozen VAE encode (fp32 for stability, reference train.py:628) ---
        latents = sg(
            vae.encode(
                params["vae"], cfgs.vae, batch["images"], r_lat, policy=dtypes.FP32
            )
        ).astype(policy.compute_dtype)
    b = latents.shape[0]

    # --- forward diffusion ---
    noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    if tcfg.noise_offset:
        # channel-wise offset trick (reference train.py:634-636)
        noise = noise + tcfg.noise_offset * jax.random.normal(
            r_off, (b, 1, 1, latents.shape[-1]), jnp.float32
        )
    noise = noise.astype(latents.dtype)
    timesteps = jax.random.randint(r_t, (b,), 0, tcfg.num_train_timesteps)
    noisy = sched.add_noise(acp, latents, noise, timesteps)

    # --- frozen encoders (or their cached outputs) ---
    if cached:
        context = policy.cast(batch["context"])
        pooled = policy.cast(batch["pooled"])
        extra_ctx = policy.cast(batch["extra_context"])
        image_embeds = policy.cast(batch["image_embeds"])
        vision_out = {"projected": image_embeds}
    else:
        context, pooled = clip_text.encode_for_sdxl(
            params["text_encoder"], cfgs.text_l,
            params["text_encoder_2"], cfgs.text_g,
            batch["ids_l"], batch["ids_g"], policy=policy,
        )
        context, pooled = sg(context), sg(pooled)
        extra_ctx, _ = clip_text.encode_for_sdxl(
            params["text_encoder"], cfgs.text_l,
            params["text_encoder_2"], cfgs.text_g,
            batch["extra_l"], batch["extra_g"], policy=policy,
        )
        extra_ctx = sg(extra_ctx)

        vision_out = clip_vision.apply(
            params["image_encoder"], cfgs.vision, batch["clip_pixels"], policy=policy
        )
        image_embeds = sg(vision_out["projected"])
    # per-sample CFG dropout of the image condition (reference train.py:651-657)
    keep = (1.0 - batch["drop_image"]).astype(image_embeds.dtype)[:, None]
    image_embeds = image_embeds * keep

    # --- trainable surface: HA fuse + proj + decoupled attention ---
    fused = harmony.fuse_image_embeds(
        params["harmony"], cfgs.harmony, extra_ctx, image_embeds, policy=policy
    )
    ip_tokens = comp.project_image_embeds(
        params, cfgs, {**{k: sg(v) for k, v in vision_out.items()}, "projected": fused},
        policy=policy,
    )

    time_ids = jnp.concatenate(
        [batch["original_size"], batch["crop_coords"], batch["target_size"]], axis=-1
    ).astype(jnp.float32)

    def _unet_fwd(p, noisy_, t_, ctx_, pooled_, tids_, ip_):
        return unet.apply(
            p, cfgs.unet, noisy_, t_, ctx_,
            pooled_text_embeds=pooled_, time_ids=tids_,
            ip_tokens=ip_, ip_scale=1.0, policy=policy, backend=backend,
        )

    if tcfg.gradient_checkpoint:
        # rematerialize UNet activations: the frozen 2.6B base contributes
        # no param grads, only activation grads for the adapters — trading
        # its activation memory for recompute is nearly free on the MXU
        _unet_fwd = jax.checkpoint(
            _unet_fwd, policy=jax.checkpoint_policies.nothing_saveable
        )
    pred = _unet_fwd(
        params["unet"], noisy, timesteps, context, pooled, time_ids, ip_tokens
    )
    if tcfg.prediction_type == "v_prediction":
        target = sched.velocity_target(acp, latents, noise, timesteps)
    elif tcfg.prediction_type == "sample":
        target = latents
    else:
        target = noise
    sq = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if tcfg.snr_gamma is None:
        return jnp.mean(sq)
    # Min-SNR weighting (arXiv 2303.09556; diffusers compute_snr): SNR_t =
    # acp/(1-acp). The epsilon weight min(SNR,γ)/SNR is computed as
    # min(1, γ/SNR) — finite at SNR → 0 (zero-SNR rescale) and → γ/SNR at
    # the near-clean steps it exists to down-weight.
    acp_t = jnp.take(jnp.asarray(acp, jnp.float32), timesteps)
    snr = acp_t / (1.0 - acp_t)
    if tcfg.prediction_type == "v_prediction":
        w = jnp.minimum(snr, tcfg.snr_gamma) / (snr + 1.0)
    else:
        w = jnp.minimum(1.0, tcfg.snr_gamma / jnp.maximum(snr, 1e-20))
    per = jnp.mean(sq.reshape(sq.shape[0], -1), axis=1)
    return jnp.mean(w * per)


def make_train_step(cfgs: comp.ComponentConfigs, tcfg: TrainConfig, *,
                    policy: dtypes.Policy = dtypes.DEFAULT, backend=None):
    tx = make_optimizer(tcfg)

    def train_step(state, frozen, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn)
        a = tcfg.grad_accum
        if a > 1:
            # scan over microbatches: activations (the memory cost — the
            # frozen UNet fwd+bwd) exist for ONE microbatch at a time;
            # only the small adapter-grad accumulator persists across the
            # scan. Rows stay sharded over `data` within each microbatch.
            micro = jax.tree.map(
                lambda x: jnp.reshape(x, (a, x.shape[0] // a) + x.shape[1:]),
                batch,
            )
            rngs = jax.random.split(rng, a)

            def body(carry, xs):
                loss_sum, gsum = carry
                mb, r = xs
                loss, g = grad_fn(
                    state["trainable"], frozen, cfgs, tcfg, mb, r,
                    policy=policy, backend=backend,
                )
                return (loss_sum + loss, jax.tree.map(jnp.add, gsum, g)), None

            zeros = jax.tree.map(jnp.zeros_like, state["trainable"])
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros((), jnp.float32), zeros), (micro, rngs)
            )
            loss = loss / a
            grads = jax.tree.map(lambda x: x / a, grads)
        else:
            loss, grads = grad_fn(
                state["trainable"], frozen, cfgs, tcfg, batch, rng,
                policy=policy, backend=backend,
            )
        updates, opt_state = tx.update(grads, state["opt_state"], state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = {
            "trainable": trainable,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if tcfg.ema_decay:
            d = tcfg.ema_decay
            new_state["ema"] = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state["ema"], trainable,
            )
        return new_state, metrics

    return train_step


def dummy_batch(cfgs: comp.ComponentConfigs, batch_size=2, resolution=32, rng=None):
    """Synthetic batch with the real schema (tests / dryruns)."""
    import numpy as np

    r = np.random.default_rng(0 if rng is None else rng)
    seq = cfgs.text_l.max_position_embeddings
    return {
        "images": r.normal(size=(batch_size, resolution, resolution, 3)).astype(np.float32) * 0.5,
        "clip_pixels": r.normal(
            size=(batch_size, cfgs.vision.image_size, cfgs.vision.image_size, 3)
        ).astype(np.float32),
        "ids_l": r.integers(0, cfgs.text_l.vocab_size, (batch_size, seq)).astype(np.int32),
        "ids_g": r.integers(0, cfgs.text_g.vocab_size, (batch_size, seq)).astype(np.int32),
        "extra_l": r.integers(0, cfgs.text_l.vocab_size, (batch_size, seq)).astype(np.int32),
        "extra_g": r.integers(0, cfgs.text_g.vocab_size, (batch_size, seq)).astype(np.int32),
        "drop_image": np.zeros((batch_size,), np.float32),
        "original_size": np.full((batch_size, 2), resolution, np.float32),
        "crop_coords": np.zeros((batch_size, 2), np.float32),
        "target_size": np.full((batch_size, 2), resolution, np.float32),
    }
