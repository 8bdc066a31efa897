"""Adapter fine-tuning entry point (the reference's train.py main()).

Differences by design (cf. SURVEY.md §5):

* orbax checkpoints with REAL resume — the reference always restarts from
  epoch 0 and can only warm-start weights (reference train.py:620,300-341);
* the HA config is serialized with every checkpoint (no hand-synced
  hyperparameters, reference test.py:9-15);
* data parallel over a jax Mesh: replicated params × data-sharded batches,
  grad all-reduce inserted by GSPMD (no Accelerate/DDP wrapper,
  reference train.py:492-496,616);
* periodic export straight to the 3-dict adapter format, so inference and
  the reference ecosystem can consume checkpoints without a separate
  convert_bin.py pass (which we also provide: `imagharmony convert`).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.adapters import harmony as harmony_lib
from imagharmony_tpu.io import checkpoints as ckpt_io
from imagharmony_tpu.parallel import mesh as mesh_lib
from imagharmony_tpu.train import step as step_lib
from imagharmony_tpu.utils import tree as tree_util


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="HA-module / IP-adapter fine-tuning")
    p.add_argument("--pretrained_model_name_or_path", default=None)
    p.add_argument("--pretrained_ip_adapter_path", default=None)
    p.add_argument("--image_encoder_path", default=None)
    p.add_argument("--data_json_file", default=None)
    p.add_argument("--data_root_path", default="")
    p.add_argument("--output_dir", default="harmony-train")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=2.5e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--noise_offset", type=float, default=None)
    p.add_argument("--prediction_type", default="epsilon",
                   choices=["epsilon", "v_prediction", "sample"],
                   help="loss target parametrization (v_prediction for "
                        "SD2.x-style fine-tunes)")
    p.add_argument("--zero_snr", action="store_true",
                   help="zero terminal SNR beta rescale during the forward "
                        "process (arXiv 2305.08891; for v_prediction)")
    p.add_argument("--snr_gamma", type=float, default=None,
                   help="min-SNR loss weighting (arXiv 2303.09556; "
                        "5.0 is the paper's recommendation)")
    # beyond the reference's constant-lr / no-accum / no-EMA loop
    # (reference train.py:600-601, 620-710)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatches per optimizer step (lax.scan inside "
                        "the jitted step: activation memory stays one "
                        "microbatch; effective batch = batch_size x accum)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="EMA of the trainable adapters (e.g. 0.9999); "
                        "also exports ip_adapter-ema-N.bin")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "cosine"],
                   help="cosine decays to 0 over --max_steps")
    p.add_argument("--lora_rank", type=int, default=None,
                   help="train LoRA factors of this rank on the frozen "
                        "UNet attention projections alongside the adapters "
                        "(exported as lora-N.safetensors)")
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="LoRA scaling numerator (default: rank)")
    p.add_argument("--lora_targets", default="to_q,to_k,to_v,to_out",
                   help="comma list of projections to factor")
    p.add_argument("--save_steps", type=int, default=2000)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true", help="resume from latest orbax step")
    p.add_argument("--mixed_precision", default="bf16", choices=["no", "bf16"])
    # HA hyperparameters (reference run.sh:17-20 naming)
    p.add_argument("--composed_inter_dim", type=int, default=2560)
    p.add_argument("--composed_cross_heads", type=int, default=8)
    p.add_argument("--composed_reshape_blocks", type=int, default=8)
    p.add_argument("--composed_cross_value_dim", type=int, default=64)
    p.add_argument("--fusion_method", default="cross_attention",
                   choices=list(harmony_lib.FUSION_METHODS))
    p.add_argument("--train_image_proj", action="store_true")
    # smoke-path knobs
    p.add_argument("--tiny", action="store_true", help="random tiny bundle (no checkpoints needed)")
    p.add_argument("--full_random", action="store_true",
                   help="full-size random SDXL bundle (loop benchmarking "
                        "without checkpoints; same construction as bench.py)")
    p.add_argument("--cache_encoders", action="store_true",
                   help="precompute VAE/CLIP outputs once and train without "
                        "the frozen towers resident (center-crop only)")
    p.add_argument("--synthetic_data", type=int, default=0,
                   help="use N synthetic batches instead of --data_json_file")
    p.add_argument("--log_every", type=int, default=10,
                   help="fetch metrics from device every N steps (per-step "
                        "float() would block ~25 ms tunnel RTT each step)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params + AdamW moments + frozen "
                        "towers over the data axis (parallel/fsdp.py) "
                        "instead of replicating — per-chip memory drops "
                        "~linearly with the mesh; GSPMD inserts the "
                        "gathers/reduce-scatters over ICI")
    p.add_argument("--fsdp_min_shard", type=int, default=None,
                   help="smallest leaf (elements) FSDP shards; below it "
                        "leaves replicate (default parallel/fsdp.py "
                        "MIN_SHARD_ELEMS)")
    return p.parse_args(argv)


def build_components(args):
    from imagharmony_tpu.models import tokenizer as tok_lib
    from imagharmony_tpu.pipelines import components as comp

    ha_cfg = harmony_lib.HarmonyConfig(
        inter_dim=args.composed_inter_dim,
        cross_heads=args.composed_cross_heads,
        reshape_blocks=args.composed_reshape_blocks,
        cross_value_dim=args.composed_cross_value_dim,
        fusion_method=args.fusion_method,
    )
    if args.tiny:
        toy = tok_lib.build_toy_tokenizer()
        cfgs = comp.tiny_configs(vocab_size=len(toy.encoder))
        params = comp.init_params(args.seed, cfgs)
        toks = tok_lib.SDXLTokenizers(toy, toy)
        return cfgs, params, toks

    if args.full_random:
        # loop-benchmark mode: full-size random weights, identical step math
        # to a checkpoint run — lets trainer-loop samples/s be compared
        # against bench.py --train's bare-step number on real hardware
        import jax.numpy as jnp

        toy = tok_lib.build_toy_tokenizer()
        cfgs = comp.sdxl_configs(harmony_cfg=ha_cfg)
        params = comp.init_params(args.seed, cfgs, dtype=jnp.bfloat16)
        toks = tok_lib.SDXLTokenizers(toy, toy)
        return cfgs, params, toks

    if not args.pretrained_model_name_or_path:
        raise SystemExit("--pretrained_model_name_or_path required (or use --tiny)")
    pipe = ckpt_io.load_pipeline(
        model_dir=args.pretrained_model_name_or_path,
        adapter_ckpt=args.pretrained_ip_adapter_path,
        image_encoder_dir=args.image_encoder_path,
    )
    cfgs = comp.ComponentConfigs(
        unet=pipe.cfgs.unet, vae=pipe.cfgs.vae, text_l=pipe.cfgs.text_l,
        text_g=pipe.cfgs.text_g, vision=pipe.cfgs.vision, harmony=ha_cfg,
        proj_kind=pipe.cfgs.proj_kind, resampler=pipe.cfgs.resampler,
    )
    params = pipe.params
    if args.pretrained_ip_adapter_path is None:
        # fresh HA module for the new config
        params["harmony"] = harmony_lib.init(args.seed, ha_cfg)
        # IP projections initialized from the UNet's own to_k/to_v on the
        # target block (reference train.py:554-561), zeros-free warm start.
        _seed_ip_from_unet(params["unet"], cfgs.unet)
    return cfgs, params, pipe.tokenizers


def _seed_ip_from_unet(unet_params, unet_cfg):
    from imagharmony_tpu.io.hf_import import flatten_tree

    def visit(node):
        if isinstance(node, dict):
            if "to_k_ip" in node and "to_k" in node:
                node["to_k_ip"]["weight"] = np.asarray(node["to_k"]["weight"]).copy()
                node["to_v_ip"]["weight"] = np.asarray(node["to_v"]["weight"]).copy()
            for v in node.values():
                visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    visit(unet_params)


def main(argv=None):
    import orbax.checkpoint as ocp

    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    cfgs, params, tokenizers = build_components(args)
    tcfg = step_lib.TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        noise_offset=args.noise_offset,
        prediction_type=args.prediction_type,
        rescale_zero_snr=args.zero_snr,
        snr_gamma=args.snr_gamma,
        train_image_proj=args.train_image_proj,
        unet_cfg=cfgs.unet,  # masks weight decay off inert IP projections
        grad_accum=args.grad_accum,
        ema_decay=args.ema_decay,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_schedule=args.lr_scheduler,
        lr_total_steps=args.max_steps or 0,
        lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha,
        lora_targets=args.lora_targets,
    )
    if args.lr_scheduler == "cosine" and not args.max_steps:
        raise SystemExit("--lr_scheduler cosine needs --max_steps (the decay horizon)")
    policy = dtypes.FP32 if args.mixed_precision == "no" else dtypes.DEFAULT
    backend = "pallas" if jax.devices()[0].platform in ("tpu", "axon") else None
    state, frozen = step_lib.init_state(params, tcfg, seed=args.seed)

    n_train = tree_util.count_params([x for x in jax.tree.leaves(state["trainable"])])
    print(f"trainable params: {n_train/1e6:.2f}M")

    # -- checkpointing --------------------------------------------------
    ckpt_dir = os.path.abspath(os.path.join(args.output_dir, "orbax"))
    mngr = ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=3)
    )
    start_step = 0
    if args.resume and mngr.latest_step() is not None:
        restored = mngr.restore(
            mngr.latest_step(),
            args=ocp.args.StandardRestore(jax.tree.map(np.asarray, state)),
        )
        state = restored
        start_step = int(state["step"])
        print(f"resumed from step {start_step}")
    with open(os.path.join(args.output_dir, "harmony_config.json"), "w") as f:
        json.dump(cfgs.harmony.to_dict(), f, indent=2)
    metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
    metrics_log = open(metrics_path, "a")

    # each step consumes grad_accum microbatches of train_batch_size rows
    # (the jitted step scans over them; the mesh stays fit to the microbatch)
    step_rows = args.train_batch_size * max(args.grad_accum, 1)

    # -- data ------------------------------------------------------------
    if args.cache_encoders and not args.synthetic_data:
        from imagharmony_tpu.train import cache as cache_lib
        from imagharmony_tpu.train.dataset import HarmonyDataset

        ds = HarmonyDataset(
            args.data_json_file, tokenizers, size=args.resolution,
            clip_image_size=cfgs.vision.image_size,
            image_root_path=args.data_root_path, center_crop=True,
            max_token_length=cfgs.text_l.max_position_embeddings,
        )
        full = tree_util.merge(state["trainable"], frozen)
        print(f"precomputing encoder cache over {len(ds)} records...")
        enc_cache = cache_lib.precompute(full, cfgs, ds, policy=policy)
        # drop the frozen towers: the train step never touches them now
        for tower in ("vae", "text_encoder", "text_encoder_2", "image_encoder"):
            frozen[tower] = None
        batches = cache_lib.batches_from_cache(
            enc_cache, step_rows, seed=args.seed,
            epochs=args.num_train_epochs,
        )
    elif args.synthetic_data:
        def batch_iter():
            for i in range(args.synthetic_data):
                yield step_lib.dummy_batch(
                    cfgs, batch_size=step_rows,
                    resolution=args.resolution, rng=i,
                )
        batches = batch_iter()
    else:
        from imagharmony_tpu.train.dataset import HarmonyDataset

        ds = HarmonyDataset(
            args.data_json_file, tokenizers, size=args.resolution,
            clip_image_size=cfgs.vision.image_size,
            image_root_path=args.data_root_path,
            max_token_length=cfgs.text_l.max_position_embeddings,
        )
        batches = ds.batches(step_rows, seed=args.seed,
                             epochs=args.num_train_epochs)

    # -- mesh + jit -------------------------------------------------------
    mesh = mesh_lib.fit_data_mesh(args.train_batch_size)
    raw_step = step_lib.make_train_step(cfgs, tcfg, policy=policy, backend=backend)
    if args.fsdp:
        # ZeRO-3: explicit out_shardings keep the updated state in the same
        # sharded layout (donation then reuses the sharded buffers in place).
        from jax.sharding import NamedSharding, PartitionSpec

        from imagharmony_tpu.parallel import fsdp as fsdp_lib

        fsdp_kw = (
            {} if args.fsdp_min_shard is None
            else {"min_elems": args.fsdp_min_shard}
        )
        state_sh = fsdp_lib.tree_shardings(mesh, state, **fsdp_kw)
        rep = NamedSharding(mesh, PartitionSpec())
        step_fn = jax.jit(
            raw_step, donate_argnums=(0,),
            out_shardings=(state_sh, {"loss": rep, "grad_norm": rep}),
        )
    else:
        step_fn = jax.jit(
            raw_step,
            donate_argnums=(0,),  # reuse the state buffers (opt states are ~2 GB at SDXL scale)
        )
    with mesh:
        if args.fsdp:
            state = fsdp_lib.shard_tree(mesh, state, **fsdp_kw)
            frozen_r = fsdp_lib.shard_tree(mesh, frozen, **fsdp_kw)
        else:
            state = mesh_lib.replicate(mesh, state)
            frozen_r = mesh_lib.replicate(mesh, frozen)

        rng = jax.random.PRNGKey(args.seed)
        # Resume fidelity: replay the per-step key splits and skip the
        # batches the interrupted run already consumed, so a resumed run is
        # bit-identical to an uninterrupted one (asserted in
        # tests/test_trainer.py for plain/FSDP/LoRA modes). The reference
        # has no resume at all (train.py:620,706-708).
        for _ in range(start_step):
            rng, _ = jax.random.split(rng)
            next(batches, None)
        global_step = start_step
        # Metrics stay on-device between log points: a per-step float()
        # would block on the device each step (~25 ms tunnel RTT here —
        # up to ~25% of the measured 101 ms step). The reference prints
        # per step (train.py:699-701); we batch the fetch instead.
        pending = []  # (step, metrics_device, data_time)
        window_t0 = time.perf_counter()

        def drain_pending():
            nonlocal window_t0
            if not pending:
                return
            window = time.perf_counter() - window_t0
            per_step = window / len(pending)
            fetched = jax.device_get(
                [(m["loss"], m["grad_norm"]) for _, m, _ in pending]
            )
            for (s, _, dtm), (loss, gn) in zip(pending, fetched):
                metrics_log.write(json.dumps({
                    "step": s, "loss": float(loss),
                    "grad_norm": float(gn),
                    "step_time_s": round(per_step, 4),
                    "data_time_s": round(dtm, 4),
                    "wall": time.time(),
                }) + "\n")
            metrics_log.flush()
            print(
                f"step {pending[-1][0]}, {per_step*1000:.0f} ms/step, "
                f"step_loss: {float(fetched[-1][0]):.5f}"
            )
            pending.clear()
            window_t0 = time.perf_counter()

        t_begin = time.perf_counter()
        for batch in batches:
            if args.max_steps and global_step >= args.max_steps:
                break
            data_time = time.perf_counter() - t_begin
            batch = mesh_lib.shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, frozen_r, batch, sub)
            global_step += 1
            pending.append((global_step, metrics, data_time))
            if global_step % args.log_every == 0 or (
                args.max_steps and global_step >= args.max_steps
            ):
                drain_pending()
            t_begin = time.perf_counter()

            if global_step % args.save_steps == 0 or (
                args.max_steps and global_step >= args.max_steps
            ):
                drain_pending()
                mngr.save(
                    global_step,
                    args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
                )
                mngr.wait_until_finished()
                _export_adapter(args, cfgs, state, frozen, global_step)
        drain_pending()
    print("training done at step", global_step)
    return global_step


def _export_adapter(args, cfgs, state, frozen, step):
    lcfg = None
    if args.lora_rank:
        from imagharmony_tpu.adapters import lora as lora_lib

        from imagharmony_tpu.train.step import TrainConfig as _TC

        lcfg = _TC(lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
                   lora_targets=args.lora_targets).lora_config()

    def export(trainable, tag):
        trainable = jax.tree.map(np.asarray, trainable)
        lora_tree = trainable.pop("lora", None)
        merged = tree_util.merge(trainable, frozen)
        path = os.path.join(args.output_dir, f"ip_adapter{tag}.bin")
        ckpt_io.save_adapter_checkpoint(
            path,
            unet_params=merged["unet"],
            unet_cfg=cfgs.unet,
            image_proj_params=merged["image_proj"],
            harmony_params=merged["harmony"],
            harmony_cfg=cfgs.harmony,
        )
        print("exported", path)
        if lora_tree is not None:
            lpath = os.path.join(args.output_dir, f"lora{tag}.safetensors")
            lora_lib.save_lora(lpath, lora_tree, lcfg)
            print("exported", lpath)

    export(dict(state["trainable"]), f"-{step}")
    if "ema" in state:
        export(dict(state["ema"]), f"-ema-{step}")


if __name__ == "__main__":
    main()
