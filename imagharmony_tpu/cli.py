"""Command-line entry points.

``imagharmony edit`` is the test.py-equivalent inference script
(reference test.py:1-115); ``imagharmony demo`` runs a few-step edit on
synthetic weights end-to-end (no checkpoint needed — smoke/bench surface).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _honor_platform_env():
    """Respect JAX_PLATFORMS even when a sitecustomize (e.g. the axon TPU
    shim) pinned jax_platforms via jax.config after env parsing."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def _add_edit_args(p):
    p.add_argument("--input", help="reference image path")
    p.add_argument("--prompt", default="best quality, high quality")
    p.add_argument("--extra-text", default=None, help="count+class caption, e.g. 'eight sheep'")
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--output", default="output.png")
    p.add_argument("--model-dir", default=None, help="SDXL checkpoint directory")
    p.add_argument("--adapter-ckpt", default=None, help="ip_adapter.bin / .safetensors")
    p.add_argument("--lora", action="append", default=None,
                   metavar="PATH[:SCALE]",
                   help="lora-N.safetensors from `train --lora_rank` "
                        "(merged into the UNet before generation). May be "
                        "repeated to compose multiple LoRAs (additive "
                        "merge); an optional :SCALE suffix overrides "
                        "--lora-scale per adapter")
    p.add_argument("--lora-scale", type=float, default=1.0)
    p.add_argument("--textual-inversion", action="append", default=None,
                   metavar="PATH[:TOKEN]",
                   help="learned textual-inversion embedding (safetensors; "
                        "SDXL dual {clip_l, clip_g} or single-tower "
                        "token-keyed). Repeatable — one per concept; the "
                        "optional :TOKEN suffix overrides the placeholder "
                        "name")
    p.add_argument("--image-encoder-dir", default=None)
    p.add_argument("--controlnet-dir", default=None,
                   help="diffusers ControlNetModel directory (optional)")
    p.add_argument("--refiner-dir", default=None,
                   help="SDXL refiner checkpoint directory: run the "
                        "mixture-of-denoisers ensemble — the base model "
                        "denoises [0, --denoising-end), the refiner "
                        "finishes from its latents")
    p.add_argument("--denoising-end", type=float, default=None,
                   help="base/refiner split point (default 0.8 with "
                        "--refiner-dir; diffusers ensemble default)")
    p.add_argument("--control-image", default=None,
                   help="conditioning image for the ControlNet branch")
    p.add_argument("--init-image", default=None,
                   help="img2img: start from this image noised to "
                        "--strength of the schedule instead of pure noise")
    p.add_argument("--mask-image", default=None,
                   help="inpaint mask (white = repaint); requires --init-image")
    p.add_argument("--strength", type=float, default=None,
                   help="img2img strength in (0,1]: fraction of the "
                        "schedule actually denoised (diffusers semantics)")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--scheduler", default="euler",
                   choices=["euler", "euler_a", "ddim", "dpm++", "lcm"],
                   help="lcm is the few-step consistency sampler for "
                        "LCM/LCM-LoRA distilled checkpoints — pair with "
                        "--steps 4..8 and --guidance-scale 1.0 (the no-CFG "
                        "fast path)")
    p.add_argument("--fast", action="store_true",
                   help="latency preset: 15 steps + trailing timestep spacing "
                        "(arXiv 2305.08891; changes outputs vs the 30-step default)")
    p.add_argument("--turbo", action="store_true",
                   help="encoder propagation: run the UNet encoder every 2nd "
                        "step, reuse features in between (arXiv 2312.09608; "
                        "changes outputs; composes with --fast)")
    p.add_argument("--timestep-spacing", default=None,
                   choices=["leading", "trailing", "linspace"])
    p.add_argument("--prediction-type", default="epsilon",
                   choices=["epsilon", "v_prediction", "sample"],
                   help="UNet output parametrization (v_prediction for "
                        "SD2.x-style models)")
    p.add_argument("--zero-snr", action="store_true",
                   help="zero terminal SNR beta rescale (arXiv 2305.08891; "
                        "pair with --prediction-type v_prediction and "
                        "--timestep-spacing trailing)")
    p.add_argument("--karras", action="store_true",
                   help="Karras rho=7 sigma spacing (arXiv 2206.00364; "
                        "euler/dpm++ only — diffusers use_karras_sigmas)")
    p.add_argument("--prompt-weighting", action="store_true",
                   help="parse the (word:1.5)/[word] attention grammar in "
                        "prompt/negative prompt (A1111 semantics; off = "
                        "brackets stay literal, matching the reference)")
    p.add_argument("--clip-skip", type=int, default=0,
                   help="condition on an earlier text-encoder layer "
                        "(diffusers clip_skip; for checkpoints fine-tuned "
                        "that way)")
    p.add_argument("--tile-vae", action="store_true")
    p.add_argument("--pns", type=int, default=0, help="preference-guided noise selection over K seeds")
    p.add_argument("--attn-maps", default=None, metavar="DIR",
                   help="also save per-IP-token cross-attention heatmaps "
                        "blended over the input image to DIR (the reference's "
                        "attention-map visualization, utils.py:6-79)")


def _save_attn_maps(pipe, image, args):
    """Render the decoupled IP branch's attention as token heatmaps over
    the input (reference register_cross_attention_hook/get_net_attn_map
    role, utils.py:6-79 — here a jitted probe, no forward hooks)."""
    from imagharmony_tpu.utils import attn_maps as am

    os.makedirs(args.attn_maps, exist_ok=True)
    maps = am.ip_attention_maps(
        pipe, image, prompt=args.prompt, extra_text=args.extra_text,
        latent_size=args.height // pipe.cfgs.vae.downscale, seed=args.seed,
    )
    for i, im in enumerate(am.heatmap_to_pil(maps, base_image=image)):
        path = os.path.join(args.attn_maps, f"ip_token_{i}.png")
        im.save(path)
    print(f"saved {len(maps)} IP attention heatmaps to {args.attn_maps}")


def _merge_loras(pipe, args):
    """Merge every --lora PATH[:SCALE] into the pipeline's UNet (repeatable
    flag — the merges are additive and order-independent), then install
    every --textual-inversion PATH[:TOKEN] embedding."""
    import os as _os

    from imagharmony_tpu.adapters import lora as lora_lib

    specs = getattr(args, "lora", None) or []
    if isinstance(specs, str):  # tolerate a pre-append-era single string
        specs = [specs]
    for spec in specs:
        path, scale = lora_lib.parse_spec(
            spec, default_scale=getattr(args, "lora_scale", 1.0)
        )
        pipe = pipe.with_lora(path, scale=scale)
        print(f"merged LoRA {path} (scale {scale})")
    for spec in getattr(args, "textual_inversion", None) or []:
        path, token = spec, None
        if ":" in spec and not _os.path.exists(spec):
            path, token = spec.rsplit(":", 1)
        pipe = pipe.with_textual_inversion(path, token=token)
        print(f"installed textual inversion {path}"
              + (f" as {token}" if token else ""))
    return pipe


def cmd_edit(args):
    from PIL import Image

    from imagharmony_tpu.io import checkpoints
    from imagharmony_tpu.pipelines import HarmonyPipeline

    pipe = checkpoints.load_pipeline(
        model_dir=args.model_dir,
        adapter_ckpt=args.adapter_ckpt,
        image_encoder_dir=args.image_encoder_dir,
        controlnet_dir=args.controlnet_dir,
    )
    pipe = _merge_loras(pipe, args)
    image = Image.open(args.input).resize((512, 512))
    steps, spacing = args.steps, args.timestep_spacing or "leading"
    if args.fast:
        # gated latency preset (reference operating point stays 30 steps,
        # test.py:33): trailing spacing holds quality at low step counts
        if steps == 30:
            steps = 15
        if args.timestep_spacing is None:
            spacing = "trailing"
    t0 = time.time()
    kw = dict(
        encoder_interval=2 if getattr(args, "turbo", False) else 1,
        control_image=(Image.open(args.control_image) if args.control_image else None),
        init_image=(Image.open(args.init_image)
                    if getattr(args, "init_image", None) else None),
        mask_image=(Image.open(args.mask_image)
                    if getattr(args, "mask_image", None) else None),
        strength=getattr(args, "strength", None),
        prompt=args.prompt,
        negative_prompt=args.negative_prompt,
        extra_text=args.extra_text,
        scale=args.scale,
        guidance_scale=args.guidance_scale,
        num_inference_steps=steps,
        timestep_spacing=spacing,
        use_karras_sigmas=getattr(args, "karras", False),
        prediction_type=getattr(args, "prediction_type", "epsilon"),
        rescale_zero_snr=getattr(args, "zero_snr", False),
        clip_skip=getattr(args, "clip_skip", 0),
        prompt_weighting=getattr(args, "prompt_weighting", False),
        seed=args.seed,
        num_samples=args.num_samples,
        height=args.height,
        width=args.width,
        scheduler=args.scheduler,
        tile_vae=args.tile_vae,
        output_type="pil",
    )
    refiner_dir = getattr(args, "refiner_dir", None)
    if pipe.cfgs.vision is None:
        # refiner family: no image prompt — --input is the image being
        # refined (img2img), unless an explicit --init-image was given
        if kw["init_image"] is None:
            kw["init_image"] = image
            if kw["strength"] is None:
                kw["strength"] = 0.3
        kw.pop("scale")
        images = pipe.generate(**kw)
    elif refiner_dir:
        # mixture-of-denoisers ensemble (diffusers base+refiner recipe,
        # through the reference custom pipeline's denoising_end handoff,
        # custom_pipelines.py:308-316): base runs [0, end), the refiner
        # consumes its latents with denoising_start=end
        import numpy as _np

        end = getattr(args, "denoising_end", None) or 0.8
        lat = pipe.generate(pil_image=image, denoising_end=end, **kw)
        refiner = checkpoints.load_pipeline(model_dir=refiner_dir)
        rkw = {
            k: kw[k] for k in (
                "prompt", "negative_prompt", "guidance_scale",
                "num_inference_steps", "timestep_spacing",
                "use_karras_sigmas", "seed", "num_samples", "height",
                "width", "scheduler", "tile_vae",
            )
        }
        images = refiner.generate(
            latents=_np.asarray(lat), denoising_start=end,
            output_type="pil", **rkw,
        )
    elif args.pns:
        from imagharmony_tpu.pipelines import pns

        images = [pns.generate_with_pns(pipe, image, num_seeds=args.pns, **kw)]
    else:
        images = pipe.generate(pil_image=image, **kw)
    for i, im in enumerate(images):
        path = args.output if len(images) == 1 else args.output.replace(".png", f"_{i}.png")
        im.save(path)
        print(f"saved {path}")
    if args.attn_maps:
        if pipe.cfgs.vision is None:
            print("--attn-maps skipped: no IP branch on the refiner family")
        else:
            _save_attn_maps(pipe, image, args)
    print(f"done in {time.time() - t0:.1f}s")


def cmd_demo(args):
    """Few-step edit on random tiny weights — exercises the full jitted
    path (text → vision → HA → scan denoise → VAE) with no checkpoints."""
    import numpy as np

    from imagharmony_tpu.pipelines import HarmonyPipeline

    pipe = HarmonyPipeline.random_tiny(seed=0)
    if args.input:
        # real reference image (e.g. the upstream demo inputs) through the
        # checkpoint-free pipe: full JPEG/PNG decode + CLIP preprocessing
        from PIL import Image

        ref = np.asarray(Image.open(args.input).convert("RGB"))
    else:
        rng = np.random.default_rng(args.seed)
        ref = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    from PIL import Image

    t0 = time.time()
    out = pipe.generate(
        pil_image=ref,
        prompt=args.prompt,
        extra_text=args.extra_text or "six dogs",
        num_inference_steps=args.steps,
        height=args.height,
        width=args.width,
        seed=args.seed,
        scale=args.scale,
        scheduler=args.scheduler,
        guidance_scale=args.guidance_scale,
        timestep_spacing=args.timestep_spacing or "leading",
        use_karras_sigmas=getattr(args, "karras", False),
        prediction_type=getattr(args, "prediction_type", "epsilon"),
        rescale_zero_snr=getattr(args, "zero_snr", False),
        clip_skip=getattr(args, "clip_skip", 0),
        init_image=(Image.open(args.init_image)
                    if getattr(args, "init_image", None) else None),
        mask_image=(Image.open(args.mask_image)
                    if getattr(args, "mask_image", None) else None),
        strength=getattr(args, "strength", None),
        encoder_interval=2 if getattr(args, "turbo", False) else 1,
        output_type="pil",
    )
    out[0].save(args.output)
    if args.attn_maps:
        from PIL import Image

        _save_attn_maps(pipe, Image.fromarray(ref), args)
    print(
        json.dumps(
            {
                "saved": args.output,
                "seconds": round(time.time() - t0, 2),
                "steps": args.steps,
                "size": [args.height, args.width],
            }
        )
    )


def cmd_serve(args):
    from imagharmony_tpu.pipelines import serving

    serving.main(args)


def cmd_parity(args):
    """North-star parity driver (BASELINE.json: ≥0.999 per-step cosine).

    Two-machine protocol: run tools/capture_reference.py in a diffusers env
    to produce ``--theirs``; this command replays the same noise/prompt/
    schedule through our pipeline and prints the per-step cosine table.
    With both --ours and --theirs it just compares two saved captures.
    """
    import numpy as np

    from imagharmony_tpu.utils import parity

    if args.ours and args.theirs:
        rep = parity.compare(parity.load(args.ours), parity.load(args.theirs))
        rep["pass"] = rep["min_cosine"] >= args.target
        print(json.dumps(rep))
        return rep

    theirs = parity.load(args.theirs) if args.theirs else None
    meta = {}
    if theirs is not None and "meta" in theirs:
        meta = json.loads(str(theirs["meta"]))
    if args.model_dir:
        from imagharmony_tpu.io import checkpoints

        pipe = checkpoints.load_pipeline(
            model_dir=args.model_dir,
            adapter_ckpt=args.adapter_ckpt,
            image_encoder_dir=args.image_encoder_dir,
        )
    else:
        from imagharmony_tpu.pipelines import HarmonyPipeline

        print("no --model-dir: capturing from the random tiny pipeline")
        pipe = HarmonyPipeline.random_tiny()
    if args.input:
        from PIL import Image

        img = Image.open(args.input)
    else:
        img = np.zeros((64, 64, 3), np.uint8)
    size = int(meta.get("size", args.size))
    cap = parity.run_capture(
        pipe,
        img,
        prompt=meta.get("prompt", args.prompt),
        negative_prompt=meta.get("negative_prompt"),
        steps=int(meta.get("steps", args.steps)),
        height=size,
        width=size,
        seed=int(meta.get("seed", args.seed)),
        scheduler=meta.get("scheduler", args.scheduler),
        guidance_scale=float(meta.get("guidance_scale", 5.0)),
        # vs a stock-diffusers capture the IP branch must be off
        ip_scale=float(meta.get("ip_scale", 0.0 if theirs is not None else 1.0)),
        noise=(theirs["noise"] if theirs is not None and "noise" in theirs else None),
    )
    if args.save:
        parity.save(args.save, cap)
        print(f"saved our capture to {args.save}")
    if theirs is not None:
        rep = parity.compare(cap, theirs)
        rep["target"] = args.target
        rep["pass"] = rep["min_cosine"] >= args.target
        print(json.dumps(rep))
        return rep


def cmd_convert(args):
    from imagharmony_tpu.io import checkpoints

    checkpoints.convert_training_checkpoints(args.log_dir)


def cmd_train(args, extra):
    from imagharmony_tpu.train import trainer

    trainer.main(extra)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="imagharmony")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_edit = sub.add_parser("edit", help="QL-Edit inference (test.py equivalent)")
    _add_edit_args(p_edit)

    p_demo = sub.add_parser("demo", help="random-weight smoke edit")
    _add_edit_args(p_demo)
    p_demo.set_defaults(steps=4, height=32, width=32)

    p_conv = sub.add_parser("convert", help="convert training ckpts to adapter format")
    p_conv.add_argument("--log-dir", required=True)

    p_par = sub.add_parser("parity", help="per-step cosine parity vs a diffusers capture")
    p_par.add_argument("--ours", default=None, help="our saved capture .npz")
    p_par.add_argument("--theirs", default=None, help="diffusers capture .npz (tools/capture_reference.py)")
    p_par.add_argument("--model-dir", default=None)
    p_par.add_argument("--adapter-ckpt", default=None)
    p_par.add_argument("--image-encoder-dir", default=None)
    p_par.add_argument("--input", default=None, help="reference image (IP branch)")
    p_par.add_argument("--save", default=None, help="save our capture here")
    p_par.add_argument("--prompt", default="best quality, high quality")
    p_par.add_argument("--steps", type=int, default=8)
    p_par.add_argument("--size", type=int, default=256)
    p_par.add_argument("--seed", type=int, default=0)
    # parity compares against diffusers step-by-step — deterministic
    # schedulers only (euler_a's ancestral draws use a different rng)
    p_par.add_argument("--scheduler", default="euler", choices=["euler", "ddim", "dpm++"])
    p_par.add_argument("--target", type=float, default=0.999)

    p_serve = sub.add_parser("serve", help="batched editing service")
    p_serve.add_argument("--port", type=int, default=7860)
    p_serve.add_argument("--model-dir", default=None)
    p_serve.add_argument("--adapter-ckpt", default=None)
    p_serve.add_argument("--lora", action="append", default=None,
                         metavar="PATH[:SCALE]",
                         help="lora-N.safetensors merged into the UNet at "
                              "startup (repeatable; :SCALE suffix per adapter)")
    p_serve.add_argument("--lora-scale", type=float, default=1.0)
    p_serve.add_argument("--textual-inversion", action="append", default=None,
                         metavar="PATH[:TOKEN]",
                         help="textual-inversion embedding(s) installed at "
                              "startup (repeatable)")
    p_serve.add_argument("--continuous", action="store_true",
                         help="continuous batching: admit requests mid-denoise")
    p_serve.add_argument("--turbo", action="store_true",
                         help="default encoder propagation (interval 2) for "
                              "requests that don't set encoder_interval "
                              "(changes outputs; composes with --continuous)")

    sub.add_parser("train", help="adapter fine-tuning (args passed through)", add_help=False)

    args, extra = parser.parse_known_args(argv)
    _honor_platform_env()
    if args.cmd == "edit":
        cmd_edit(args)
    elif args.cmd == "demo":
        cmd_demo(args)
    elif args.cmd == "convert":
        cmd_convert(args)
    elif args.cmd == "parity":
        cmd_parity(args)
    elif args.cmd == "serve":
        cmd_serve(args)
    elif args.cmd == "train":
        cmd_train(args, extra)
    return 0


if __name__ == "__main__":
    sys.exit(main())
