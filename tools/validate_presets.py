"""Quality-validation protocol for the gated latency presets (--fast /
--turbo), mirroring the two-machine parity protocol: ONE command that,
given weights, produces the exact 30-step edit plus each preset on the
same inputs and reports quality deltas — runnable the day real weights
exist, and as a random-weight drill today.

    # drill (no weights needed; tiny pipe, CPU or TPU)
    python tools/validate_presets.py --random tiny --steps 8

    # real validation (weights on disk; reference demo inputs)
    python tools/validate_presets.py \
        --model_dir /ckpts/sdxl-base --adapter_ckpt /ckpts/ip_adapter.bin \
        --image "demo/six dogs.jpg" --prompt "eight sheep in a field" \
        --extra_text "six dogs" --out_dir preset_report

Reports, per preset, vs the exact 30-step output:
  raw_cosine  — cosine over decoded float images (structure proxy);
  clip_i      — CLIP image-image similarity (pipeline's own vision tower:
                with real weights this is the actual CLIP space);
  clip_t      — CLIP-T prompt alignment of each output (bigG joint space,
                same scorer PNS uses), reported absolute for both.
Presets change outputs BY DESIGN (PERF.md); this tool quantifies by how
much, so the off-by-default gating can be revisited with evidence.
Ref quality claims: reference README.md:27.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipe(args):
    from imagharmony_tpu.pipelines import HarmonyPipeline

    if args.random == "tiny":
        return HarmonyPipeline.random_tiny(seed=0)
    if args.random == "full":
        return HarmonyPipeline.random_full(seed=0)
    from imagharmony_tpu.io import checkpoints

    return checkpoints.load_pipeline(
        model_dir=args.model_dir,
        adapter_ckpt=args.adapter_ckpt,
        image_encoder_dir=args.image_encoder_dir,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_dir")
    ap.add_argument("--adapter_ckpt")
    ap.add_argument("--image_encoder_dir")
    ap.add_argument("--random", choices=["tiny", "full"],
                    help="random-weight drill instead of real checkpoints")
    ap.add_argument("--image", help="input image (default: synthetic)")
    ap.add_argument("--prompt", default="a photo of eight sheep")
    ap.add_argument("--extra_text", default="six dogs")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--guidance_scale", type=float, default=5.0)
    ap.add_argument("--out_dir", default="preset_report")
    args = ap.parse_args()
    if not args.random and not args.model_dir:
        ap.error("need --model_dir (real weights) or --random tiny|full")

    from imagharmony_tpu.cli import _honor_platform_env

    _honor_platform_env()

    import numpy as np

    from imagharmony_tpu.pipelines import harmony_edit as he
    from imagharmony_tpu.pipelines import pns
    from imagharmony_tpu.utils.parity import cosine

    pipe = build_pipe(args)
    default_res = 32 if args.random == "tiny" else 1024
    h = args.height or default_res
    w = args.width or default_res

    if args.image:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB").resize((512, 512)))
    else:
        img = np.random.default_rng(0).integers(0, 255, (512, 512, 3), np.uint8)

    base = dict(
        pil_image=img, prompt=args.prompt, extra_text=args.extra_text,
        guidance_scale=args.guidance_scale, seed=args.seed,
        height=h, width=w, output_type="raw",
    )
    presets = {
        "exact": dict(num_inference_steps=args.steps),
        "fast": dict(num_inference_steps=max(2, args.steps // 2),
                     timestep_spacing="trailing"),
        "turbo": dict(num_inference_steps=args.steps, encoder_interval=2),
        "fast+turbo": dict(num_inference_steps=max(2, args.steps // 2),
                           timestep_spacing="trailing", encoder_interval=2),
    }

    os.makedirs(args.out_dir, exist_ok=True)
    outputs = {}
    for name, kw in presets.items():
        import time

        t0 = time.time()
        raw = np.asarray(pipe.generate(**dict(base, **kw)), np.float32)
        outputs[name] = (raw, time.time() - t0)
        from PIL import Image

        Image.fromarray(np.asarray(he.to_uint8(raw))[0]).save(
            os.path.join(args.out_dir, f"{name.replace('+', '_')}.png")
        )

    # CLIP embeddings via the pipeline's own towers
    import jax.numpy as jnp

    from imagharmony_tpu.utils import clip_metrics

    def clip_image_embed(raw):
        return clip_metrics.image_embeds(pipe, raw)

    has_bigg = "text_encoder_2" in pipe.params
    ids_g = pipe._tokenize(args.prompt)[1] if has_bigg else None

    exact_raw = outputs["exact"][0]
    exact_emb = clip_image_embed(exact_raw)
    report = {"inputs": {"prompt": args.prompt, "extra_text": args.extra_text,
                         "steps": args.steps, "res": [h, w], "seed": args.seed,
                         "weights": "random-" + args.random if args.random else args.model_dir}}
    for name, (raw, secs) in outputs.items():
        row = {"seconds": round(secs, 2)}
        if name != "exact":
            row["raw_cosine_vs_exact"] = round(float(cosine(raw, exact_raw)), 5)
            emb = clip_image_embed(raw)
            row["clip_i_vs_exact"] = round(float((emb * exact_emb).sum(-1).mean()), 5)
        if has_bigg:
            score = pns.clip_scores(
                pipe.params, pipe.cfgs, jnp.asarray(raw), jnp.asarray(ids_g),
                policy=pipe.policy,
            )
            row["clip_t"] = round(float(np.asarray(score).mean()), 5)
        report[name] = row
    path = os.path.join(args.out_dir, "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"# images + report written to {args.out_dir}/", file=sys.stderr)


if __name__ == "__main__":
    main()
