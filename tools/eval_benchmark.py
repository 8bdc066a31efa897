"""HarmonyBench-style dataset evaluation: CLIP-T / CLIP-I over a manifest.

The paper (arXiv 2506.01949) reports CLIP-T and CLIP-I on HarmonyBench;
the reference repo ships neither the bench nor any eval code (SURVEY.md
§4, README.md:116 unreleased-TODO). This tool implements the protocol so
it runs the day a benchmark manifest + weights exist — and as a
random-weight drill today:

    # drill (no weights, synthetic records)
    python tools/eval_benchmark.py --random tiny --synthetic 4 --steps 2

    # real evaluation
    python tools/eval_benchmark.py \
        --model_dir /ckpts/sdxl-base --adapter_ckpt /ckpts/ip_adapter.bin \
        --manifest harmonybench.json --data_root images/ \
        --out_dir eval_report

Manifest schema = the training-data schema (reference train.py:53):
[{"image_file": ..., "text": <target prompt>, "extra_text": <count+class
caption>}, ...]. Per record it runs the QL-Edit and reports CLIP-T
(edited vs text) and CLIP-I (edited vs source image); aggregates are one
JSON line for machine consumption.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_dir")
    ap.add_argument("--adapter_ckpt")
    ap.add_argument("--image_encoder_dir")
    ap.add_argument("--random", choices=["tiny", "full"],
                    help="random-weight drill instead of real checkpoints")
    ap.add_argument("--manifest", help="JSON list of records (train.json schema)")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="N synthetic records instead of --manifest")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance_scale", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None, help="evaluate first N records")
    ap.add_argument("--out_dir", default="eval_report")
    args = ap.parse_args()
    if not args.random and not args.model_dir:
        ap.error("need --model_dir (real weights) or --random tiny|full")
    if not args.manifest and not args.synthetic:
        ap.error("need --manifest or --synthetic N")

    from imagharmony_tpu.cli import _honor_platform_env

    _honor_platform_env()

    import numpy as np

    from imagharmony_tpu.pipelines import HarmonyPipeline
    from imagharmony_tpu.utils import clip_metrics

    if args.random == "tiny":
        pipe = HarmonyPipeline.random_tiny(seed=0)
    elif args.random == "full":
        pipe = HarmonyPipeline.random_full(seed=0)
    else:
        from imagharmony_tpu.io import checkpoints

        pipe = checkpoints.load_pipeline(
            model_dir=args.model_dir, adapter_ckpt=args.adapter_ckpt,
            image_encoder_dir=args.image_encoder_dir,
        )
    default_res = 32 if args.random == "tiny" else 1024
    h = args.height or default_res
    w = args.width or default_res

    if args.synthetic:
        rng = np.random.default_rng(0)
        records = [
            {"image": rng.integers(0, 255, (64, 64, 3), np.uint8),
             "text": f"a photo of {n} sheep", "extra_text": "six dogs"}
            for n in ("two", "three", "four", "five", "six", "seven", "eight")
        ][: args.synthetic]
    else:
        from PIL import Image

        with open(args.manifest) as f:
            raw_records = json.load(f)
        if args.limit:
            raw_records = raw_records[: args.limit]
        records = []
        for r in raw_records:
            img = Image.open(
                os.path.join(args.data_root, r["image_file"])
            ).convert("RGB").resize((512, 512))
            records.append({"image": np.asarray(img), "text": r["text"],
                            "extra_text": r.get("extra_text", "")})

    os.makedirs(args.out_dir, exist_ok=True)
    rows = []
    t_all = time.time()
    with open(os.path.join(args.out_dir, "records.jsonl"), "w") as logf:
        for i, r in enumerate(records):
            t0 = time.time()
            edited = pipe.generate(
                pil_image=r["image"], prompt=r["text"],
                extra_text=r["extra_text"] or None,
                num_inference_steps=args.steps,
                guidance_scale=args.guidance_scale,
                seed=args.seed, height=h, width=w, output_type="raw",
            )
            edited = np.asarray(edited, np.float32)
            row = {
                "index": i,
                "text": r["text"],
                "clip_t": round(float(clip_metrics.clip_t(pipe, edited, r["text"]).mean()), 5),
                "clip_i": round(float(
                    clip_metrics.clip_i(pipe, edited, r["image"][None]).mean()
                ), 5),
                "seconds": round(time.time() - t0, 2),
            }
            rows.append(row)
            logf.write(json.dumps(row) + "\n")
            print(f"[{i + 1}/{len(records)}] clip_t={row['clip_t']} "
                  f"clip_i={row['clip_i']} ({row['seconds']}s)")

    agg = {
        "n": len(rows),
        "clip_t_mean": round(float(np.mean([r["clip_t"] for r in rows])), 5),
        "clip_i_mean": round(float(np.mean([r["clip_i"] for r in rows])), 5),
        "steps": args.steps, "res": [h, w],
        "weights": ("random-" + args.random) if args.random else args.model_dir,
        "total_seconds": round(time.time() - t_all, 1),
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(agg, f, indent=2)
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
