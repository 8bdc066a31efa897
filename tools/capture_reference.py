#!/usr/bin/env python
"""Capture a reference SDXL denoising trajectory with stock diffusers.

Run this in a torch+diffusers environment (it has NO dependency on
imagharmony_tpu) to produce the reference side of the parity protocol:

    python tools/capture_reference.py --model-dir /path/to/sdxl-base \
        --out ref_capture.npz --steps 8 --size 256

then on the TPU side:

    imagharmony parity --theirs ref_capture.npz --model-dir /path/to/sdxl-base

The .npz contains (all NHWC, float32):
    noise    (1, h/8, w/8, 4)  initial N(0,1) latents BEFORE sigma scaling —
                               the TPU side injects these so both
                               trajectories share x_T
    latents  (steps, 1, h/8, w/8, 4)  latents after each scheduler step
    image    (1, H, W, 3)      final decoded image in [-1, 1]
    meta     json: prompt / negative_prompt / steps / size / guidance_scale /
             scheduler / seed / ip_scale (0: plain SDXL, no IP branch)

This captures the exact math the reference pipeline runs
(IMAGHarmony ip_adapter/custom_pipelines.py:304-394: CFG pair, scheduler
step, fp32 VAE decode) minus the IP/HA branches, which are compared
separately by the adapter unit oracles.
"""

import argparse
import json

import numpy as np
import torch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", required=True, help="SDXL checkpoint dir or HF id")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--prompt", default="best quality, high quality")
    p.add_argument(
        "--negative-prompt",
        default="monochrome, lowres, bad anatomy, worst quality, low quality",
    )
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--scheduler", default="euler", choices=["euler", "ddim"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32", choices=["float32", "float16", "bfloat16"])
    a = p.parse_args()

    from diffusers import DDIMScheduler, EulerDiscreteScheduler, StableDiffusionXLPipeline

    dtype = getattr(torch, a.dtype)
    pipe = StableDiffusionXLPipeline.from_pretrained(a.model_dir, torch_dtype=dtype)
    sched_cls = DDIMScheduler if a.scheduler == "ddim" else EulerDiscreteScheduler
    pipe.scheduler = sched_cls.from_config(pipe.scheduler.config)
    if torch.cuda.is_available():
        pipe = pipe.to("cuda")

    g = torch.Generator().manual_seed(a.seed)
    shape = (1, pipe.unet.config.in_channels, a.size // 8, a.size // 8)
    # pre-scale noise: diffusers' prepare_latents multiplies passed latents
    # by scheduler.init_noise_sigma itself
    noise = torch.randn(shape, generator=g, dtype=torch.float32)

    traj = []

    def on_step_end(pipe_, i, t, kw):
        traj.append(kw["latents"].detach().float().permute(0, 2, 3, 1).cpu().numpy())
        return kw

    out = pipe(
        prompt=a.prompt,
        negative_prompt=a.negative_prompt,
        num_inference_steps=a.steps,
        height=a.size,
        width=a.size,
        guidance_scale=a.guidance_scale,
        latents=noise.to(device=pipe.device, dtype=dtype),
        callback_on_step_end=on_step_end,
        callback_on_step_end_tensor_inputs=["latents"],
        output_type="np",
    )
    image = out.images.astype(np.float32) * 2.0 - 1.0  # [0,1] -> [-1,1]
    meta = dict(
        prompt=a.prompt,
        negative_prompt=a.negative_prompt,
        steps=a.steps,
        size=a.size,
        guidance_scale=a.guidance_scale,
        scheduler=a.scheduler,
        seed=a.seed,
        ip_scale=0.0,
    )
    np.savez_compressed(
        a.out,
        noise=noise.permute(0, 2, 3, 1).numpy(),
        latents=np.stack(traj),
        image=image,
        meta=json.dumps(meta),
    )
    print(f"wrote {a.out}: {len(traj)} steps @ {a.size}px, scheduler={a.scheduler}")


if __name__ == "__main__":
    main()
