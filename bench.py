"""Benchmark: images/sec/chip for a 30-step 1024² SDXL QL-Edit.

Measures the dominant cost of the reference's headline operating point
(reference test.py:32-36: 30-step SDXL edit, 1024² out, CFG pair): the full
jitted denoise loop (30 UNet steps on a CFG-packed batch, decoupled IP
branch active on the target block) + VAE decode, on one chip, bf16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: an A100 (the reference's implied hardware) runs the same 30-step
1024² SDXL edit at ~0.40 images/s (≈2.5 s/image, fp16 + memory-efficient
attention, batch 1 — widely reproduced public number for SDXL-base).
BASELINE.json's target is ≥2x that on v5e.

Env knobs:
  IMAGHARMONY_BENCH_MODE   edit|train|serve|e2e  (default edit)
  IMAGHARMONY_BENCH_SIZE   full|small|tiny   (default full on TPU)
  IMAGHARMONY_BENCH_STEPS  denoise steps     (default 30)
  IMAGHARMONY_BENCH_RES    output px         (default 1024; train: 512)
  IMAGHARMONY_BENCH_BATCH  train/serve batch (default 1; serve: 4)
  IMAGHARMONY_BENCH_ATTN   xla|pallas        (default pallas on TPU)
  IMAGHARMONY_BENCH_GUIDANCE  CFG scale (default 5.0; <=1 = no-CFG fast path)
  IMAGHARMONY_BENCH_SCHEDULER euler|euler_a|ddim|dpm++|lcm (default euler;
                                             lcm+steps 4+guidance 1 = the
                                             distilled-checkpoint op point)
  IMAGHARMONY_BENCH_ENC    encoder interval  (default 1 = exact; 2 = the
                                             --turbo encoder-propagation
                                             preset, changes outputs)

``train`` mode measures the adapter fine-tuning step (BASELINE config 5:
HA fine-tuning) in samples/sec/chip; baseline = A100 adapter training at
the reference operating point (~3 it/s at bs1 res512, typical public
IP-Adapter fine-tune throughput).

``serve`` mode packs IMAGHARMONY_BENCH_BATCH independent edits into one
device program (the generate_batch serving fast path) and reports
throughput images/sec/chip — latency rises ~linearly with the pack, so
the headline metric stays the single-edit p50 (mode=edit).

``e2e`` mode measures the TRUE user-facing edit through the real
``HarmonyPipeline.generate()`` entry (host preprocessing + tokenize +
CLIP text x2 + CLIP vision + HA fusion + 30-step denoise + VAE decode +
host fetch — the reference operating surface, test.py:28-39), vs the
``edit`` headline which times the pre-conditioned denoise+decode core.
"""

import json
import os
import sys
import time


def bench_train(size, on_tpu, platform):
    import jax
    import jax.numpy as jnp

    from imagharmony_tpu import dtypes
    from imagharmony_tpu.pipelines import components as comp
    from imagharmony_tpu.train import step as step_lib

    res = int(os.environ.get("IMAGHARMONY_BENCH_RES", "512" if size == "full" else "64"))
    bs = int(os.environ.get("IMAGHARMONY_BENCH_BATCH", "1"))
    if size == "full":
        cfgs = comp.sdxl_configs()
        params = comp.init_params(0, cfgs, dtype=jnp.bfloat16)
    else:
        cfgs = comp.tiny_configs()
        params = comp.init_params(0, cfgs)
    tcfg = step_lib.TrainConfig(gradient_checkpoint=True)
    state, frozen = step_lib.init_state(params, tcfg)
    del params
    state = jax.device_put(state)
    frozen = jax.device_put(frozen)
    batch = jax.device_put(step_lib.dummy_batch(cfgs, batch_size=bs, resolution=res))
    policy = dtypes.DEFAULT if on_tpu else dtypes.FP32
    backend = "pallas" if on_tpu else None
    step_fn = jax.jit(
        step_lib.make_train_step(cfgs, tcfg, policy=policy, backend=backend),
        donate_argnums=(0,),
    )
    t0 = time.time()
    state, m = step_fn(state, frozen, batch, jax.random.PRNGKey(0))
    float(m["loss"])
    compile_s = time.time() - t0
    reps = 5
    t0 = time.time()
    for i in range(reps):
        state, m = step_fn(state, frozen, batch, jax.random.PRNGKey(i))
    float(m["loss"])
    dt = (time.time() - t0) / reps
    sps = bs / dt
    a100_train = 3.0  # samples/s, adapter fine-tune bs1 res512 (provenance: BASELINE.md)
    print(json.dumps({
        "metric": f"train samples/sec/chip, bs{bs} {res}px adapter step ({size})",
        "value": round(sps, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / a100_train, 3),
        "p50_latency_s": round(dt, 4),
    }))
    print(f"# step {dt*1000:.0f}ms | compile {compile_s:.0f}s | platform {platform}",
          file=sys.stderr)


def bench_e2e(size, on_tpu, platform):
    """The user-facing generate() latency (reference test.py:28-39 surface):
    512² input image, prompt + extra_text (HA active), res² output."""
    import numpy as np

    from imagharmony_tpu.pipelines import HarmonyPipeline

    steps = int(os.environ.get("IMAGHARMONY_BENCH_STEPS", "30"))
    res = int(os.environ.get("IMAGHARMONY_BENCH_RES", "1024" if size == "full" else "64"))
    if size == "full":
        pipe = HarmonyPipeline.random_full(seed=0)
    else:
        pipe = HarmonyPipeline.random_tiny(seed=0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    kw = dict(
        pil_image=img, prompt="a photo of eight sheep", extra_text="six dogs",
        num_inference_steps=steps, height=res, width=res, seed=42,
        output_type="np",
    )
    t0 = time.time()
    out = pipe.generate(**kw)
    assert out.shape == (1, res, res, 3), out.shape
    compile_s = time.time() - t0
    reps = 3 if size == "full" else 2
    lats = []
    for _ in range(reps):
        t0 = time.time()
        pipe.generate(**kw)
        lats.append(time.time() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2]
    ips = 1.0 / (sum(lats) / len(lats))
    a100_baseline = 0.40  # same provenance as mode=edit (BASELINE.md)
    print(json.dumps({
        "metric": f"images/sec/chip, {steps}-step {res}x{res} e2e generate() ({size})",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / a100_baseline, 3),
        "p50_latency_s": round(p50, 3),
        "e2e_p50_s": round(p50, 3),
    }))
    print(f"# e2e per-image {sum(lats)/len(lats):.2f}s | compile {compile_s:.0f}s "
          f"| platform {platform}", file=sys.stderr)


def main():
    # honor JAX_PLATFORMS before touching devices: the axon sitecustomize
    # re-pins jax_platforms at interpreter start, so a requested CPU bench
    # would otherwise initialize the TPU tunnel (and hang if it is down)
    from imagharmony_tpu.cli import _honor_platform_env
    _honor_platform_env()
    # persistent compilation cache for TPU runs only (UNet compiles drop
    # ~5 min -> ~1 min on re-runs); never for CPU — XLA:CPU AOT results
    # are machine-feature-specific and this host changes between sessions
    if os.environ.get("JAX_PLATFORMS", "axon") not in ("cpu",):
        os.environ.setdefault(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")

    mode = os.environ.get("IMAGHARMONY_BENCH_MODE", "edit")
    if mode == "train":
        size = os.environ.get("IMAGHARMONY_BENCH_SIZE", "full" if on_tpu else "tiny")
        return bench_train(size, on_tpu, platform)
    if mode == "e2e":
        size = os.environ.get("IMAGHARMONY_BENCH_SIZE", "full" if on_tpu else "tiny")
        return bench_e2e(size, on_tpu, platform)

    from imagharmony_tpu import dtypes
    from imagharmony_tpu.models import unet, vae
    from imagharmony_tpu.pipelines.harmony_edit import denoise
    from imagharmony_tpu.schedulers import diffusion as sched

    size = os.environ.get("IMAGHARMONY_BENCH_SIZE", "full" if on_tpu else "tiny")
    steps = int(os.environ.get("IMAGHARMONY_BENCH_STEPS", "30"))
    res = int(os.environ.get("IMAGHARMONY_BENCH_RES", "1024" if size == "full" else "256"))
    backend = os.environ.get("IMAGHARMONY_BENCH_ATTN", "pallas" if on_tpu else "xla")
    enc_interval = int(os.environ.get("IMAGHARMONY_BENCH_ENC", "1"))
    guidance = float(os.environ.get("IMAGHARMONY_BENCH_GUIDANCE", "5.0"))

    if size == "full":
        ucfg = unet.UNetConfig()
        vcfg = vae.VAEConfig()
        ctx_dim, pooled_dim = 2048, 1280
    elif size == "small":
        ucfg = unet.UNetConfig(
            block_out_channels=(160, 320, 640),
            transformer_layers_per_block=(1, 2, 4),
            num_attention_heads=(5, 10, 20),
            attention_head_dim=32,
            cross_attention_dim=1024,
            projection_class_embeddings_input_dim=256 * 6 + 640,
        )
        vcfg = vae.VAEConfig(block_out_channels=(64, 128, 256, 256))
        ctx_dim, pooled_dim = 1024, 640
    else:
        ucfg = unet.tiny_config()
        vcfg = vae.tiny_config()
        ctx_dim, pooled_dim = ucfg.cross_attention_dim, 32

    dtype = jnp.bfloat16
    policy = dtypes.Policy(param_dtype=dtype, compute_dtype=dtype)
    key = jax.random.PRNGKey(0)
    uparams = jax.device_put(unet.init(key, ucfg, dtype=dtype))
    vparams = jax.device_put(vae.init(jax.random.PRNGKey(1), vcfg, dtype=dtype))

    lat = res // vcfg.downscale
    # edit: one request (CFG pair packed inside denoise);
    # serve: B independent requests packed on the batch axis (PERF.md:
    # M=2048→8192 helps the dim-1280 matmuls, ~+16% throughput at 4×)
    b = int(os.environ.get("IMAGHARMONY_BENCH_BATCH", "4")) if mode == "serve" else 1
    sched_kind = os.environ.get("IMAGHARMONY_BENCH_SCHEDULER", "euler")
    schedule = sched.make(sched_kind, steps)
    anc_rng = (
        jax.random.PRNGKey(7) if schedule.kind in ("euler_a", "lcm") else None
    )
    ip_scales = jnp.ones((steps,), jnp.float32)

    def make_inputs(nb):
        noise = jax.random.normal(jax.random.PRNGKey(2), (nb, lat, lat, 4), dtype)
        context = jax.random.normal(jax.random.PRNGKey(3), (2 * nb, 81, ctx_dim), dtype)
        pooled = jax.random.normal(jax.random.PRNGKey(4), (2 * nb, pooled_dim), dtype)
        time_ids = jnp.tile(
            jnp.array([[res, res, 0, 0, res, res]], jnp.float32), (2 * nb, 1)
        )
        ip_tokens = jax.random.normal(jax.random.PRNGKey(5), (2 * nb, 4, ctx_dim), dtype)
        return noise, context, pooled, time_ids, ip_tokens

    def make_edit_core(nb):
        @jax.jit
        def edit_core(uparams, vparams, noise, context, pooled, time_ids, ip_tokens):
            latents = (noise * schedule.init_noise_sigma).astype(dtype)
            latents = denoise(
                uparams, ucfg, latents, context, pooled, time_ids, ip_tokens,
                schedule, ip_scales, guidance_scale=guidance,
                encoder_interval=enc_interval, ancestral_rng=anc_rng,
                policy=policy, backend=backend,
            )
            if nb > 1:
                # packed serving: decode rows sequentially — a 4-row 1024²
                # batch decode OOMs the 16 GB chip; per-row decode is exact
                # and a small fraction of the 30-step denoise anyway
                return jax.lax.map(
                    lambda l: vae.decode(vparams, vcfg, l[None], policy=policy)[0],
                    latents,
                )
            return vae.decode(vparams, vcfg, latents, policy=policy)

        return edit_core

    def timed(fn, args, nb, reps):
        """(p50_latency, images/s, compile_s) for a jitted core."""
        t0 = time.time()
        fn(*args).block_until_ready()
        compile_s = time.time() - t0
        lats = []
        for _ in range(reps):
            t0 = time.time()
            fn(*args).block_until_ready()
            lats.append(time.time() - t0)
        lats.sort()
        p50 = lats[len(lats) // 2]
        per_image = sum(lats) / len(lats) / nb
        return p50, 1.0 / per_image, compile_s

    reps = 3 if size == "full" else 2
    p50, ips, compile_s = timed(
        make_edit_core(b), (uparams, vparams) + make_inputs(b), b, reps
    )

    a100_baseline = 0.40  # images/s, 30-step 1024^2 SDXL on A100 (provenance: BASELINE.md)
    what = f"{b}-packed serving" if mode == "serve" else "SDXL edit"
    if enc_interval > 1:
        what += f" enc-prop/{enc_interval}"
    if sched_kind != "euler":
        what += f" {sched_kind}"
    record = {
        "metric": f"images/sec/chip, {steps}-step {res}x{res} {what} ({size}, attn={backend})",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / a100_baseline, 3),
        "p50_latency_s": round(p50, 3),
    }

    # default record also archives the user-facing numbers next to the
    # denoise-core headline (VERDICT r3 item 4): the 4-packed serving
    # throughput and the true e2e generate() latency
    extras = os.environ.get(
        "IMAGHARMONY_BENCH_EXTRAS", "1" if (mode == "edit" and size == "full") else "0"
    ) == "1"
    if extras:
        try:
            sb = 4
            _, serve_ips, _ = timed(
                make_edit_core(sb), (uparams, vparams) + make_inputs(sb), sb, 2
            )
            record["serve_images_per_s"] = round(serve_ips, 4)
        except Exception as e:  # the headline must survive an extras failure
            print(f"# serve extra failed: {type(e).__name__}: {e}", file=sys.stderr)
        try:
            import gc

            del uparams, vparams  # free HBM before the full pipeline loads
            gc.collect()
            import numpy as np

            from imagharmony_tpu.pipelines import HarmonyPipeline

            pipe = (
                HarmonyPipeline.random_full(seed=0)
                if size == "full" else HarmonyPipeline.random_tiny(seed=0)
            )
            img = np.random.default_rng(0).integers(
                0, 255, (512, 512, 3), dtype=np.uint8
            )
            e2e_kw = dict(
                pil_image=img, prompt="a photo of eight sheep",
                extra_text="six dogs", num_inference_steps=steps,
                height=res, width=res, seed=42, output_type="np",
            )
            pipe.generate(**e2e_kw)  # compile + warmup
            e2e = []
            for _ in range(3):
                t0 = time.time()
                pipe.generate(**e2e_kw)
                e2e.append(time.time() - t0)
            e2e.sort()
            record["e2e_p50_s"] = round(e2e[len(e2e) // 2], 3)
        except Exception as e:
            print(f"# e2e extra failed: {type(e).__name__}: {e}", file=sys.stderr)

    print(json.dumps(record))
    print(
        f"# headline p50 {p50:.2f}s | compile {compile_s:.0f}s | platform {platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
