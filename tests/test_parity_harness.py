"""Parity harness: capture/compare protocol + the bf16-vs-fp32 canary."""

import numpy as np
import pytest

from imagharmony_tpu import dtypes
from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.utils import parity


@pytest.fixture(scope="module")
def ref_image():
    return np.random.default_rng(0).integers(0, 255, (48, 48, 3), dtype=np.uint8)


def test_capture_matches_scanned_pipeline(ref_image):
    """The eager capture path must land on the same final latents as the
    production lax.scan pipeline (same math, different loop)."""
    pipe = HarmonyPipeline.random_tiny(seed=0)
    pipe.policy = dtypes.FP32
    cap = parity.run_capture(
        pipe, ref_image, prompt="a dog", extra_text="six dogs",
        steps=3, height=32, width=32, seed=5,
    )
    assert cap["latents"].shape[0] == 4  # init + 3 steps

    lat = pipe.generate(
        pil_image=ref_image, prompt="a dog", extra_text="six dogs",
        num_inference_steps=3, height=32, width=32, seed=5, output_type="latent",
    )
    # output_type="latent" returns true pre-VAE latents
    c = parity.cosine(cap["latents"][-1], np.asarray(lat, np.float32))
    assert c > 0.9999, c

    raw = pipe.generate(
        pil_image=ref_image, prompt="a dog", extra_text="six dogs",
        num_inference_steps=3, height=32, width=32, seed=5, output_type="raw",
    )
    c = parity.cosine(cap["image"], np.asarray(raw, np.float32))
    assert c > 0.9999, c


def test_bf16_vs_fp32_cosine_canary(ref_image):
    """Numerical discipline: our bf16 path must track our fp32 path at
    >=0.99 cosine through a short denoise (if this drifts, reference
    parity is unattainable)."""
    pipe32 = HarmonyPipeline.random_tiny(seed=0)
    pipe32.policy = dtypes.FP32
    pipe16 = HarmonyPipeline.random_tiny(seed=0)
    pipe16.policy = dtypes.DEFAULT

    kw = dict(prompt="a dog", extra_text="six dogs", steps=3, height=32, width=32, seed=5)
    a = parity.run_capture(pipe32, ref_image, **kw)
    b = parity.run_capture(pipe16, ref_image, **kw)
    rep = parity.compare(a, b)
    assert rep["min_cosine"] > 0.99, rep
    assert rep["image_cosine"] > 0.98, rep


def test_capture_roundtrip(tmp_path, ref_image):
    pipe = HarmonyPipeline.random_tiny(seed=0)
    cap = parity.run_capture(
        pipe, ref_image, prompt="a dog", steps=2, height=32, width=32,
    )
    parity.save(tmp_path / "cap.npz", cap)
    back = parity.load(tmp_path / "cap.npz")
    rep = parity.compare(cap, back)
    assert rep["min_cosine"] > 1.0 - 1e-9
    assert rep["image_cosine"] > 1.0 - 1e-9


def test_reference_script_present():
    """tools/capture_reference.py ships as a real runnable file."""
    src = parity.reference_capture_script()
    assert "StableDiffusionXLPipeline" in src
    assert "callback_on_step_end" in src
    compile(src, "capture_reference.py", "exec")  # syntactically valid


def test_noise_injection_shares_xt(ref_image):
    """run_capture(noise=...) reproduces a trajectory bit-for-bit — the
    mechanism that lets ours share x_T with a diffusers capture."""
    pipe = HarmonyPipeline.random_tiny(seed=0)
    kw = dict(prompt="a dog", steps=2, height=32, width=32)
    a = parity.run_capture(pipe, ref_image, seed=7, **kw)
    b = parity.run_capture(pipe, ref_image, noise=a["noise"], seed=0, **kw)
    np.testing.assert_array_equal(a["latents"], b["latents"])


def test_parity_cli_against_reference_format(tmp_path, ref_image):
    """End-to-end CLI drill: write a capture in tools/capture_reference.py's
    npz layout (noise + post-step latents + meta json), run
    `imagharmony parity --theirs ...`, expect min_cosine == 1 (self-parity
    through the meta/noise plumbing)."""
    import json

    from imagharmony_tpu import cli

    pipe = HarmonyPipeline.random_tiny(seed=0)
    meta = dict(prompt="a dog", negative_prompt="bad", steps=2, size=32,
                guidance_scale=5.0, scheduler="euler", seed=3, ip_scale=1.0)
    cap = parity.run_capture(
        pipe, np.zeros((64, 64, 3), np.uint8), prompt=meta["prompt"],
        negative_prompt=meta["negative_prompt"], steps=meta["steps"],
        height=32, width=32, seed=meta["seed"], ip_scale=1.0,
    )
    ref = tmp_path / "ref.npz"
    # diffusers layout: latents are post-step only (no x_T entry)
    np.savez_compressed(ref, noise=cap["noise"], latents=cap["latents"][1:],
                        image=cap["image"], meta=json.dumps(meta))

    out = tmp_path / "ours.npz"
    cli.main(["parity", "--theirs", str(ref), "--save", str(out)])
    ours = parity.load(out)
    rep = parity.compare(ours, parity.load(ref))
    assert rep["min_cosine"] > 1.0 - 1e-9, rep
    assert len(rep["per_step_cosine"]) == 2


def test_parity_cli_compare_two_files(tmp_path, ref_image):
    """`imagharmony parity --ours A --theirs B` file-compare mode."""
    from imagharmony_tpu import cli

    pipe = HarmonyPipeline.random_tiny(seed=0)
    cap = parity.run_capture(pipe, ref_image, prompt="a dog", steps=2,
                             height=32, width=32)
    a, b = tmp_path / "a.npz", tmp_path / "b.npz"
    parity.save(a, cap)
    parity.save(b, cap)
    rep = cli.cmd_parity(type("A", (), {
        "ours": str(a), "theirs": str(b), "target": 0.999,
        "model_dir": None, "adapter_ckpt": None, "image_encoder_dir": None,
        "input": None, "save": None, "prompt": "", "steps": 2, "size": 32,
        "seed": 0, "scheduler": "euler"})())
    assert rep["pass"] and rep["min_cosine"] > 1 - 1e-9
