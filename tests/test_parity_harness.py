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
    assert "StableDiffusionXLPipeline" in parity.REFERENCE_CAPTURE_SCRIPT
