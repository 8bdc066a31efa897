"""SD1.5 family end-to-end: single text tower, vanilla IP on all layers."""

import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny_sd15(seed=0)


@pytest.fixture(scope="module")
def ref_image():
    return np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)


def test_sd15_end_to_end(pipe, ref_image):
    out = pipe.generate(pil_image=ref_image, prompt="a dog",
                        num_inference_steps=2, height=32, width=32, seed=7)
    assert out.shape == (1, 32, 32, 3)
    assert out.dtype == np.uint8


def test_sd15_image_prompt_steers(pipe, ref_image):
    """Vanilla IP-Adapter: scale must matter (IP on every cross-attn layer)."""
    a = pipe.generate(pil_image=ref_image, prompt="a dog", scale=1.0,
                      num_inference_steps=2, height=32, width=32, seed=7)
    b = pipe.generate(pil_image=ref_image, prompt="a dog", scale=0.0,
                      num_inference_steps=2, height=32, width=32, seed=7)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_sd15_deterministic(pipe, ref_image):
    a = pipe.generate(pil_image=ref_image, prompt="a dog",
                      num_inference_steps=2, height=32, width=32, seed=3)
    b = pipe.generate(pil_image=ref_image, prompt="a dog",
                      num_inference_steps=2, height=32, width=32, seed=3)
    np.testing.assert_array_equal(a, b)


def test_sd15_no_harmony_params(pipe):
    assert "harmony" not in pipe.params
    assert "text_encoder_2" not in pipe.params
    assert pipe.cfgs.family == "sd15"
