"""End-to-end edit pipeline tests on the tiny random bundle.

The TPU analog of the reference's eyeball test (demo/ images): a few-step
edit must run jitted end-to-end and respond to its controls.
"""

import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline

STEPS = 2
RES = 32


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


@pytest.fixture(scope="module")
def ref_image():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)


def _gen(pipe, ref_image, **kw):
    base = dict(
        prompt="a dog",
        extra_text="six dogs",
        num_inference_steps=STEPS,
        height=RES,
        width=RES,
        seed=7,
        output_type="np",
    )
    base.update(kw)
    return pipe.generate(pil_image=ref_image, **base)


def test_end_to_end_shapes(pipe, ref_image):
    out = _gen(pipe, ref_image)
    assert out.shape == (1, RES, RES, 3)
    assert out.dtype == np.uint8


def test_deterministic_per_seed(pipe, ref_image):
    a = _gen(pipe, ref_image, seed=3)
    b = _gen(pipe, ref_image, seed=3)
    np.testing.assert_array_equal(a, b)
    c = _gen(pipe, ref_image, seed=4)
    assert np.abs(a.astype(int) - c.astype(int)).max() > 0


def test_extra_text_changes_output(pipe, ref_image):
    a = _gen(pipe, ref_image, extra_text="six dogs")
    b = _gen(pipe, ref_image, extra_text="eight sheep")
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_ip_scale_window_off_equals_scale_zero(pipe, ref_image):
    """control_guidance window of zero length ≡ scale=0
    (reference custom_pipelines.py:319-329 semantics)."""
    a = _gen(pipe, ref_image, scale=0.0)
    b = _gen(pipe, ref_image, scale=1.0, control_guidance_end=0.0)
    np.testing.assert_array_equal(a, b)


def test_num_samples(pipe, ref_image):
    out = _gen(pipe, ref_image, num_samples=2)
    assert out.shape == (2, RES, RES, 3)
    # different noise per sample
    assert np.abs(out[0].astype(int) - out[1].astype(int)).max() > 0


def test_ddim_scheduler_runs(pipe, ref_image):
    out = _gen(pipe, ref_image, scheduler="ddim")
    assert out.shape == (1, RES, RES, 3)


def test_resampler_variant_runs(ref_image):
    pipe = HarmonyPipeline.random_tiny(seed=1, proj_kind="resampler")
    out = _gen(pipe, ref_image, extra_text=None)
    assert out.shape == (1, RES, RES, 3)


def test_pil_output(pipe, ref_image):
    imgs = _gen(pipe, ref_image, output_type="pil")
    assert len(imgs) == 1
    assert imgs[0].size == (RES, RES)
