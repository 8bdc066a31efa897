"""PNS: batched multi-seed candidates + CLIP scoring + argmax selection."""

import jax.numpy as jnp
import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline, pns


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


@pytest.fixture(scope="module")
def ref_image():
    return np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)


def test_clip_scores_shape_and_range(pipe):
    imgs = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32))
    ids_g = pipe._tokenize("a dog")[1]
    s = pns.clip_scores(pipe.params, pipe.cfgs, imgs, ids_g, policy=pipe.policy)
    assert s.shape == (3,)
    assert (np.abs(np.asarray(s)) <= 1.0 + 1e-5).all()


def test_pns_picks_argmax(pipe, ref_image):
    best, images, scores = pns.generate_with_pns(
        pipe,
        ref_image,
        num_seeds=3,
        prompt="a dog",
        extra_text="six dogs",
        num_inference_steps=2,
        height=32,
        width=32,
        return_all=True,
        output_type="np",
    )
    assert len(images) == 3
    assert scores.shape == (3,)
    np.testing.assert_array_equal(best, images[int(np.argmax(scores))])


def test_pns_deterministic(pipe, ref_image):
    a = pns.generate_with_pns(
        pipe, ref_image, num_seeds=2, prompt="a dog", extra_text="six dogs",
        num_inference_steps=2, height=32, width=32, output_type="np", seed=5,
    )
    b = pns.generate_with_pns(
        pipe, ref_image, num_seeds=2, prompt="a dog", extra_text="six dogs",
        num_inference_steps=2, height=32, width=32, output_type="np", seed=5,
    )
    np.testing.assert_array_equal(a, b)
