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


def test_pns_mesh_fanout_matches_single_device(pipe, ref_image):
    """PNS over a with_mesh clone: 8 candidate seeds sharded over the
    8-device data axis produce the same scores/winner as the one-device
    batch (SURVEY.md §2: PNS multi-seed fan-out is the DP-over-ICI case)."""
    from imagharmony_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()  # (8, 1) on the virtual CPU devices
    kw = dict(num_seeds=8, prompt="a dog", extra_text="six dogs",
              num_inference_steps=2, height=32, width=32, seed=4,
              return_all=True, output_type="np")
    best_s, images_s, scores_s = pns.generate_with_pns(pipe, ref_image, **kw)
    best_m, images_m, scores_m = pns.generate_with_pns(
        pipe.with_mesh(mesh), ref_image, **kw
    )
    # GSPMD retiles within-row reductions for the partitioned program, so
    # the 2-step recurrence drifts a little — same tolerance class as the
    # packed-batch parity tests (test_batch_generate)
    np.testing.assert_allclose(scores_m, scores_s, atol=5e-3)
    assert int(np.argmax(scores_m)) == int(np.argmax(scores_s))
    from imagharmony_tpu.utils.parity import cosine

    for a, b in zip(images_m, images_s):
        assert cosine(a.astype(np.float32), b.astype(np.float32)) > 0.999
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 8


def test_with_mesh_nondivisible_batch_replicates(pipe, ref_image):
    """Row counts that don't divide the data axis still run (replicated)."""
    from imagharmony_tpu.parallel import mesh as mesh_lib

    out = pns.generate_with_pns(
        pipe.with_mesh(mesh_lib.make_mesh()), ref_image, num_seeds=3,
        prompt="a dog", extra_text="six dogs", num_inference_steps=2,
        height=32, width=32, output_type="np",
    )
    assert out.shape == (32, 32, 3)


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
