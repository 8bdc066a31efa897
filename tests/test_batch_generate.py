"""generate_batch: packed requests must match individual generate calls."""

import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (40, 40, 3), dtype=np.uint8) for _ in range(2)]


def test_batch_matches_individual(pipe, imgs):
    shared = dict(num_inference_steps=2, height=32, width=32)
    packed = pipe.generate_batch(
        imgs,
        ["a dog", "eight sheep"],
        extra_texts=["six dogs", "eight sheep"],
        seeds=[3, 4],
        **shared,
    )
    singles = [
        pipe.generate(pil_image=imgs[0], prompt="a dog", extra_text="six dogs",
                      seed=3, **shared)[0],
        pipe.generate(pil_image=imgs[1], prompt="eight sheep", extra_text="eight sheep",
                      seed=4, **shared)[0],
    ]
    assert packed.shape == (2, 32, 32, 3)
    from imagharmony_tpu.utils.parity import cosine

    for got, want in zip(packed, singles):
        # same math; bf16 batch-tiling reassociation drifts a few /255 over
        # the recurrent denoise, so compare structurally
        c = cosine(got.astype(np.float32), want.astype(np.float32))
        assert c > 0.999, c
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 8


def test_with_mesh_tensor_parallel_matches_single_device(pipe, imgs):
    """with_mesh(tensor_parallel=True): attention/FFN weights sharded over
    the `model` axis (latency scaling, beyond the reference's DP-only
    story) must produce the single-device images — GSPMD inserts the
    all-reduces on the row-parallel projections."""
    from imagharmony_tpu.parallel import mesh as mesh_lib
    from imagharmony_tpu.utils.parity import cosine

    kw = dict(pil_image=imgs[0], prompt="a dog", extra_text="six dogs",
              num_samples=2, num_inference_steps=2, height=32, width=32,
              seed=3)
    base = pipe.generate(**kw)
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    tp = pipe.with_mesh(mesh, tensor_parallel=True).generate(**kw)
    assert tp.shape == base.shape
    for got, want in zip(tp, base):
        c = cosine(got.astype(np.float32), want.astype(np.float32))
        assert c > 0.999, c
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 8


def test_batch_without_extra_text(pipe, imgs):
    out = pipe.generate_batch(imgs, ["a dog", "a cat"], num_inference_steps=2,
                              height=32, width=32)
    assert out.shape == (2, 32, 32, 3)


def test_batch_distinct_rows(pipe, imgs):
    out = pipe.generate_batch(
        imgs, ["a dog", "eight sheep"], seeds=[1, 2],
        num_inference_steps=2, height=32, width=32,
    )
    assert np.abs(out[0].astype(int) - out[1].astype(int)).max() > 0
