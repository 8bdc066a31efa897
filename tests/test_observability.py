"""Attention-map probes and profiling helpers."""

import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.utils import attn_maps, profiling


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


def test_ip_attention_maps(pipe):
    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3), dtype=np.uint8)
    maps = attn_maps.ip_attention_maps(
        pipe, img, prompt="a dog", extra_text="six dogs", latent_size=8
    )
    assert maps.shape == (pipe.cfgs.unet.num_ip_tokens, 64, 64)
    assert maps.min() >= 0.0 and maps.max() <= 1.0 + 1e-6
    # normalized per token: each map spans [0, 1]
    np.testing.assert_allclose(maps.max(axis=(1, 2)), 1.0, atol=1e-5)


def test_heatmap_to_pil(pipe):
    from PIL import Image

    maps = np.random.default_rng(1).uniform(0, 1, (2, 16, 16)).astype(np.float32)
    base = Image.fromarray(np.zeros((16, 16, 3), np.uint8))
    ims = attn_maps.heatmap_to_pil(maps, base_image=base)
    assert len(ims) == 2
    assert ims[0].size == (16, 16)


def test_compiled_stats():
    import jax.numpy as jnp

    stats = profiling.compiled_stats(lambda x: (x @ x).sum(), jnp.ones((64, 64)))
    assert stats["flops"] and stats["flops"] > 0


def test_step_timer():
    t = profiling.StepTimer()
    t.lap()
    assert t.mean >= 0


def test_cli_demo_attn_maps(tmp_path):
    """`imagharmony demo --attn-maps DIR` writes one heatmap per IP token
    (the reference's attention-map visualization surfaced on the CLI)."""
    from imagharmony_tpu import cli

    out = tmp_path / "demo.png"
    maps_dir = tmp_path / "maps"
    cli.main([
        "demo", "--output", str(out), "--attn-maps", str(maps_dir),
        "--seed", "1",
    ])
    assert out.exists()
    files = sorted(maps_dir.glob("ip_token_*.png"))
    assert len(files) == 4  # tiny config's num_ip_tokens
