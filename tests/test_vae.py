"""VAE round-trip and tiled-decode tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.models import vae

CFG = vae.tiny_config()
FP32 = dtypes.FP32


def test_encode_decode_shapes():
    params = vae.init(jax.random.PRNGKey(0), CFG)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    lat = vae.encode(params, CFG, img, jax.random.PRNGKey(2), policy=FP32)
    assert lat.shape == (2, 32 // CFG.downscale, 32 // CFG.downscale, 4)
    out = vae.decode(params, CFG, lat, policy=FP32)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_deterministic_encode():
    params = vae.init(jax.random.PRNGKey(0), CFG)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    a = vae.encode(params, CFG, img, sample=False, policy=FP32)
    b = vae.encode(params, CFG, img, sample=False, policy=FP32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiled_decode_matches_full_in_interior():
    """Tiled decode should agree with the monolithic decode away from seams
    (exact equality is impossible: conv halo at tile borders)."""
    params = vae.init(jax.random.PRNGKey(0), CFG)
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 24, 4)) * 0.5
    full = np.asarray(vae.decode(params, CFG, lat, policy=FP32))
    tiled = np.asarray(
        vae.decode_tiled(params, CFG, lat, tile_latent_size=16, overlap=8, policy=FP32)
    )
    assert tiled.shape == full.shape
    err = np.abs(full - tiled)
    # Interior crop: same result up to blend-region edge effects.
    assert np.median(err) < 5e-2
    assert np.isfinite(tiled).all()
