"""The reference's actual demo inputs through our host + pipe paths.

Feeds the real bytes of ``/root/reference/demo/six dogs.jpg`` and
``eight sheep.png`` (the inputs the reference eyeballs its results on,
SURVEY §4) through:

* ``clip_vision.preprocess_numpy`` (the CLIPImageProcessor-parity path,
  reference ip_adapter.py:163),
* the C++ AND PIL ``native.batch_preprocess`` paths, asserting they agree
  on real photographic content (not just synthetic noise),
* a 2-step tiny-pipe ``imagharmony demo --input`` run to a PNG — the
  BASELINE config-1 shape (reference test.py:25-39) with real JPEG decode
  in the loop instead of synthetic arrays.

Skips (never fails) if the reference demo dir is absent — these tests are
about OUR code; the reference files are just realistic inputs.
"""

import os

import numpy as np
import pytest

DEMO = "/root/reference/demo"
DOGS = os.path.join(DEMO, "six dogs.jpg")
SHEEP = os.path.join(DEMO, "eight sheep.png")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(DOGS) and os.path.exists(SHEEP)),
    reason="reference demo inputs not present",
)


def _load(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def test_clip_preprocess_real_images():
    from imagharmony_tpu.models import clip_vision

    from PIL import Image

    dogs = Image.open(DOGS)
    sheep = Image.open(SHEEP)
    px = clip_vision.preprocess_numpy([dogs, sheep], image_size=224)
    assert px.shape == (2, 224, 224, 3)
    assert px.dtype == np.float32
    assert np.isfinite(px).all()
    # normalized range: (0..1 - mean)/std stays within ~[-2.2, 2.7]
    assert px.min() > -3.0 and px.max() < 3.0
    # real photos are not constant
    assert px.std(axis=(1, 2, 3)).min() > 0.1
    # uint8 array input matches the PIL input path exactly
    px2 = clip_vision.preprocess_numpy([_load(DOGS), _load(SHEEP)], image_size=224)
    np.testing.assert_array_equal(px, px2)


def test_native_matches_pil_on_real_photos():
    """C++ kernel vs PIL fallback on actual photographic bytes (the r3
    equality evidence used synthetic noise only)."""
    from imagharmony_tpu import native

    imgs = [_load(DOGS), _load(SHEEP)]
    # both demo images are square 1024², so the 224 shortest-edge resize is
    # exactly 224×224 and the only in-range (CLIP center-crop) offset is 0
    kw = dict(
        tops=[0, 0], lefts=[0, 0],
        mean=(0.48145466, 0.4578275, 0.40821073),
        std=(0.26862954, 0.26130258, 0.27577711),
    )
    fast = native.batch_preprocess(imgs, 224, **kw)
    lib, native._LIB, native._TRIED = native._LIB, None, True
    try:
        slow = native.batch_preprocess(imgs, 224, **kw)
    finally:
        native._LIB, native._TRIED = lib, True
    assert fast.shape == slow.shape == (2, 224, 224, 3)
    err = np.abs(fast - slow)
    # bilinear rounding differences only; photographic content is smooth so
    # the agreement is tighter than the synthetic-noise test's bound
    assert np.median(err) < 0.02, np.median(err)
    assert err.mean() < 0.05, err.mean()


def test_cli_demo_on_real_demo_input(tmp_path):
    """2-step tiny-pipe edit of the real `six dogs.jpg` via the CLI."""
    from PIL import Image

    from imagharmony_tpu import cli

    out = str(tmp_path / "edited.png")
    cli.main([
        "demo",
        "--input", DOGS,
        "--prompt", "six cats sitting on the grass",
        "--extra-text", "six dogs",
        "--steps", "2",
        "--height", "32",
        "--width", "32",
        "--seed", "7",
        "--output", out,
    ])
    im = Image.open(out)
    assert im.size == (32, 32)
    arr = np.asarray(im)
    assert arr.shape == (32, 32, 3)
    assert arr.std() > 0  # not a constant image
