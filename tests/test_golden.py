"""Golden regression: the fp32 tiny-pipeline trajectory is pinned.

Catches silent numeric drift across refactors/rounds: any change to the
model math, schedulers, init RNG stream, or pipeline plumbing that alters
outputs must be an intentional, reviewed update of the golden.
"""

import numpy as np

from imagharmony_tpu import dtypes
from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.utils import parity

GOLDEN = "tests/goldens/tiny_edit_fp32.npz"


def test_tiny_edit_matches_golden():
    pipe = HarmonyPipeline.random_tiny(seed=0)
    pipe.policy = dtypes.FP32
    img = np.random.default_rng(0).integers(0, 255, (48, 48, 3), dtype=np.uint8)
    cap = parity.run_capture(pipe, img, prompt="a dog", extra_text="six dogs",
                             steps=3, height=32, width=32, seed=5)
    gold = parity.load(GOLDEN)
    rep = parity.compare(cap, gold)
    assert rep["min_cosine"] > 0.9999, rep
    assert rep["image_cosine"] > 0.9999, rep
