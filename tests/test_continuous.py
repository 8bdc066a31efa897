"""Chunked denoising + continuous batching (pipelines/continuous.py)."""

import threading
import time

import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline
from imagharmony_tpu.pipelines import continuous as cont
from imagharmony_tpu.pipelines import harmony_edit as he


@pytest.fixture(scope="module")
def pipe():
    return HarmonyPipeline.random_tiny(seed=0)


@pytest.fixture(scope="module")
def ref_image():
    return np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)


KW = dict(prompt="a dog", extra_text="six dogs", num_inference_steps=4,
          height=32, width=32, seed=9)


def test_chunked_matches_one_jit(pipe, ref_image):
    """The chunked runner must reproduce the one-jit scan pipeline exactly
    (same per-row math on gathered constants)."""
    a = pipe.generate(pil_image=ref_image, output_type="np", **KW)
    b = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=2, **KW)
    np.testing.assert_array_equal(a, b)
    # uneven chunking (3 does not divide 4) must not change the result
    c = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=3, **KW)
    np.testing.assert_array_equal(a, c)


def test_chunked_matches_one_jit_multi_sample(pipe, ref_image):
    """Scalar seed + num_samples>1: both paths must draw all rows from ONE
    PRNGKey (harmony_edit generate's scalar-seed branch), so the chunked
    runner returns bit-identical images — and seed=9 row 1 must NOT equal
    seed=10 row 0 (the old seed+i derivation collided there)."""
    kw = dict(KW, num_samples=2)
    a = pipe.generate(pil_image=ref_image, output_type="np", **kw)
    b = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=2, **kw)
    np.testing.assert_array_equal(a, b)
    kw10 = dict(kw, seed=10)
    d = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=2, **kw10)
    assert not np.array_equal(b[1], d[0])
    # per-sample seed lists keep per-row keys on both paths
    kwl = dict(KW, num_samples=2, seed=[3, 4])
    e = pipe.generate(pil_image=ref_image, output_type="np", **kwl)
    f = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=2, **kwl)
    np.testing.assert_array_equal(e, f)


def test_progress_callback_fires(pipe, ref_image):
    """callback_on_step_end fires at chunk boundaries with rising steps —
    the reference's Gradio progress role (demo.py:112,127)."""
    seen = []
    pipe.generate(
        pil_image=ref_image, output_type="np",
        callback_on_step_end=lambda i, lat: seen.append((i, lat.shape)),
        chunk_steps=1, **KW,
    )
    steps = [s for s, _ in seen]
    assert steps == [1, 2, 3, 4]
    assert all(shape[0] == 1 for _, shape in seen)  # latent rows visible


def test_slot_engine_mid_flight_admission(pipe, ref_image):
    """A request admitted after chunks have run joins the SAME device batch
    and both finish with per-request results."""
    opts = he.EditOptions(height=32, width=32, num_inference_steps=4,
                          use_harmony=False)
    eng = cont.SlotEngine(pipe, opts, slots=2, chunk=1)
    eng.admit("A", pil_image=ref_image, prompt="a dog", seed=1)
    eng.run_chunk()  # A at step 1
    assert eng.progress()[0] == 1
    eng.admit("B", pil_image=ref_image, prompt="a cat", seed=2)
    assert eng.progress()[1] == 0  # B joined mid-flight at step 0
    results = {}
    for _ in range(8):
        eng.run_chunk()
        for tok, img in eng.harvest():
            results[tok] = img
        if len(results) == 2:
            break
    assert set(results) == {"A", "B"}
    # A finished one chunk before B started -> staggered completion worked
    assert results["A"].shape == (32, 32, 3)

    # per-row isolation: B's mid-flight result equals a solo run of B
    solo = cont.SlotEngine(pipe, opts, slots=2, chunk=1)
    solo.admit("B", pil_image=ref_image, prompt="a cat", seed=2)
    out = {}
    for _ in range(8):
        solo.run_chunk()
        for tok, img in solo.harvest():
            out[tok] = img
        if out:
            break
    np.testing.assert_array_equal(results["B"], out["B"])


def test_continuous_worker_end_to_end(pipe):
    """ContinuousWorker: mid-flight admission observable via .admissions,
    and an injected failure surfaces as a logged per-request error."""
    from imagharmony_tpu.pipelines import serving

    worker = serving.ContinuousWorker(pipe, max_batch=2, chunk=1)
    worker.start()
    try:
        payload = dict(prompt="a dog", steps=4, height=32, width=32, seed=1)
        r1 = worker.submit(dict(payload))
        # give the engine time to start stepping r1, then submit r2
        deadline = time.time() + 60
        while not worker.admissions and time.time() < deadline:
            time.sleep(0.05)
        r2 = worker.submit(dict(payload, seed=2, prompt="a cat"))
        assert r1.event.wait(120) and r2.event.wait(120)
        assert r1.error is None and r2.error is None
        assert r1.result["continuous"] and r2.result["continuous"]
        # at least one admission happened while the engine was mid-flight
        # OR both were admitted at step 0 in the same engine (tiny model can
        # finish 4 steps faster than the submit gap — accept either, but the
        # admissions log must show two entries)
        assert len(worker.admissions) == 2
    finally:
        worker.running = False


@pytest.fixture(scope="module")
def cn_pipe():
    """Tiny pipeline with a live (non-zero) ControlNet."""
    import dataclasses

    from imagharmony_tpu.models import controlnet as cn_lib
    from imagharmony_tpu.models import tokenizer as tok_lib
    from imagharmony_tpu.pipelines import components as comp

    toy = tok_lib.build_toy_tokenizer()
    base = comp.tiny_configs(vocab_size=len(toy.encoder))
    ccfg = cn_lib.ControlNetConfig(
        base=base.unet, conditioning_embedding_channels=(8, 16)
    )
    cfgs = dataclasses.replace(base, controlnet=ccfg)
    params = comp.init_params(0, cfgs)
    for zc in params["controlnet"]["controlnet_down_blocks"]:
        zc["weight"] = np.full_like(zc["weight"], 0.05)
    emb_out = params["controlnet"]["controlnet_cond_embedding"]["conv_out"]
    emb_out["weight"] = np.full_like(emb_out["weight"], 0.01)
    return HarmonyPipeline(params, cfgs, tok_lib.SDXLTokenizers(toy, toy))


def test_chunked_controlnet_matches_one_jit(cn_pipe, ref_image):
    """The ControlNet branch runs inside the chunked engine and reproduces
    the one-jit scan exactly (closes the round-2 continuous/CN gap)."""
    cond = np.random.default_rng(3).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = cn_pipe.generate(pil_image=ref_image, control_image=cond,
                         output_type="np", **KW)
    b = cn_pipe.generate(pil_image=ref_image, control_image=cond,
                         output_type="np", chunk_steps=3, **KW)
    np.testing.assert_array_equal(a, b)
    # the live CN actually steers: chunked output with cond differs from
    # the chunked output without it (engine built without the CN branch)
    c = cn_pipe.generate(pil_image=ref_image, output_type="np",
                         chunk_steps=3, **KW)
    assert np.abs(b.astype(int) - c.astype(int)).max() > 0


def test_slot_engine_controlnet_mid_flight(cn_pipe, ref_image):
    """Per-row control images: two requests with different conds joined
    mid-flight each match their solo runs."""
    rng = np.random.default_rng(5)
    cond_a = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    cond_b = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    opts = he.EditOptions(height=32, width=32, num_inference_steps=4,
                          use_harmony=False)

    def run(jobs, slots=2):
        eng = cont.SlotEngine(cn_pipe, opts, slots=slots, chunk=1)
        out = {}
        started = []
        for _ in range(12):
            for tok, kw in jobs:
                if tok not in started and eng.free_slots():
                    eng.admit(tok, pil_image=ref_image, **kw)
                    started.append(tok)
            eng.run_chunk()
            for tok, img in eng.harvest():
                out[tok] = img
            if len(out) == len(jobs):
                break
        return out

    both = run([("A", dict(prompt="a dog", seed=1, control_image=cond_a)),
                ("B", dict(prompt="a cat", seed=2, control_image=cond_b))])
    solo_a = run([("A", dict(prompt="a dog", seed=1, control_image=cond_a))])
    solo_b = run([("B", dict(prompt="a cat", seed=2, control_image=cond_b))])
    np.testing.assert_array_equal(both["A"], solo_a["A"])
    np.testing.assert_array_equal(both["B"], solo_b["B"])
    # different conds produce different rows
    assert np.abs(both["A"].astype(int) - both["B"].astype(int)).max() > 0


def test_generate_batch_controlnet_matches_single(cn_pipe, ref_image):
    """Packed batching with per-request control images == per-request runs."""
    rng = np.random.default_rng(7)
    conds = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(2)]
    kw = dict(num_inference_steps=2, height=32, width=32)
    packed = cn_pipe.generate_batch(
        [ref_image, ref_image], ["a dog", "a cat"],
        extra_texts=["six dogs", "six cats"], seeds=[1, 2],
        control_images=conds, **kw,
    )
    from imagharmony_tpu.utils.parity import cosine

    for i, (prompt, extra) in enumerate([("a dog", "six dogs"),
                                         ("a cat", "six cats")]):
        single = cn_pipe.generate(
            pil_image=ref_image, prompt=prompt, extra_text=extra,
            seed=[1, 2][i], control_image=conds[i], **kw,
        )
        # same math; batch-tiling reassociation drifts a few /255 (same
        # tolerance as test_batch_generate.test_batch_matches_individual)
        c = cosine(packed[i].astype(np.float32), single[0].astype(np.float32))
        assert c > 0.999, c
        assert np.abs(packed[i].astype(int) - single[0].astype(int)).max() <= 8


def test_continuous_worker_batch_key_change_drains(pipe):
    """A request with a DIFFERENT batch key submitted after the engine went
    idle must drain the old engine and be served by a fresh one (regression:
    the drain only fired when `pending` was empty, deadlocking this case)."""
    from imagharmony_tpu.pipelines import serving

    worker = serving.ContinuousWorker(pipe, max_batch=2, chunk=2)
    worker.start()
    try:
        r1 = worker.submit(dict(prompt="a dog", steps=4, height=32, width=32))
        assert r1.event.wait(120) and r1.error is None
        # different steps -> different batch key -> needs a new engine
        r2 = worker.submit(dict(prompt="a cat", steps=3, height=32, width=32))
        assert r2.event.wait(120), "key-changing request never served (drain bug)"
        assert r2.error is None
    finally:
        worker.running = False


def test_continuous_worker_fairness_no_starvation(pipe):
    """Same-key traffic arriving AFTER a mismatched-key request must not
    starve it: past the fairness timeout, service degrades to FIFO-by-wait,
    so the engine drains and the mismatched request runs before the younger
    same-key backlog (previously it waited for a full drain that steady
    traffic never allowed)."""
    from imagharmony_tpu.pipelines import serving

    worker = serving.ContinuousWorker(
        pipe, max_batch=1, chunk=1, fairness_timeout_s=0.0
    )
    worker.start()
    try:
        a_key = dict(prompt="a dog", steps=4, height=32, width=32)
        r1 = worker.submit(dict(a_key))
        # mismatched key (different steps); timeout 0 -> starved immediately
        rb = worker.submit(dict(prompt="a cat", steps=3, height=32, width=32))
        time.sleep(0.5)  # let the worker stamp rb's wait-start first
        # same-key traffic behind the mismatched request (max_batch=1: these
        # would keep the engine busy forever under the old drain-only rule)
        backlog = [worker.submit(dict(a_key, seed=i)) for i in range(3)]
        assert rb.event.wait(240), "mismatched-key request starved"
        assert rb.error is None
        # FIFO held: at B's completion the younger backlog is not all done
        assert any(not r.event.is_set() for r in backlog)
        for r in backlog:
            assert r.event.wait(240) and r.error is None
        assert r1.event.wait(240) and r1.error is None
    finally:
        worker.running = False


def test_continuous_worker_surfaces_errors(pipe):
    from imagharmony_tpu.pipelines import serving

    worker = serving.ContinuousWorker(pipe, max_batch=2, chunk=1)
    worker.start()
    try:
        # steps=0 -> engine init fails loudly, error returned to the client
        bad = worker.submit(dict(prompt="a dog", steps=0, height=32, width=32))
        assert bad.event.wait(60)
        assert bad.error is not None
    finally:
        worker.running = False


def test_chunked_turbo_matches_one_jit(pipe, ref_image):
    """Encoder propagation (--turbo) composes with the chunked runner:
    chunks are aligned to encoder key steps (chunk % interval == 0), so
    every row enters a chunk at a position ≡ 0 mod interval and the local
    key-step pattern equals the one-jit path's global pattern — outputs are
    bit-identical, including through the progress callback."""
    for interval in (2, 3):
        kw = dict(KW, encoder_interval=interval)
        a = pipe.generate(pil_image=ref_image, output_type="np", **kw)
        seen = []
        b = pipe.generate(
            pil_image=ref_image, output_type="np", chunk_steps=interval,
            callback_on_step_end=lambda i, lat: seen.append(i), **kw,
        )
        np.testing.assert_array_equal(a, b)
        assert seen[-1] == KW["num_inference_steps"]  # ran to completion
        # a non-multiple chunk_steps is rounded up to the key-step quantum
        # (chunk granularity never changes outputs)
        c = pipe.generate(pil_image=ref_image, output_type="np",
                          chunk_steps=interval + 1, **kw)
        np.testing.assert_array_equal(a, c)
    # turbo is a real approximation: interval=2 differs from the exact path
    exact = pipe.generate(pil_image=ref_image, output_type="np", **KW)
    turbo = pipe.generate(pil_image=ref_image, output_type="np",
                          **dict(KW, encoder_interval=2))
    assert not np.array_equal(exact, turbo)


def test_slot_engine_turbo_mid_flight(pipe, ref_image):
    """Mid-flight admission under turbo: a row admitted at a later chunk
    boundary still reproduces its solo run bit-for-bit (its local key-step
    pattern is position-aligned), and a misaligned chunk is rejected."""
    opts = he.EditOptions(height=32, width=32, num_inference_steps=4,
                          use_harmony=False, encoder_interval=2)
    with pytest.raises(ValueError, match="multiple of"):
        cont.SlotEngine(pipe, opts, slots=2, chunk=3)

    def run(jobs):
        eng = cont.SlotEngine(pipe, opts, slots=2, chunk=2)
        out = {}
        started = []
        for _ in range(8):
            for tok, kw in jobs:
                if tok not in started and eng.free_slots():
                    eng.admit(tok, pil_image=ref_image, **kw)
                    started.append(tok)
                    break  # stagger: at most one admission per chunk
            eng.run_chunk()
            for tok, img in eng.harvest():
                out[tok] = img
            if len(out) == len(jobs):
                break
        return out

    both = run([("A", dict(prompt="a dog", seed=1)),
                ("B", dict(prompt="a cat", seed=2))])
    solo_a = run([("A", dict(prompt="a dog", seed=1))])
    solo_b = run([("B", dict(prompt="a cat", seed=2))])
    np.testing.assert_array_equal(both["A"], solo_a["A"])
    np.testing.assert_array_equal(both["B"], solo_b["B"])


def test_chunked_turbo_controlnet_matches_one_jit(cn_pipe, ref_image):
    """Turbo × chunked × ControlNet: the cached mid-block residual is
    re-applied on reuse steps exactly as the one-jit propagated path."""
    cond = np.random.default_rng(3).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    kw = dict(KW, encoder_interval=2)
    a = cn_pipe.generate(pil_image=ref_image, control_image=cond,
                         output_type="np", **kw)
    b = cn_pipe.generate(pil_image=ref_image, control_image=cond,
                         output_type="np", chunk_steps=2, **kw)
    np.testing.assert_array_equal(a, b)


def test_continuous_worker_turbo_payload(pipe):
    """A payload carrying encoder_interval runs through continuous serving;
    the engine chunk is aligned up to the key-step quantum."""
    from imagharmony_tpu.pipelines import serving

    worker = serving.ContinuousWorker(pipe, max_batch=2, chunk=1)
    worker.start()
    try:
        payload = dict(prompt="a dog", steps=4, height=32, width=32, seed=1,
                       encoder_interval=2)
        r = worker.submit(payload)
        assert r.event.wait(180)
        assert r.error is None
        assert worker._engine is not None and worker._engine.chunk == 2
        assert worker._engine.opts.encoder_interval == 2
    finally:
        worker.running = False


def test_chunked_dpmpp_matches_one_jit(pipe, ref_image):
    """DPM-Solver++ 2M through the chunked runner: the multistep history
    (previous x0 prediction + log-sigma) is carried ACROSS chunk boundaries
    per row, so outputs are bit-identical to the one-jit scan — including
    composed with encoder propagation (--turbo)."""
    kw = dict(KW, scheduler="dpm++")
    a = pipe.generate(pil_image=ref_image, output_type="np", **kw)
    seen = []
    b = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=2,
                      callback_on_step_end=lambda i, lat: seen.append(i), **kw)
    np.testing.assert_array_equal(a, b)
    assert seen[-1] == KW["num_inference_steps"]
    # uneven chunking (3 does not divide 4) exercises a boundary mid-history
    c = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=3, **kw)
    np.testing.assert_array_equal(a, c)
    # x turbo: per-row state + encoder cache compose
    t1 = pipe.generate(pil_image=ref_image, output_type="np",
                       **dict(kw, encoder_interval=2))
    t2 = pipe.generate(pil_image=ref_image, output_type="np", chunk_steps=2,
                       **dict(kw, encoder_interval=2))
    np.testing.assert_array_equal(t1, t2)
    # dpm++ is a different solver: outputs differ from euler
    e = pipe.generate(pil_image=ref_image, output_type="np", **KW)
    assert not np.array_equal(a, e)


def test_slot_engine_dpmpp_mid_flight_state_reset(pipe, ref_image):
    """Mid-flight admission under dpm++: a row admitted into a batch whose
    other row already has solver history must start with a FRESH first-order
    step (state reset in _write_slot) — its output must equal its solo run
    bit-for-bit."""
    opts = he.EditOptions(height=32, width=32, num_inference_steps=4,
                          use_harmony=False, scheduler="dpm++")

    def run(jobs):
        eng = cont.SlotEngine(pipe, opts, slots=2, chunk=2)
        out = {}
        started = []
        for _ in range(8):
            for tok, kw in jobs:
                if tok not in started and eng.free_slots():
                    eng.admit(tok, pil_image=ref_image, **kw)
                    started.append(tok)
                    break  # stagger: at most one admission per chunk
            eng.run_chunk()
            for tok, img in eng.harvest():
                out[tok] = img
            if len(out) == len(jobs):
                break
        return out

    both = run([("A", dict(prompt="a dog", seed=1)),
                ("B", dict(prompt="a cat", seed=2))])
    solo_a = run([("A", dict(prompt="a dog", seed=1))])
    solo_b = run([("B", dict(prompt="a cat", seed=2))])
    np.testing.assert_array_equal(both["A"], solo_a["A"])
    np.testing.assert_array_equal(both["B"], solo_b["B"])
