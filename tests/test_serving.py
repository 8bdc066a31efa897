"""Serving: HTTP API end-to-end against the tiny pipeline."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from imagharmony_tpu.pipelines import HarmonyPipeline, serving


@pytest.fixture(scope="module")
def server():
    pipe = HarmonyPipeline.random_tiny(seed=0)
    srv = serving.make_server(pipe, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.worker.running = False


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def _post(server, payload):
    req = urllib.request.Request(
        _url(server, "/edit"), data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}


def test_index_html(server):
    with urllib.request.urlopen(_url(server, "/"), timeout=30) as r:
        assert b"IMAGHarmony" in r.read()


def test_edit_roundtrip(server):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    out = _post(
        server,
        {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "prompt": "a dog",
            "extra_text": "six dogs",
            "steps": 2,
            "height": 32,
            "width": 32,
            "seed": 1,
        },
    )
    assert "image" in out
    png = base64.b64decode(out["image"])
    got = Image.open(io.BytesIO(png))
    assert got.size == (32, 32)


def test_edit_bad_payload(server):
    req = urllib.request.Request(
        _url(server, "/edit"), data=b"not json", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_concurrent_requests_batch(server):
    """Two compatible requests in flight: both must complete."""
    results = []

    def go(seed):
        results.append(
            _post(
                server,
                {"prompt": "a dog", "extra_text": "six dogs", "steps": 2,
                 "height": 32, "width": 32, "seed": seed},
            )
        )

    ts = [threading.Thread(target=go, args=(s,)) for s in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert len(results) == 2
    assert all("image" in r for r in results)


@pytest.fixture(scope="module")
def cont_server():
    pipe = HarmonyPipeline.random_tiny(seed=0)
    srv = serving.make_server(pipe, port=0, continuous=True, max_batch=2, chunk=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.worker.running = False


def test_continuous_http_roundtrip(cont_server):
    """HTTP layer over the continuous engine: concurrent requests complete,
    /status reports engine state."""
    from PIL import Image

    with urllib.request.urlopen(_url(cont_server, "/status"), timeout=30) as r:
        st = json.loads(r.read())
    assert st["mode"] == "continuous"

    results = []

    def go(seed):
        results.append(
            _post(cont_server, {"prompt": "a dog", "steps": 3,
                                "height": 32, "width": 32, "seed": seed})
        )

    ts = [threading.Thread(target=go, args=(s,)) for s in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert len(results) == 2
    for r in results:
        assert r.get("continuous") is True
        got = Image.open(io.BytesIO(base64.b64decode(r["image"])))
        assert got.size == (32, 32)
    assert len(cont_server.worker.admissions) == 2


def test_edit_img2img_inpaint_payload(server):
    """init_image/mask_image/strength + prediction_type/zero_snr payload
    fields (beyond the reference demo.py surface): the inpaint request runs
    per-request (never packed — generate_batch has no init-image packing)
    and returns an image; batch keys differ from plain edits."""
    from PIL import Image

    rng = np.random.default_rng(3)

    def b64(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    ref = b64(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8))
    init = b64(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    mask = np.zeros((32, 32), np.uint8)
    mask[:, 16:] = 255
    base = {
        "image": ref, "prompt": "a dog", "extra_text": "six dogs",
        "steps": 2, "height": 32, "width": 32, "seed": 5,
    }
    out = _post(server, {**base, "init_image": init, "mask_image": b64(mask),
                         "strength": 1.0})
    png = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    assert png.size == (32, 32)

    # v-prediction request exercises the parametrization passthrough
    out2 = _post(server, {**base, "prediction_type": "v_prediction",
                          "zero_snr": True, "scheduler": "ddim"})
    assert "image" in out2

    # inpaint requests must not share a batch key with plain edits
    k_plain = serving._Request(base).batch_key()
    k_inp = serving._Request({**base, "init_image": init,
                              "mask_image": b64(mask)}).batch_key()
    k_pred = serving._Request({**base, "prediction_type": "v_prediction"}).batch_key()
    assert k_plain != k_inp and k_plain != k_pred


def test_edit_schedule_shape_payload(server):
    """timestep_spacing / use_karras_sigmas / guidance_rescale / lcm payload
    fields: the --fast preset (steps + trailing spacing) and the
    distilled-checkpoint operating point (lcm + guidance 1) are reachable
    over HTTP; schedule-shape fields split the batch key."""
    from PIL import Image

    rng = np.random.default_rng(7)

    def b64(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    base = {
        "image": b64(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)),
        "prompt": "a dog", "extra_text": "six dogs",
        "steps": 2, "height": 32, "width": 32, "seed": 5,
    }
    out = _post(server, {**base, "timestep_spacing": "trailing",
                         "guidance_rescale": 0.7})
    assert "image" in out
    out2 = _post(server, {**base, "scheduler": "lcm", "steps": 2,
                          "guidance_scale": 1.0})
    assert "image" in out2
    out3 = _post(server, {**base, "scheduler": "dpm++",
                          "use_karras_sigmas": True})
    assert "image" in out3

    k_plain = serving._Request(base).batch_key()
    k_sp = serving._Request({**base, "timestep_spacing": "trailing"}).batch_key()
    k_kr = serving._Request({**base, "use_karras_sigmas": True}).batch_key()
    k_gr = serving._Request({**base, "guidance_rescale": 0.7}).batch_key()
    assert len({k_plain, k_sp, k_kr, k_gr}) == 4


def test_edit_text_to_image_payload(server):
    """A request without an image runs plain text-to-image (IP branch
    off); image and no-image requests never share a batch."""
    out = _post(server, {"prompt": "a dog", "steps": 2, "height": 32,
                         "width": 32, "seed": 9})
    assert "image" in out
    from PIL import Image
    png = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    assert png.size == (32, 32)

    k_t2i = serving._Request({"prompt": "a dog", "steps": 2}).batch_key()
    k_img = serving._Request({"prompt": "a dog", "steps": 2,
                              "image": "abcd"}).batch_key()
    assert k_t2i != k_img
