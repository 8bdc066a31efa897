"""Batched multi-prompt editing service (the reference demo.py path).

The reference serves one request at a time through a Gradio UI
(reference demo.py:146-190). This is a dependency-free equivalent:
a stdlib HTTP server with a minimal HTML front end and a JSON API, plus a
micro-batching queue — concurrent requests with identical static options
(size/steps/scheduler) are packed onto the device batch axis and denoised
together (CFG pairs per request), which is where TPU serving throughput
comes from.

API:
  GET  /           -> HTML demo page
  GET  /healthz    -> {"ok": true}
  POST /edit       -> JSON {image: b64, prompt, extra_text, negative_prompt,
                      scale, guidance_scale, steps, seed, height, width}
                      -> {"image": b64 PNG, "seconds": float}
"""

from __future__ import annotations

import base64
import io
import json
import logging
import queue
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

log = logging.getLogger("imagharmony.serving")

_HTML = """<!doctype html><title>IMAGHarmony-TPU</title>
<h2>IMAGHarmony-TPU — quantity & layout consistent editing</h2>
<form id=f>
<input type=file id=img accept=image/*><br>
prompt: <input id=prompt value="a dog" size=40><br>
extra text: <input id=extra value="six dogs" size=40><br>
steps: <input id=steps value=30 size=4> scale: <input id=scale value=1.0 size=4>
guidance: <input id=cfg value=5.0 size=4> seed: <input id=seed value=42 size=6><br>
<button type=submit>Edit</button></form>
<p id=status></p><img id=out style="max-width:512px">
<script>
f.onsubmit = async (e) => {
  e.preventDefault(); status.textContent = 'running...';
  const file = img.files[0];
  const b64 = file ? await new Promise(r => {const fr=new FileReader();
    fr.onload=()=>r(fr.result.split(',')[1]); fr.readAsDataURL(file);}) : null;
  const body = {image: b64, prompt: prompt.value, extra_text: extra.value,
    steps: +steps.value, scale: +scale.value, guidance_scale: +cfg.value, seed: +seed.value};
  const resp = await fetch('/edit', {method:'POST', body: JSON.stringify(body)});
  const j = await resp.json();
  if (j.error) { status.textContent = 'error: ' + j.error; return; }
  out.src = 'data:image/png;base64,' + j.image;
  status.textContent = j.seconds.toFixed(1) + 's';
};
</script>"""


class _Request:
    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error = None

    def batch_key(self):
        p = self.payload
        return (
            int(p.get("height", 1024)),
            int(p.get("width", 1024)),
            int(p.get("steps", 30)),
            str(p.get("scheduler", "euler")),
            float(p.get("guidance_scale", 5.0)),
            float(p.get("scale", 1.0)),
            # ControlNet participation is a static program property: only
            # requests agreeing on it (and its scale) share a device batch
            bool(p.get("control_image")),
            float(p.get("controlnet_scale", 1.0)),
            # encoder propagation (--turbo) changes the jitted program AND
            # the outputs — never mix intervals within a batch
            int(p.get("encoder_interval", 1)),
            # UNet parametrization is a program property too
            str(p.get("prediction_type", "epsilon")),
            bool(p.get("zero_snr")),
            # schedule shape (the --fast preset over HTTP: steps=15 +
            # timestep_spacing=trailing) and CFG rescale are program
            # properties as well
            str(p.get("timestep_spacing", "leading")),
            bool(p.get("use_karras_sigmas")),
            float(p.get("guidance_rescale", 0.0)),
            int(p.get("clip_skip", 0)),
            # weighted prompts run per-request (generate_batch has no
            # per-row weight packing); key them apart
            bool(p.get("prompt_weighting")),
            # text-to-image (no reference image) is a different program
            # than an IP-conditioned edit — never mix in one batch
            bool(p.get("image")),
            # img2img/inpainting requests run per-request (generate_batch
            # has no init-image packing); key them apart so they never
            # try to pack with plain edits
            bool(p.get("init_image")),
            bool(p.get("mask_image")),
        )


class BatchingWorker(threading.Thread):
    """Packs compatible queued requests into one device batch.

    Requests sharing a batch_key (same static jit signature) are merged up
    to ``max_batch``; each request contributes its own image/prompt/seed
    row. Groups run back-to-back on the single device program.
    """

    def __init__(self, pipe, *, max_batch=4, max_wait_s=0.05):
        super().__init__(daemon=True)
        self.pipe = pipe
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.running = True
        self.pack_errors = 0  # observable packed-path failure count

    def submit(self, payload) -> _Request:
        req = _Request(payload)
        self.q.put(req)
        return req

    def run(self):
        while self.running:
            try:
                first = self.q.get(timeout=0.2)
            except queue.Empty:
                continue
            group = [first]
            deadline = time.time() + self.max_wait_s
            while len(group) < self.max_batch and time.time() < deadline:
                try:
                    nxt = self.q.get(timeout=max(0.0, deadline - time.time()))
                except queue.Empty:
                    break
                if nxt.batch_key() == first.batch_key():
                    group.append(nxt)
                else:
                    self.q.put(nxt)
                    break
            self._run_group(group)

    def _run_group(self, group):
        if len(group) > 1 and not (
            group[0].payload.get("init_image")
            or group[0].payload.get("mask_image")
            or group[0].payload.get("prompt_weighting")
        ):
            try:
                self._run_packed(group)
                return
            except Exception:
                # Fall back to per-request, but LOUDLY: a shape/packing bug
                # in generate_batch must surface, not hide as a silent
                # per-request fallback.
                log.error(
                    "packed batch of %d failed; falling back to per-request:\n%s",
                    len(group), traceback.format_exc(),
                )
                self.pack_errors += 1
        for req in group:
            try:
                req.result = self._run_one(req.payload)
            except Exception as e:  # surfaces to the HTTP client
                req.error = f"{type(e).__name__}: {e}"
            req.event.set()

    def _run_packed(self, group):
        """Pack compatible requests into ONE device program
        (HarmonyPipeline.generate_batch): 2B CFG rows, one dispatch."""
        import base64 as b64mod
        import io as iomod

        t0 = time.time()
        payloads = [r.payload for r in group]
        imgs = [_payload_image(p) for p in payloads]
        first = payloads[0]
        extra_texts = [p.get("extra_text") or None for p in payloads]
        if any(e is None for e in extra_texts) and any(e is not None for e in extra_texts):
            raise ValueError("mixed extra_text presence; fall back")
        control_images = None
        if first.get("control_image"):  # batch_key guarantees all-or-none
            control_images = [_payload_control(p) for p in payloads]
        outs = self.pipe.generate_batch(
            imgs,
            [p.get("prompt") or None for p in payloads],
            extra_texts=extra_texts if extra_texts[0] is not None else None,
            negative_prompts=[p.get("negative_prompt") or None for p in payloads],
            seeds=[int(p.get("seed", 42)) for p in payloads],
            control_images=control_images,
            num_inference_steps=int(first.get("steps", 30)),
            guidance_scale=float(first.get("guidance_scale", 5.0)),
            scale=float(first.get("scale", 1.0)),
            controlnet_scale=float(first.get("controlnet_scale", 1.0)),
            height=int(first.get("height", 1024)),
            width=int(first.get("width", 1024)),
            scheduler=str(first.get("scheduler", "euler")),
            encoder_interval=int(first.get("encoder_interval", 1)),
            prediction_type=str(first.get("prediction_type", "epsilon")),
            rescale_zero_snr=bool(first.get("zero_snr")),
            timestep_spacing=str(first.get("timestep_spacing", "leading")),
            use_karras=bool(first.get("use_karras_sigmas")),
            guidance_rescale=float(first.get("guidance_rescale", 0.0)),
            clip_skip=int(first.get("clip_skip", 0)),
            output_type="pil",
        )
        dt = time.time() - t0
        for req, im in zip(group, outs):
            buf = iomod.BytesIO()
            im.save(buf, format="PNG")
            req.result = {
                "image": b64mod.b64encode(buf.getvalue()).decode(),
                "seconds": dt,
                "batched": len(group),
            }
            req.event.set()

    def _run_one(self, p):
        t0 = time.time()
        img = _payload_image(p)
        control = _payload_control(p)
        out = self.pipe.generate(
            pil_image=img,
            prompt=p.get("prompt") or None,
            negative_prompt=p.get("negative_prompt") or None,
            extra_text=p.get("extra_text") or None,
            scale=float(p.get("scale", 1.0)),
            guidance_scale=float(p.get("guidance_scale", 5.0)),
            num_inference_steps=int(p.get("steps", 30)),
            seed=int(p.get("seed", 42)),
            height=int(p.get("height", 1024)),
            width=int(p.get("width", 1024)),
            scheduler=str(p.get("scheduler", "euler")),
            control_image=control,
            controlnet_conditioning_scale=float(p.get("controlnet_scale", 1.0)),
            encoder_interval=int(p.get("encoder_interval", 1)),
            prediction_type=str(p.get("prediction_type", "epsilon")),
            rescale_zero_snr=bool(p.get("zero_snr")),
            timestep_spacing=str(p.get("timestep_spacing", "leading")),
            use_karras_sigmas=bool(p.get("use_karras_sigmas")),
            guidance_rescale=float(p.get("guidance_rescale", 0.0)),
            clip_skip=int(p.get("clip_skip", 0)),
            prompt_weighting=bool(p.get("prompt_weighting")),
            init_image=_payload_b64_image(p.get("init_image")),
            mask_image=_payload_b64_image(p.get("mask_image")),
            strength=(float(p["strength"]) if p.get("strength") is not None
                      else None),
            output_type="pil",
        )[0]
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return {
            "image": base64.b64encode(buf.getvalue()).decode(),
            "seconds": time.time() - t0,
        }


def _payload_image(p):
    """The reference-image payload field, or None — a request without an
    image runs plain text-to-image (IP branch off)."""
    from PIL import Image

    if p.get("image"):
        return Image.open(io.BytesIO(base64.b64decode(p["image"])))
    return None


def _payload_b64_image(b64str):
    """Decode an optional base64 PNG/JPEG payload field -> PIL image
    (used by init_image= for img2img and mask_image= for inpainting)."""
    from PIL import Image

    if not b64str:
        return None
    return Image.open(io.BytesIO(base64.b64decode(b64str)))


def _payload_control(p):
    """Decode the optional control_image payload field -> RGB array."""
    from PIL import Image

    if not p.get("control_image"):
        return None
    return np.asarray(
        Image.open(io.BytesIO(base64.b64decode(p["control_image"]))).convert("RGB")
    )


class ContinuousWorker(threading.Thread):
    """Continuous batching: requests join a RUNNING batch at denoise-step
    granularity instead of waiting for the current program to finish.

    The device keeps ``max_batch`` request slots advanced ``chunk`` steps at
    a time (pipelines/continuous.SlotEngine); at every chunk boundary
    finished slots are decoded and freed, and queued requests with the same
    static options are admitted into free slots mid-flight. Requests with a
    different batch key wait until the engine drains; once any mismatched
    request has waited longer than ``fairness_timeout_s``, same-key
    admissions pause so the engine can drain (otherwise steady same-key
    traffic would starve mismatched requests forever).
    """

    def __init__(self, pipe, *, max_batch=4, chunk=5, fairness_timeout_s=30.0):
        super().__init__(daemon=True)
        self.pipe = pipe
        self.max_batch = max_batch
        self.chunk = chunk
        self.fairness_timeout_s = fairness_timeout_s
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.running = True
        self.pack_errors = 0
        self._engine = None
        # (wall_time, engine_min_step_at_admit) per admission — observability
        # + test hook proving mid-flight joins; bounded so a long-running
        # server doesn't grow it without limit
        from collections import deque

        self.admissions = deque(maxlen=4096)
        self.total_admissions = 0

    def submit(self, payload) -> _Request:
        req = _Request(payload)
        req._t0 = time.time()
        self.q.put(req)
        return req

    def _make_engine(self, req):
        from imagharmony_tpu.pipelines import continuous
        from imagharmony_tpu.pipelines.harmony_edit import EditOptions

        p = req.payload
        opts = EditOptions(
            height=int(p.get("height", 1024)),
            width=int(p.get("width", 1024)),
            num_inference_steps=int(p.get("steps", 30)),
            scheduler=str(p.get("scheduler", "euler")),
            guidance_scale=float(p.get("guidance_scale", 5.0)),
            ip_scale=float(p.get("scale", 1.0)),
            use_harmony=bool(p.get("extra_text")),
            controlnet_scale=float(p.get("controlnet_scale", 1.0)),
            encoder_interval=int(p.get("encoder_interval", 1)),
            prediction_type=str(p.get("prediction_type", "epsilon")),
            rescale_zero_snr=bool(p.get("zero_snr")),
            timestep_spacing=str(p.get("timestep_spacing", "leading")),
            use_karras=bool(p.get("use_karras_sigmas")),
            guidance_rescale=float(p.get("guidance_rescale", 0.0)),
            clip_skip=int(p.get("clip_skip", 0)),
        )
        chunk = self.chunk
        if opts.encoder_interval > 1 and chunk % opts.encoder_interval:
            # align chunks to encoder key steps (SlotEngine requirement)
            chunk += opts.encoder_interval - (chunk % opts.encoder_interval)
        return continuous.SlotEngine(
            self.pipe, opts, slots=self.max_batch, chunk=chunk,
            use_controlnet=bool(p.get("control_image")),
        )

    def _admit(self, engine, req):
        p = req.payload
        control = _payload_control(p)
        img = _payload_image(p)
        engine.admit(
            req,
            pil_image=np.asarray(img.convert("RGB")) if img is not None else None,
            prompt=p.get("prompt") or None,
            negative_prompt=p.get("negative_prompt") or None,
            extra_text=p.get("extra_text") or None,
            seed=int(p.get("seed", 42)),
            control_image=control,
        )

    def status(self):
        """Live engine state for GET /status (only meaningful with the
        chunked engine: per-slot denoise positions)."""
        eng = self._engine
        if eng is None:
            return {"mode": "continuous", "active": 0, "queued": self.q.qsize()}
        prog = eng.progress().tolist()
        return {
            "mode": "continuous",
            "active": eng.active(),
            "queued": self.q.qsize(),
            "num_steps": eng.num_steps,
            "slot_steps": [
                (int(p) if sl.request is not None else None)
                for p, sl in zip(prog, eng.slots)
            ],
            "admissions": self.total_admissions,
            "pack_errors": self.pack_errors,
        }

    def run(self):
        engine = None
        key = None
        pending = []
        self._engine = None
        while self.running:
            try:
                pending.append(self.q.get(timeout=0.02 if engine else 0.2))
            except queue.Empty:
                pass
            # burst drain: pull EVERY queued request now so a burst fills all
            # free slots at this chunk boundary (one q.get per iteration
            # admitted at most one request per chunk, leaving slots masked)
            while True:
                try:
                    pending.append(self.q.get_nowait())
                except queue.Empty:
                    break
            # fairness bookkeeping: stamp when each request started waiting;
            # a request past the threshold switches service to FIFO-by-wait
            # so steady same-key traffic cannot starve a mismatched key
            now = time.time()
            for req in pending:
                if not hasattr(req, "_pend_t0"):
                    req._pend_t0 = now
            starved = [
                req for req in pending
                if now - req._pend_t0 > self.fairness_timeout_s
            ]
            if engine is None and pending:
                # rebuild from the longest-waiting starved request if any
                # (plain pending[0] could be a just-deferred same-key request,
                # which would re-trigger the drain forever)
                first = (min(starved, key=lambda r: r._pend_t0)
                         if starved else pending[0])
                try:
                    engine = self._make_engine(first)
                    self._engine = engine
                    key = first.batch_key()
                except Exception as e:
                    log.error("continuous engine init failed: %s", e)
                    first.error = f"{type(e).__name__}: {e}"
                    first.event.set()
                    pending.remove(first)
                    continue
            if engine is None:
                continue

            # fairness rule: while a MISMATCHED request is starved, service
            # degrades to FIFO-by-wait — same-key requests younger than the
            # oldest starved mismatch are deferred, so the engine drains and
            # the rebuild above serves the starved request next. Same-key
            # requests OLDER than it still run (they were ahead in line).
            oldest_mismatch = min(
                (r._pend_t0 for r in starved if r.batch_key() != key),
                default=None,
            )

            still = []
            for req in pending:
                if (req.batch_key() == key and engine.free_slots()
                        and (oldest_mismatch is None
                             or req._pend_t0 <= oldest_mismatch)):
                    prog = engine.progress()
                    mid = int(prog.min()) if engine.active() else 0
                    try:
                        self._admit(engine, req)
                        self.admissions.append((time.time(), mid))
                        self.total_admissions += 1
                    except Exception as e:
                        log.error("admission failed:\n%s", traceback.format_exc())
                        self.pack_errors += 1
                        req.error = f"{type(e).__name__}: {e}"
                        req.event.set()
                else:
                    still.append(req)
            pending = still

            if engine.active():
                try:
                    engine.run_chunk()
                    for req, img in engine.harvest():
                        from PIL import Image

                        buf = io.BytesIO()
                        Image.fromarray(img).save(buf, format="PNG")
                        req.result = {
                            "image": base64.b64encode(buf.getvalue()).decode(),
                            "seconds": time.time() - req._t0 if hasattr(req, "_t0") else 0.0,
                            "continuous": True,
                        }
                        req.event.set()
                except Exception as e:
                    # a chunk/decode failure must fail the affected requests,
                    # not kill the worker thread
                    log.error("continuous chunk failed:\n%s", traceback.format_exc())
                    self.pack_errors += 1
                    for sl in engine.slots:
                        if sl.request is not None:
                            sl.request.error = f"{type(e).__name__}: {e}"
                            sl.request.event.set()
                    engine = None
                    self._engine = None
            else:
                # Idle engine: any same-key pending request would have been
                # admitted above (all slots are free), so whatever remains in
                # `pending` needs a different batch key — drain so the next
                # iteration can build its engine. (Draining only when pending
                # was empty deadlocked exactly that case.)
                engine = None
                self._engine = None


def make_server(pipe, port=7860, *, continuous=False, payload_defaults=None,
                **worker_kw):
    worker_cls = ContinuousWorker if continuous else BatchingWorker
    worker = worker_cls(pipe, **worker_kw)
    worker.start()
    payload_defaults = payload_defaults or {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            data = body.encode() if isinstance(body, str) else body
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, json.dumps({"ok": True}))
            elif self.path == "/status":
                if hasattr(worker, "status"):
                    self._send(200, json.dumps(worker.status()))
                else:
                    self._send(200, json.dumps({
                        "mode": "packed",
                        "queued": worker.q.qsize(),
                        "pack_errors": worker.pack_errors,
                    }))
            elif self.path == "/":
                self._send(200, _HTML, "text/html")
            else:
                self._send(404, json.dumps({"error": "not found"}))

        def do_POST(self):
            if self.path != "/edit":
                self._send(404, json.dumps({"error": "not found"}))
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except Exception as e:
                self._send(400, json.dumps({"error": str(e)}))
                return
            for k, v in payload_defaults.items():
                payload.setdefault(k, v)
            req = worker.submit(payload)
            req.event.wait()
            if req.error:
                self._send(500, json.dumps({"error": req.error}))
            else:
                self._send(200, json.dumps(req.result))

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    server.worker = worker
    return server


def main(args):
    from imagharmony_tpu.io import checkpoints
    from imagharmony_tpu.pipelines import HarmonyPipeline

    if getattr(args, "model_dir", None):
        pipe = checkpoints.load_pipeline(
            model_dir=args.model_dir, adapter_ckpt=args.adapter_ckpt
        )
    else:
        print("no --model-dir: serving the random tiny pipeline (demo mode)")
        pipe = HarmonyPipeline.random_tiny()
    from imagharmony_tpu.cli import _merge_loras

    pipe = _merge_loras(pipe, args)
    defaults = {}
    if getattr(args, "turbo", False):
        # gated approximation, see the edit command's --turbo; requests may
        # still pass their own encoder_interval to override
        defaults["encoder_interval"] = 2
    server = make_server(
        pipe, port=args.port, continuous=getattr(args, "continuous", False),
        payload_defaults=defaults,
    )
    mode = "continuous" if getattr(args, "continuous", False) else "packed"
    print(f"serving on http://0.0.0.0:{args.port} ({mode} batching)")
    server.serve_forever()
