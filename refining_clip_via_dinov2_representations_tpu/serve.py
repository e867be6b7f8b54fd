"""HTTP serving front end for the TPU inference engine.

The reference has no serving path at all (inference happens inline in its
eval scripts, `test_scripts/extract_features_from_csv.py:63-89`); this module
completes the production story around `inference.ClipInferenceEngine`:

* **dynamic micro-batching** — concurrent requests arriving within a short
  window are coalesced into ONE engine call (`_Batcher`). TPUs amortize
  launch + padding cost over rows, so a serving host under load runs big
  buckets at high MXU occupancy instead of many size-1 calls; an idle host
  still answers a lone request after at most `batch_window_ms`.
* **stdlib only** — `http.server.ThreadingHTTPServer` + `json` + `base64`;
  no web framework to pin. Each HTTP thread blocks on a future while the
  single batcher thread owns all device dispatch (one stream, no device
  contention).
* **endpoints**:
    GET  /health                          liveness + engine config
    POST /v1/encode_text   {"texts": [...]}             -> {"features": ...}
    POST /v1/encode_image  {"images_b64": [...]}        -> {"features": ...}
                           (base64 JPEG/PNG; preprocessed server-side)
    POST /v1/similarity    {"texts": [...], "images_b64": [...]}
                           -> {"logits": ...}  (scaled image->text logits)
    POST /v1/caption       {"images_b64": [...], "seq_len"?, "num_beams"?,
                           "num_beam_groups"?}  -> {"captions": [...]}
                           (CoCa models: grouped beam search + BPE decode)

CLI: ``python -m refining_clip_via_dinov2_representations_tpu.serve
--model ViT-B-32 [--pretrained openai | --checkpoint ckpt] --port 8080``.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, List, Optional, Sequence

import numpy as np


class _Batcher:
    """Coalesce concurrent one-request arrays into single engine calls.

    A dedicated thread drains the queue: it waits for the first item, then
    keeps collecting until either `max_rows` rows are pending or
    `window_ms` has passed since the first item — then concatenates, runs
    `fn` once, and splits the result back per request. Exceptions propagate
    to every waiting request of the failed batch.
    """

    def __init__(self, fn: Callable[[np.ndarray], np.ndarray],
                 max_rows: int, window_ms: float = 5.0):
        self._fn = fn
        self._max_rows = int(max_rows)
        self._window_s = window_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._stop = False
        self._thread.start()

    def submit(self, x: np.ndarray) -> "np.ndarray":
        """Blocking: returns this request's rows of the coalesced result."""
        done = threading.Event()
        slot: dict = {}
        self._q.put((x, done, slot))
        done.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def close(self):
        self._stop = True
        self._q.put(None)  # wake the drain loop
        self._thread.join(timeout=5)

    def _loop(self):
        import time

        while not self._stop:
            item = self._q.get()
            if item is None:
                continue
            batch = [item]
            rows = item[0].shape[0]
            deadline = time.monotonic() + self._window_s
            while rows < self._max_rows:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    continue
                batch.append(nxt)
                rows += nxt[0].shape[0]
            try:
                out = self._fn(np.concatenate([b[0] for b in batch], axis=0))
                ofs = 0
                for x, done, slot in batch:
                    slot["out"] = out[ofs : ofs + x.shape[0]]
                    ofs += x.shape[0]
                    done.set()
            except Exception as e:  # propagate to every waiter, keep serving
                for _, done, slot in batch:
                    slot["err"] = e
                    done.set()


class ClipServer:
    """The serving bundle: engine + preprocess + tokenizer + two batchers."""

    def __init__(self, engine, preprocess, tokenizer,
                 batch_window_ms: float = 5.0):
        self.engine = engine
        self.preprocess = preprocess
        self.tokenizer = tokenizer
        top = engine.buckets[-1]
        self._text_batcher = _Batcher(engine.encode_text, top, batch_window_ms)
        self._image_batcher = _Batcher(engine.encode_image, top, batch_window_ms)

    # -- request handlers (each runs on an HTTP thread) ----------------------

    def health(self) -> dict:
        return {
            "status": "ok",
            "buckets": list(self.engine.buckets),
            "image_size": list(self.engine.image_size),
            "context_length": self.engine.context_length,
            "quantize": self.engine.quantize,
            "mesh": None if self.engine.mesh is None
            else dict(self.engine.mesh.shape),
        }

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            raise ValueError("'texts' must be a non-empty list of strings")
        ids = np.asarray(self.tokenizer(list(texts)), np.int32)
        return self._text_batcher.submit(ids)

    def _decode_images(self, images_b64: Sequence[str]) -> np.ndarray:
        if not images_b64:
            raise ValueError("'images_b64' must be a non-empty list")
        from PIL import Image

        pixels = []
        for s in images_b64:
            with Image.open(io.BytesIO(base64.b64decode(s))) as img:
                pixels.append(np.asarray(self.preprocess(img.convert("RGB"))))
        return np.stack(pixels).astype(np.float32)

    def encode_image_b64(self, images_b64: Sequence[str]) -> np.ndarray:
        return self._image_batcher.submit(self._decode_images(images_b64))

    def similarity(self, texts: Sequence[str],
                   images_b64: Sequence[str]) -> np.ndarray:
        img_f = self.encode_image_b64(images_b64)
        txt_f = self.encode_text(texts)
        scale, bias = self.engine.logit_terms()
        return scale * (img_f @ txt_f.T) + bias

    def caption(self, images_b64: Sequence[str], **gen_kwargs) -> List[str]:
        """Caption images with a CoCa engine (grouped beam search, the
        reference's default decode). Generation kwargs vary per request, so
        captioning bypasses the micro-batchers — the engine's bucketing
        still pads/coalesces the rows of one request.

        Client-supplied generation parameters are validated and normalized
        here: every distinct config compiles a beam search per bucket (the
        engine LRU-caps the cache), so ints are coerced and bounded and the
        penalties are rounded to 3 decimals to collapse float jitter."""
        gen_kwargs = self._validate_gen_kwargs(gen_kwargs)
        pixels = self._decode_images(images_b64)
        try:
            tokens = self.engine.caption_tokens(pixels, **gen_kwargs)
        except TypeError as e:  # non-CoCa engine -> client error, not a 500
            raise ValueError(str(e))
        eot = 49407
        sot = 49406
        out = []
        for row in np.asarray(tokens):
            row = row.tolist()
            body = row[1:] if row and row[0] == sot else row
            if eot in body:
                body = body[: body.index(eot)]
            decode = getattr(self.tokenizer, "decode", None)
            out.append(decode(body).strip() if decode is not None
                       else " ".join(str(t) for t in body))
        return out

    def _validate_gen_kwargs(self, gen: dict) -> dict:
        out = {}
        ints = {"seq_len": (2, min(77, self.engine.context_length)),
                "num_beams": (2, 16), "num_beam_groups": (1, 16),
                "min_seq_len": (1, 76)}
        for k, (lo, hi) in ints.items():
            if k in gen:
                v = int(gen[k])
                if not lo <= v <= hi:
                    raise ValueError(f"{k} must be in [{lo}, {hi}], got {v}")
                out[k] = v
        for k in ("repetition_penalty", "length_penalty"):
            if k in gen:
                v = float(gen[k])
                if not (0.01 <= v <= 100.0):
                    raise ValueError(f"{k} must be in [0.01, 100], got {v}")
                out[k] = round(v, 3)
        unknown = set(gen) - set(ints) - {"repetition_penalty", "length_penalty"}
        if unknown:
            raise ValueError(f"unknown caption parameters: {sorted(unknown)}")
        return out

    def close(self):
        self._text_batcher.close()
        self._image_batcher.close()


def _make_handler(server: ClipServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route to logging, not stderr
            logging.debug("serve: " + fmt, *args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, server.health())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/encode_text":
                    out = server.encode_text(req.get("texts", []))
                    self._reply(200, {"features": out.tolist()})
                elif self.path == "/v1/encode_image":
                    out = server.encode_image_b64(req.get("images_b64", []))
                    self._reply(200, {"features": out.tolist()})
                elif self.path == "/v1/similarity":
                    out = server.similarity(
                        req.get("texts", []), req.get("images_b64", [])
                    )
                    self._reply(200, {"logits": out.tolist()})
                elif self.path == "/v1/caption":
                    gen = {k: req[k] for k in (
                        "seq_len", "num_beams", "num_beam_groups",
                        "min_seq_len", "repetition_penalty", "length_penalty",
                    ) if k in req}
                    caps = server.caption(req.get("images_b64", []), **gen)
                    self._reply(200, {"captions": caps})
                else:
                    self._reply(404, {"error": f"unknown path {self.path}"})
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # engine/device failure: 500, keep alive
                logging.exception("serve: request failed")
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_http_server(server: ClipServer, host: str = "0.0.0.0",
                     port: int = 8080) -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral, for tests) — call .serve_forever() to run."""
    cls = type(
        "ClipHTTPServer", (ThreadingHTTPServer,),
        # default listen backlog (5) resets connections under a burst of
        # concurrent clients (measured: ~9% of requests at 32 clients);
        # micro-batching WANTS bursts queued, not refused
        {"request_queue_size": 128},
    )
    return cls((host, port), _make_handler(server))


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description="CLIP TPU serving front end")
    p.add_argument("--model", required=True)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--buckets", type=int, nargs="+", default=None)
    p.add_argument("--quantize", choices=["int8"], default=None)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--mesh-model-axis", type=int, default=1,
                   help="TP-shard the weights over this many devices "
                        "(ViT-g-scale checkpoints that don't fit one chip)")
    args = p.parse_args(argv)

    from .inference import DEFAULT_BUCKETS, create_engine

    mesh = None
    if args.mesh_model_axis > 1:
        from .parallel.mesh import create_mesh

        mesh = create_mesh(model=args.mesh_model_axis)
    engine, preprocess, tokenizer = create_engine(
        args.model, pretrained=args.pretrained, checkpoint=args.checkpoint,
        buckets=tuple(args.buckets) if args.buckets else DEFAULT_BUCKETS,
        quantize=args.quantize, mesh=mesh,
    )
    server = ClipServer(engine, preprocess, tokenizer,
                        batch_window_ms=args.batch_window_ms)
    httpd = make_http_server(server, args.host, args.port)
    logging.basicConfig(level=logging.INFO)
    logging.info("serving %s on %s:%d (buckets %s)", args.model,
                 args.host, httpd.server_address[1], engine.buckets)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


if __name__ == "__main__":
    main()
