"""Minimal production inference server.

Stdlib-only HTTP endpoint around the jitted pipeline (no reference
equivalent — the reference stops at a CLI; serving is first-class here):

    python -m mvd_tpu.cli.serve --checkpoint ckpt/ --port 8000

POST /generate   {"prompt": str, "num_views": int, "num_steps": int,
                  "guidance_scale": float, "ref_scale": float,
                  "seed": int, "source_image_b64": png-b64?,
                  "source_camera": [[...4x4]]?, "target_cameras": [[...]]?,
                  "sampler": "ddpm"|"ddim"|"dpmpp_2m"?, "encoder_reuse": int?}
    -> {"images_b64": [png...], "latency_s": float}
GET /healthz     -> {"ok": true, "backend": "...", "compiled_signatures": N,
                     "queue_depth": M}

Requests serialize through a lock (one TPU program at a time); shapes reuse
the pipeline's jit cache, so repeated signatures run at steady-state speed.
``queue_depth`` counts requests currently running or waiting for the chip;
a request that waits longer than ``--request-timeout`` for its turn is
rejected with 503 instead of piling onto an unbounded queue.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _png_b64(img01: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray((np.clip(img01, 0, 1) * 255).astype(np.uint8)).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _b64_png(data: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def make_handler(pipe, size: int, lock: threading.Lock,
                 request_timeout: float = 300.0):
    from ..camera import orbit_cameras

    # requests running or waiting for the accelerator lock (served by
    # ThreadingHTTPServer's per-connection threads)
    depth = {"n": 0}
    depth_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._json(
                    200,
                    {
                        "ok": True,
                        "backend": jax.default_backend(),
                        "compiled_signatures": len(pipe._jit_cache),
                        "queue_depth": depth["n"],
                    },
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                num_views = int(req.get("num_views", 1))
                cams = req.get("target_cameras")
                tgt = (
                    np.asarray(cams, np.float32)
                    if cams
                    else orbit_cameras(max(num_views, 1))[:num_views]
                )
                src_cam = np.asarray(
                    req.get("source_camera") or tgt[0], np.float32
                )
                src_img = None
                if req.get("source_image_b64"):
                    src_img = _b64_png(req["source_image_b64"], size)[None]
                t0 = time.perf_counter()
                with depth_lock:
                    depth["n"] += 1
                try:
                    # bounded wait for the accelerator: shed load with 503
                    # instead of queueing unboundedly behind long generations
                    if not lock.acquire(timeout=request_timeout):
                        self._json(
                            503,
                            {
                                "error": "timed out waiting for the "
                                f"accelerator ({request_timeout:g}s)",
                                "queue_depth": depth["n"],
                            },
                        )
                        return
                    try:
                        out = pipe(
                            [req.get("prompt", "")] * num_views,
                            num_inference_steps=int(req.get("num_steps", 20)),
                            guidance_scale=float(req.get("guidance_scale", 1.0)),
                            negative_prompt=req.get("negative_prompt"),
                            height=size,
                            width=size,
                            source_camera=np.tile(src_cam[None], (num_views, 1, 1)),
                            target_camera=tgt,
                            source_images=src_img,
                            ref_scale=float(req.get("ref_scale", 1.0)),
                            seed=int(req.get("seed", 0)),
                            sampler=req.get("sampler"),
                            encoder_reuse=int(req.get("encoder_reuse", 1)),
                        )
                    finally:
                        lock.release()
                finally:
                    with depth_lock:
                        depth["n"] -= 1
                images = np.asarray(out["images"])
                self._json(
                    200,
                    {
                        "images_b64": [_png_b64(im) for im in images],
                        "latency_s": round(time.perf_counter() - t0, 4),
                    },
                )
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": str(e)})

    return Handler


def main(argv=None):
    from . import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--warmup", action="store_true", help="compile 1-view path at boot")
    p.add_argument("--request-timeout", type=float, default=300.0,
                   help="max seconds a request may wait for the accelerator "
                        "before being shed with 503")
    args = p.parse_args(argv)

    import dataclasses

    import jax

    from ..config import TINY_MODEL, ModelConfig
    from ..pipeline import MVDPipeline
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = TINY_MODEL if args.tiny else ModelConfig()
    size = cfg.unet.sample_size * 8 if args.tiny else args.image_size
    if not args.tiny:
        unet = dataclasses.replace(cfg.unet, sample_size=size // 8, remat=False)
        cfg = dataclasses.replace(cfg, unet=unet)
    pipe = MVDPipeline.create(cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        if args.checkpoint.endswith(".ckpt"):
            from ..checkpoint import convert_lightning_checkpoint

            mvd_params, _ = convert_lightning_checkpoint(args.checkpoint)
            pipe.params = {**pipe.params, "mvd": mvd_params}
        else:
            from ..checkpoint import load_params

            pipe.params = load_params(args.checkpoint, pipe.params)
    if args.warmup:
        pipe("warmup", num_inference_steps=2, guidance_scale=1.0,
             height=size, width=size, seed=0)

    lock = threading.Lock()
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(pipe, size, lock, request_timeout=args.request_timeout),
    )
    print(f"serving on http://{args.host}:{args.port} (size={size})")
    server.serve_forever()


if __name__ == "__main__":
    main()
