"""Serving endpoint smoke test (tiny model, real HTTP round-trip)."""

import base64
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from mvd_tpu.cli.serve import make_handler
from mvd_tpu.config import TINY_MODEL
from mvd_tpu.pipeline import MVDPipeline


@pytest.fixture(scope="module")
def server():
    pipe = MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))
    size = TINY_MODEL.unet.sample_size * 8
    lock = threading.Lock()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(pipe, size, lock))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        data = json.loads(r.read())
    assert data["ok"] is True


def test_generate(server):
    req = json.dumps(
        {"prompt": "a chair", "num_views": 2, "num_steps": 2, "seed": 1}
    ).encode()
    r = urllib.request.Request(
        server + "/generate", data=req, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(r, timeout=600) as resp:
        data = json.loads(resp.read())
    assert len(data["images_b64"]) == 2
    png = base64.b64decode(data["images_b64"][0])
    assert png[:4] == b"\x89PNG"
    assert data["latency_s"] > 0
