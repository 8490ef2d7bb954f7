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
    assert data["queue_depth"] == 0


def _post_generate(server, payload, timeout=600):
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def test_concurrent_clients(server):
    """Two clients at once: both succeed (serialized through the lock), and
    a healthz probe taken while they run reports a non-negative queue depth
    that returns to 0 after."""
    results = {}

    def worker(i):
        try:
            results[i] = _post_generate(
                server, {"prompt": "x", "num_views": 1, "num_steps": 1, "seed": i}
            )
        except Exception as e:  # noqa: BLE001
            results[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for i in range(2):
        status, data = results[i]
        assert status == 200, results[i]
        assert len(data["images_b64"]) == 1
    with urllib.request.urlopen(server + "/healthz") as r:
        assert json.loads(r.read())["queue_depth"] == 0


def test_request_timeout_sheds_load():
    """A request that cannot get the accelerator within request_timeout is
    rejected with 503 (not queued forever); the lock holder is unaffected."""
    import urllib.error

    pipe = MVDPipeline.create(TINY_MODEL, jax.random.PRNGKey(0))
    size = TINY_MODEL.unet.sample_size * 8
    lock = threading.Lock()
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(pipe, size, lock, request_timeout=0.2)
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with lock:  # simulate a long-running generation holding the chip
            req = urllib.request.Request(
                url + "/generate",
                data=json.dumps({"prompt": "x", "num_steps": 1}).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req, timeout=60)
                raise AssertionError("expected 503 while the lock is held")
            except urllib.error.HTTPError as e:
                assert e.code == 503
                body = json.loads(e.read())
                assert "timed out" in body["error"]
                assert body["queue_depth"] >= 1
        # lock released: the same request now succeeds
        status, data = _post_generate(url, {"prompt": "x", "num_steps": 1})
        assert status == 200 and len(data["images_b64"]) == 1
    finally:
        srv.shutdown()


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
