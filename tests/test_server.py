"""Micro-batching server: concurrent requests coalesce into one generate
call; HTTP round-trip works end to end."""

import json
import threading
import urllib.request

from moka_tpu.eval.server import MicroBatcher, serve


def test_microbatcher_coalesces():
    calls = []

    def gen(items):
        calls.append(len(items))
        return [it["prompt"].upper() for it in items]

    mb = MicroBatcher(gen, max_batch=4, max_wait_s=0.2)
    waiters = [mb.submit({"prompt": f"p{i}"}) for i in range(4)]
    outs = [w.get(timeout=5) for w in waiters]
    mb.stop()
    assert outs == ["P0", "P1", "P2", "P3"]
    assert max(calls) > 1  # at least one real micro-batch formed


def test_http_roundtrip():
    server = serve(lambda items: [it["prompt"][::-1] for it in items],
                   host="127.0.0.1", port=0, max_batch=2)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "hello"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as resp:
            out = json.loads(resp.read())
        assert out["output"] == "olleh"
    finally:
        server.shutdown()
        server.batcher.stop()
