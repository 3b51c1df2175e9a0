"""Runnable continuous-batching serving demo (CPU-friendly, tiny model).

Starts the DecodeEngine + HTTP front on a random-init tiny LLaMA, fires a
few concurrent /generate requests plus one /generate_stream request, and
prints the responses as they arrive.  Same serving stack as production
(`cli/infer.py --serve --continuous`), minus real checkpoints:

    python examples/serving_demo.py
"""

import json
import os
import sys
import threading
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force CPU before any backend init (the sandbox may pin a TPU platform)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
import jax.numpy as jnp  # noqa: E402

from moka_tpu.core.config import LlamaConfig  # noqa: E402
from moka_tpu.eval.engine import DecodeEngine  # noqa: E402
from moka_tpu.eval.server import serve_continuous  # noqa: E402
from moka_tpu.models import llama  # noqa: E402
from moka_tpu.ops.moka import MokaSpec  # noqa: E402


def main():
    cfg = LlamaConfig.tiny()
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    r1, r2 = jax.random.split(jax.random.key(0))
    base = llama.init_llama_params(r1, cfg, dtype=jnp.float32)
    adapters = llama.init_moka_adapters(r2, cfg, spec)

    engine = DecodeEngine(base, adapters, cfg=cfg, spec=spec, n_slots=4,
                          cache_capacity=96, eos_id=2, use_flash=False,
                          steps_per_dispatch=4, cache_dtype=jnp.float32)

    bucket = 16

    def prep(item):
        ids = np.asarray(json.loads(item["prompt"]), np.int32)
        padded = np.zeros(bucket, np.int32)
        padded[:len(ids)] = ids
        mask = np.zeros((1, bucket), np.float32)
        mask[0, :len(ids)] = 1
        embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)
        return embeds, mask, None

    def decode_txt(toks):
        return " ".join(str(int(t)) for t in toks)

    server = serve_continuous(engine, prep, decode_txt, host="127.0.0.1",
                              port=0, max_new_tokens=12)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"serving on 127.0.0.1:{port}")

    rng = np.random.default_rng(0)
    prompts = [rng.integers(4, cfg.vocab_size, rng.integers(3, 9)).tolist()
               for _ in range(3)]

    def post(path, prompt):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps({"prompt": json.dumps(prompt)}).encode(),
            headers={"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=300)

    # concurrent non-streaming requests (join free lanes mid-stream)
    outs = {}

    def fetch(i):
        with post("/generate", prompts[i]) as resp:
            outs[i] = json.loads(resp.read())["output"]

    threads = [threading.Thread(target=fetch, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()

    # one streaming request: tokens print as the engine emits them
    with post("/generate_stream", prompts[2]) as resp:
        for line in resp:
            row = json.loads(line)
            if "token" in row:
                print(f"stream token: {row['token']}")
            else:
                print(f"stream final: {row['output']!r}")

    for t in threads:
        t.join(timeout=300)
    for i in sorted(outs):
        print(f"request {i}: {outs[i]!r}")

    server.shutdown()
    engine.stop()
    print("ok")


if __name__ == "__main__":
    main()
