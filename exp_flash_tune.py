"""Flash-attention block-size sweep at flagship shapes (VERDICT r3 item 5).

The round-4 source-attributed profile puts the flash custom-calls at
~103 ms/step (fwd ~70, bwd ~33) at b4xL1024xH32xhd128 vs a ~22 ms
speed-of-light estimate — the largest non-dot block of the 5,081 tok/s
step.  This sweeps (block_q, block_k) on the REAL chip for the fwd+bwd
kernel pair at exactly those shapes and prints ms per (fwd, fwd+bwd) call.

Usage: python exp_flash_tune.py            # sweep
"""

import itertools
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import _enable_compile_cache
    _enable_compile_cache()
    from moka_tpu.ops.flash_attention import flash_mha

    B, H, L, hd = 4, 32, 1024, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)

    def make(bq, bk):
        # Both timed fns return ONE scalar that depends on every output:
        # syncing a 4-byte scalar through the tunnel awaits the full
        # computation without the 32 MB output transfer that would dominate
        # the timing (and float(loss) alone would NOT await the grads —
        # the backward is queued after the loss is already available).
        @jax.jit
        def fwd(q, k, v):
            return flash_mha(q, k, v, mask, block_q=bq,
                             block_k=bk).astype(jnp.float32).sum()

        @jax.jit
        def fwdbwd(q, k, v):
            f = lambda q, k, v: flash_mha(q, k, v, mask, block_q=bq,
                                          block_k=bk).astype(
                                              jnp.float32).sum()
            l, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
            return l + sum(g.astype(jnp.float32).sum() for g in grads)

        return fwd, fwdbwd

    import sys
    grid = list(itertools.product((256, 512, 1024), (256, 512, 1024)))
    if "--configs" in sys.argv:  # e.g. --configs 256x256,512x256
        want = sys.argv[sys.argv.index("--configs") + 1].split(",")
        grid = [(int(c.split("x")[0]), int(c.split("x")[1])) for c in want]
    results = {}
    for bq, bk in grid:
        try:
            fwd, fwdbwd = make(bq, bk)
            float(fwd(q, k, v))               # compile
            t0 = time.perf_counter()
            for _ in range(20):
                s = fwd(q, k, v)
            float(s)
            t_fwd = (time.perf_counter() - t0) / 20 * 1e3
            float(fwdbwd(q, k, v))            # compile
            t0 = time.perf_counter()
            for _ in range(20):
                s = fwdbwd(q, k, v)
            float(s)
            t_fb = (time.perf_counter() - t0) / 20 * 1e3
            results[f"{bq}x{bk}"] = {"fwd_ms": round(t_fwd, 3),
                                     "fwdbwd_ms": round(t_fb, 3)}
        except Exception as e:  # block too big for VMEM etc.
            results[f"{bq}x{bk}"] = {"error": str(e)[:120]}
        print(f"# {bq}x{bk}: {results[f'{bq}x{bk}']}", flush=True)

    best = min((v["fwdbwd_ms"], k) for k, v in results.items()
               if "fwdbwd_ms" in v)
    print(json.dumps({"metric": "flash_block_sweep",
                      "shape": f"B{B} H{H} L{L} hd{hd} causal",
                      "best": best[1], "best_fwdbwd_ms": best[0],
                      "results": results}))


if __name__ == "__main__":
    main()
