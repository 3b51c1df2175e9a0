"""Decode/serving benchmark: multimodal prefill + greedy decode throughput.

Not the driver metric (that is bench.py's train-step tokens/s); this
measures the inference path: batched prefill with MokA masks followed by
text-adapter decode steps with the KV cache (the reference's
``inference_cut.py`` shape: batch 8, ~1k-token prompts, long generations).
Prints one JSON line."""

import json
import sys
import time

import numpy as np


def main(cfg_name: str = "llama_3b", batch: int = 8, prompt_len: int = 896,
         new_tokens: int = 128, paged: bool = False, kv_quant: bool = False):
    import jax
    import jax.numpy as jnp
    from bench import _candidates, _enable_compile_cache
    _enable_compile_cache()
    from moka_tpu.eval.decode import greedy_generate
    from moka_tpu.models import llama
    from moka_tpu.ops.moka import MokaSpec

    cfg = _candidates()[cfg_name][0]
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    r1, r2 = jax.random.split(jax.random.key(0))
    if "int8" in cfg_name or "int4" in cfg_name:
        from moka_tpu.ops.quant import init_llama_params_quantized
        base = init_llama_params_quantized(
            r1, cfg, bits=4 if "int4" in cfg_name else 8,
            head_bits=8 if "qh" in cfg_name else None)
    else:
        base = llama.init_llama_params(r1, cfg, dtype=jnp.bfloat16)
    adapters = llama.init_moka_adapters(r2, cfg, spec)

    rng = np.random.default_rng(0)
    embeds = jnp.asarray(
        rng.standard_normal((batch, prompt_len, cfg.dim)), jnp.bfloat16)
    pmask = jnp.ones((batch, prompt_len), jnp.int32)
    mod = np.zeros((3, batch, prompt_len), np.float32)
    mod[0, :, : prompt_len // 2] = 1
    mod[1, :, prompt_len // 2: 3 * prompt_len // 4] = 1
    mod[2, :, 3 * prompt_len // 4:] = 1
    qm = np.zeros((batch, prompt_len), np.float32)
    qm[:, 2:130] = 1
    masks = llama.MaskBundle(jnp.asarray(mod), jnp.asarray(qm))

    def run_once():
        return greedy_generate(
            base, adapters, cfg=cfg, spec=spec, inputs_embeds=embeds,
            prompt_mask=pmask, masks=masks, max_new_tokens=new_tokens,
            eos_id=10 ** 9, pad_id=0, paged_decode=paged,
            use_flash=True, kv_quant=kv_quant)

    np.asarray(run_once())  # compile + run (block_until_ready is
    # unreliable through the axon tunnel; a host transfer is not)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        toks = np.asarray(run_once())
    dt = (time.perf_counter() - t0) / n

    decode_tps = batch * new_tokens / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec",
        "value": round(decode_tps, 2),
        "unit": "tokens/s",
        "detail": {"config": cfg_name, "batch": batch,
                   "prompt_len": prompt_len, "new_tokens": new_tokens,
                   "paged_decode": paged, "kv_quant": kv_quant,
                   "e2e_s": dt,
                   "e2e_tokens_per_sec":
                       batch * (prompt_len + new_tokens) / dt},
    }))


def main_engine(cfg_name: str = "llama_3b", n_slots: int = 8,
                n_requests: int = 24, prompt_len: int = 256,
                new_tokens: int = 64, kv_quant: bool = False,
                ks=(1, 16, 32, 64)):
    """Continuous-batching serving bench: a stream of requests with RAGGED
    generation lengths (16..2*new_tokens, the regime continuous batching
    exists for) through the DecodeEngine (mid-stream admission, slot reuse)
    vs the same workload as sequential static batches through
    greedy_generate — where every request pays for the longest in its batch
    (head-of-line).  Useful tokens = each request's own budget, both paths."""
    import jax
    import jax.numpy as jnp
    from bench import _candidates, _enable_compile_cache
    _enable_compile_cache()
    from moka_tpu.eval.decode import greedy_generate
    from moka_tpu.eval.engine import DecodeEngine
    from moka_tpu.models import llama
    from moka_tpu.ops.moka import MokaSpec

    cfg = _candidates()[cfg_name][0]
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    r1, r2 = jax.random.split(jax.random.key(0))
    if "int8" in cfg_name or "int4" in cfg_name:
        from moka_tpu.ops.quant import init_llama_params_quantized
        base = init_llama_params_quantized(
            r1, cfg, bits=4 if "int4" in cfg_name else 8,
            head_bits=8 if "qh" in cfg_name else None)
    else:
        base = llama.init_llama_params(r1, cfg, dtype=jnp.bfloat16)
    adapters = llama.init_moka_adapters(r2, cfg, spec)

    rng = np.random.default_rng(0)
    budgets = rng.integers(16, 2 * new_tokens + 1, n_requests).tolist()
    reqs = [(jnp.asarray(rng.standard_normal((1, prompt_len, cfg.dim)),
                         jnp.bfloat16),
             jnp.ones((1, prompt_len), jnp.int32))
            for _ in range(n_requests)]
    useful = sum(budgets)

    dispatches = {}

    def run_engine(k=1, depth=1, name=None):
        eng = DecodeEngine(base, adapters, cfg=cfg, spec=spec,
                           n_slots=n_slots,
                           cache_capacity=prompt_len + 4 * new_tokens,
                           eos_id=10 ** 9, use_flash=True,
                           steps_per_dispatch=k, kv_quant=kv_quant,
                           pipeline_depth=depth)
        waiters = [eng.submit(e, m, max_new_tokens=b)
                   for (e, m), b in zip(reqs, budgets)]
        eng.run_until_drained()
        dispatches[name or f"engine_k{k}"] = eng._dispatch_no
        return sum(len(w.get(timeout=1)) for w in waiters)

    def run_static():
        # static batching decodes max(batch budgets) steps for every lane
        total = 0
        for i in range(0, n_requests, n_slots):
            chunk = reqs[i:i + n_slots]
            embeds = jnp.concatenate([e for e, _ in chunk], axis=0)
            pmask = jnp.concatenate([m for _, m in chunk], axis=0)
            np.asarray(greedy_generate(
                base, adapters, cfg=cfg, spec=spec, inputs_embeds=embeds,
                prompt_mask=pmask, masks=None,
                max_new_tokens=max(budgets[i:i + n_slots]),
                eos_id=10 ** 9, pad_id=0, use_flash=True,
                kv_quant=kv_quant))
            total += sum(budgets[i:i + n_slots])
        return total

    results = {}
    variants = []
    for k in ks:
        variants.append((f"engine_k{k}",
                         (lambda kk: lambda: run_engine(
                             kk, 1, f"engine_k{kk}"))(k)))
        variants.append((f"engine_k{k}_nopipe",
                         (lambda kk: lambda: run_engine(
                             kk, 0, f"engine_k{kk}_nopipe"))(k)))
    for name, fn in variants + [("static", run_static)]:
        fn()  # compile warmup
        # two timed runs back-to-back: best + spread makes tunnel-RTT
        # drift visible instead of folding it into the comparison
        tps = []
        for _ in range(2):
            t0 = time.perf_counter()
            n_tok = fn()
            dt = time.perf_counter() - t0
            tps.append(round(n_tok / dt, 1))
        results[name] = {"tokens": n_tok,
                         "tokens_per_sec": max(tps), "runs": tps}
        if name in dispatches:
            # total device dispatches (prefill groups + decode scans): the
            # per-dispatch link RTT model for the engine/static gap
            results[name]["dispatches"] = dispatches[name]
    best = max((v["tokens_per_sec"] for n, v in results.items()
                if n.startswith("engine")))
    print(json.dumps({
        "metric": "serving_decode_tokens_per_sec",
        "value": best,
        "unit": "tokens/s",
        "detail": {"config": cfg_name, "n_slots": n_slots,
                   "n_requests": n_requests, "prompt_len": prompt_len,
                   "new_tokens": new_tokens, "kv_quant": kv_quant,
                   **results},
    }))


if __name__ == "__main__":
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    nt = int(sys.argv[sys.argv.index("--new-tokens") + 1]) \
        if "--new-tokens" in sys.argv else None
    if "--engine" in sys.argv:
        ks = tuple(int(x) for x in
                   sys.argv[sys.argv.index("--ks") + 1].split(",")) \
            if "--ks" in sys.argv else (1, 16, 32, 64)
        main_engine(pos[0] if pos else "llama_3b",
                    kv_quant="--kv-quant" in sys.argv, ks=ks,
                    **({"new_tokens": nt} if nt else {}))
    else:
        main(pos[0] if pos else "llama_3b", paged="--paged" in sys.argv,
             kv_quant="--kv-quant" in sys.argv,
             **({"new_tokens": nt} if nt else {}))
