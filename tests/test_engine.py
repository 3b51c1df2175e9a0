"""Continuous-batching engine: output parity with the batch greedy decoder,
mid-stream admission, slot reuse, and cursor-wrap compaction."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.core.config import LlamaConfig
from moka_tpu.eval.decode import greedy_generate
from moka_tpu.eval.engine import DecodeEngine
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec

CFG = LlamaConfig.tiny()
SPEC = MokaSpec.avt(rank=4, dropout_rate=0.0)
EOS = 2


@pytest.fixture(scope="module")
def model():
    r1, r2 = jax.random.split(jax.random.key(0))
    base = llama.init_llama_params(r1, CFG, dtype=jnp.float32)
    adapters = llama.init_moka_adapters(r2, CFG, SPEC)
    adapters = jax.tree.map(lambda x: x + 0.01 if x.ndim == 3 else x,
                            adapters)
    return base, adapters


def _prompts(seed=0, n=4, lo=3, hi=9):
    rng = np.random.default_rng(seed)
    return [rng.integers(4, CFG.vocab_size, rng.integers(lo, hi)).astype(
        np.int32) for _ in range(n)]


def _reference_outputs(model, prompts, max_new):
    """Per-request batch-1 greedy_generate (left-pad irrelevant at b=1)."""
    base, adapters = model
    outs = []
    for p in prompts:
        embeds = jnp.take(base["embed"], jnp.asarray(p)[None], axis=0)
        mask = jnp.ones((1, len(p)), jnp.float32)
        toks = np.asarray(greedy_generate(
            base, adapters, cfg=CFG, spec=SPEC, inputs_embeds=embeds,
            prompt_mask=mask, masks=None, max_new_tokens=max_new,
            eos_id=EOS, pad_id=0, use_flash=False, paged_decode=False))[0]
        # strip pad fill after eos; keep the emitted eos itself
        keep = []
        for t in toks:
            keep.append(int(t))
            if t == EOS:
                break
        outs.append(keep)
    return outs


def _submit(engine, base, p, max_new, bucket=16):
    n = len(p)
    padded = np.zeros(bucket, np.int32)
    padded[:n] = p
    embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)
    mask = np.zeros((1, bucket), np.float32)
    mask[0, :n] = 1
    return engine.submit(embeds, mask, max_new_tokens=max_new)


def _strip(toks):
    keep = []
    for t in toks:
        keep.append(int(t))
        if t == EOS:
            break
    return keep


def test_engine_matches_batch_greedy(model):
    base, adapters = model
    prompts = _prompts()
    max_new = 12
    ref = _reference_outputs(model, prompts, max_new)

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=4,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = [_submit(eng, base, p, max_new) for p in prompts]
    eng.run_until_drained()
    got = [_strip(f.get_nowait()) for f in futs]
    assert got == ref, (got, ref)


def test_engine_mid_stream_admission(model):
    """More requests than slots: later requests join as lanes free; every
    output still matches the per-request reference."""
    base, adapters = model
    prompts = _prompts(seed=1, n=7)
    max_new = 10
    ref = _reference_outputs(model, prompts, max_new)

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=96, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = [_submit(eng, base, p, max_new) for p in prompts]
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)


def test_engine_compaction(model):
    """Tiny cache capacity forces the cursor to wrap: compaction gathers
    live cells and outputs stay identical."""
    base, adapters = model
    prompts = _prompts(seed=2, n=6, lo=3, hi=7)
    max_new = 8
    ref = _reference_outputs(model, prompts, max_new)

    # capacity barely above bucket+max_new: wraps several times over 6 reqs
    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=28, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = [_submit(eng, base, p, max_new, bucket=8) for p in prompts]
    steps = eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)
    assert steps > 0


def test_engine_multi_step_dispatch(model):
    """steps_per_dispatch>1 (k decode steps scanned per dispatch): outputs
    identical to the per-request reference, including lanes that hit eos or
    budget mid-scan and compaction between dispatches."""
    base, adapters = model
    prompts = _prompts(seed=5, n=6)
    max_new = 10  # NOT a multiple of k: budget exhausts mid-scan
    ref = _reference_outputs(model, prompts, max_new)

    # paged (length-aware) decode attention inside the multi-step scan —
    # the TPU-default combination, exercised here on CPU (plain XLA path)
    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=48, eos_id=EOS, use_flash=False,
                       steps_per_dispatch=4, paged_decode=True,
                       cache_dtype=jnp.float32)
    futs = [_submit(eng, base, p, max_new) for p in prompts]
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)


def test_engine_mixed_bucket_admission(model):
    """Batched admission groups same-bucket requests; alternating buckets
    (and an unfittable request in the middle) still produce per-request
    reference outputs."""
    base, adapters = model
    prompts = _prompts(seed=6, n=6)
    max_new = 8
    ref = _reference_outputs(model, prompts, max_new)

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=4,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = []
    for i, p in enumerate(prompts):
        futs.append(_submit(eng, base, p, max_new,
                            bucket=16 if i % 2 == 0 else 24))
        if i == 2:  # wedge an unfittable request between groups
            bad = _submit(eng, base, prompts[0], max_new=200, bucket=16)
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)
    assert len(bad.get_nowait()) == 0  # rejected, not hung


def test_engine_multimodal_batched_admission(model):
    """Multimodal requests (mask bundles) sharing a bucket prefill as ONE
    batch — the mask bundles concatenate along the batch axis and every
    output matches the per-request masked reference."""
    base, adapters = model
    rng = np.random.default_rng(8)
    bucket, max_new = 16, 8
    reqs, ref = [], []
    for _ in range(4):
        n = int(rng.integers(8, bucket + 1))
        ids = rng.integers(4, CFG.vocab_size, n).astype(np.int32)
        mod = np.zeros((3, 1, bucket), np.float32)
        mod[0, 0, : n // 2] = 1
        mod[1, 0, n // 2: 3 * n // 4] = 1
        mod[2, 0, 3 * n // 4: n] = 1
        q = np.zeros((1, bucket), np.float32)
        q[0, 1:4] = 1

        # reference: exact-length prompt (greedy_generate reads the last
        # position's logits at prefill, so no right padding)
        ref_embeds = jnp.take(base["embed"], jnp.asarray(ids)[None], axis=0)
        ref_masks = llama.MaskBundle(jnp.asarray(mod[:, :, :n]),
                                     jnp.asarray(q[:, :n]))
        toks = np.asarray(greedy_generate(
            base, adapters, cfg=CFG, spec=SPEC, inputs_embeds=ref_embeds,
            prompt_mask=jnp.ones((1, n), jnp.float32), masks=ref_masks,
            max_new_tokens=max_new, eos_id=EOS, pad_id=0,
            use_flash=False, paged_decode=False))[0]
        ref.append(_strip(toks))

        # engine submission: bucket-padded right (the engine locates the
        # last valid position from the prompt mask)
        padded = np.zeros(bucket, np.int32)
        padded[:n] = ids
        pmask = np.zeros((1, bucket), np.float32)
        pmask[0, :n] = 1
        masks = llama.MaskBundle(jnp.asarray(mod), jnp.asarray(q))
        embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)
        reqs.append((embeds, pmask, masks))

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=4,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = [eng.submit(e, m, masks=mk, max_new_tokens=max_new)
            for e, m, mk in reqs]
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)


def test_engine_rejects_oversized(model):
    base, adapters = model
    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=1,
                       cache_capacity=16, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    p = np.arange(4, 12).astype(np.int32)
    fut = _submit(eng, base, p, max_new=100, bucket=8)
    eng.run_until_drained()
    assert len(fut.get_nowait()) == 0


def test_engine_tp_sharded_base(model):
    """Distributed serving: the engine with the frozen base sharded over an
    (fsdp x model) mesh produces the same tokens as the replicated engine —
    GSPMD inserts the collectives; the scheduler stays host-side."""
    from moka_tpu.core.config import MeshConfig
    from moka_tpu.parallel import sharding as shardlib
    from moka_tpu.parallel.mesh import make_mesh

    base, adapters = model
    prompts = _prompts(seed=4, n=5)
    max_new = 8
    ref = _reference_outputs(model, prompts, max_new)

    mesh = make_mesh(MeshConfig(data=1, fsdp=4, model=2))
    sharded = shardlib.shard_params(mesh, base)
    q_spec = str(sharded["layers"]["q"].sharding.spec)
    assert "model" in q_spec, q_spec  # really TP-sharded, not replicated

    eng = DecodeEngine(sharded, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = [_submit(eng, sharded, p, max_new) for p in prompts]
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)


def test_engine_http_streaming(model):
    """/generate_stream: token ids arrive as ndjson lines while the engine
    decodes, final line carries the decoded text; tokens match the
    per-request reference."""
    import json
    import threading
    import urllib.request

    from moka_tpu.eval.server import serve_continuous

    base, adapters = model
    prompts = _prompts(seed=7, n=1, lo=4, hi=7)
    max_new = 6
    ref = _reference_outputs(model, prompts, max_new)[0]

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)

    def prep(item):
        p = np.asarray(json.loads(item["prompt"]), np.int32)
        padded = np.zeros(16, np.int32)
        padded[:len(p)] = p
        mask = np.zeros((1, 16), np.float32)
        mask[0, :len(p)] = 1
        embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)
        return embeds, mask, None

    def decode_txt(toks):
        return " ".join(str(int(t)) for t in toks)

    server = serve_continuous(eng, prep, decode_txt, host="127.0.0.1",
                              port=0, max_new_tokens=max_new)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate_stream",
            data=json.dumps({"prompt": json.dumps(prompts[0].tolist())}
                            ).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            lines = [json.loads(l) for l in resp.read().splitlines()]
    finally:
        server.shutdown()
        eng.stop()
    toks = [l["token"] for l in lines if "token" in l]
    assert _strip(toks) == ref, (toks, ref)
    assert lines[-1]["output"] == " ".join(map(str, _strip(toks)))


def test_engine_http_serving(model):
    """serve_continuous: HTTP requests flow through the engine's background
    loop — two concurrent requests resolve with the same tokens the batch
    decoder would produce."""
    import json
    import threading
    import urllib.request

    from moka_tpu.eval.server import serve_continuous

    base, adapters = model
    prompts = _prompts(seed=3, n=2, lo=4, hi=7)
    max_new = 6
    ref = _reference_outputs(model, prompts, max_new)
    ref_txt = [" ".join(map(str, r)) for r in ref]

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)

    def prep(item):
        p = np.asarray(json.loads(item["prompt"]), np.int32)
        padded = np.zeros(16, np.int32)
        padded[:len(p)] = p
        mask = np.zeros((1, 16), np.float32)
        mask[0, :len(p)] = 1
        embeds = jnp.take(base["embed"], jnp.asarray(padded)[None], axis=0)
        return embeds, mask, None

    def decode_txt(toks):
        return " ".join(str(int(t)) for t in toks)

    server = serve_continuous(eng, prep, decode_txt, host="127.0.0.1",
                              port=0, max_new_tokens=max_new)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    outs = [None, None]

    def fetch(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": json.dumps(prompts[i].tolist())}
                            ).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            outs[i] = json.loads(resp.read())["output"]

    threads = [threading.Thread(target=fetch, args=(i,)) for i in range(2)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    finally:
        server.shutdown()
        eng.stop()
    assert outs == ref_txt, (outs, ref_txt)


def test_engine_admission_scans_deque(model):
    """Admission batches same-bucket requests from ANYWHERE in the pending
    deque (not just consecutive head): alternating buckets admit in two
    grouped prefills instead of four singles, outputs unchanged."""
    base, adapters = model
    prompts = _prompts(seed=11, n=4)
    max_new = 6
    ref = _reference_outputs(model, prompts, max_new)

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=4,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32)
    futs = [_submit(eng, base, p, max_new,
                    bucket=16 if i % 2 == 0 else 24)
            for i, p in enumerate(prompts)]
    eng._admit()
    # _dispatch_no counts prefill dispatches here: 2 groups, not 4 singles
    assert eng._dispatch_no == 2, eng._dispatch_no
    assert all(r is not None for r in eng.slot_req)
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)


def test_engine_early_readmission(model):
    """With requests queued and steps_per_dispatch large, the scan is
    capped at the soonest lane retirement so the freed lane refills next
    dispatch instead of idling out the scan (cur advances by the capped k,
    not the full 16)."""
    base, adapters = model
    prompts = _prompts(seed=12, n=2)
    max_new = 2
    ref = _reference_outputs(model, prompts, max_new)

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=1,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32, steps_per_dispatch=16)
    futs = [_submit(eng, base, p, max_new, bucket=16) for p in prompts]
    eng.run_until_drained()
    got = [_strip(f.get(timeout=1)) for f in futs]
    assert got == ref, (got, ref)
    # prompt bucket 16 + two capped dispatches of <=2 steps each lane;
    # uncapped scans would advance cur to 16 + 16*2 = 48
    assert eng.cur <= 16 + 4 * 2, eng.cur


def test_engine_pipeline_depth_invariance(model):
    """Pipelined dispatches (device-carried lane state, host sync overlapped
    with the next dispatch) must not change ANY output: ragged budgets,
    eos-capable decoding, slot reuse across 3x more requests than slots —
    identical across pipeline_depth 0 (round-3 unpipelined), 1 (default),
    and 2, with single- and multi-step dispatches."""
    base, adapters = model
    prompts = _prompts(seed=9, n=6)
    rng = np.random.default_rng(9)
    budgets = [int(b) for b in rng.integers(1, 14, len(prompts))]

    def run(depth, k):
        eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=2,
                           cache_capacity=64, eos_id=EOS, use_flash=False,
                           cache_dtype=jnp.float32, pipeline_depth=depth,
                           steps_per_dispatch=k)
        futs = [_submit(eng, base, p, b) for p, b in zip(prompts, budgets)]
        eng.run_until_drained()
        return [_strip(f.get(timeout=1)) for f in futs]

    ref = run(0, 1)
    for depth in (1, 2):
        for k in (1, 4):
            assert run(depth, k) == ref, (depth, k)


def test_engine_threaded_stress(model):
    """Server mode (daemon serve loop) under concurrent submission: three
    submitter threads race 12 ragged requests against the pipelined
    drain; every output must match the per-request reference and no
    waiter may hang."""
    import threading

    base, adapters = model
    prompts = _prompts(seed=11, n=12, lo=3, hi=9)
    rng = np.random.default_rng(11)
    budgets = [int(b) for b in rng.integers(1, 12, len(prompts))]

    eng = DecodeEngine(base, adapters, cfg=CFG, spec=SPEC, n_slots=3,
                       cache_capacity=64, eos_id=EOS, use_flash=False,
                       cache_dtype=jnp.float32, steps_per_dispatch=4)
    eng.start()
    futs = [None] * len(prompts)

    def submit(lo, hi):
        for i in range(lo, hi):
            futs[i] = _submit(eng, base, prompts[i], budgets[i])

    threads = [threading.Thread(target=submit, args=(i * 4, i * 4 + 4))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    got = [_strip(f.get(timeout=60)) for f in futs]
    eng.stop()

    # reference: per-request greedy, truncated to each budget
    ref = []
    for p, b_ in zip(prompts, budgets):
        embeds = jnp.take(base["embed"], jnp.asarray(p)[None], axis=0)
        mask = jnp.ones((1, len(p)), jnp.float32)
        toks = np.asarray(greedy_generate(
            base, adapters, cfg=CFG, spec=SPEC, inputs_embeds=embeds,
            prompt_mask=mask, masks=None, max_new_tokens=b_,
            eos_id=EOS, pad_id=0, use_flash=False, paged_decode=False))[0]
        ref.append(_strip(toks[:b_]))
    assert got == ref, (got, ref)
