"""Continuous-batching decode engine (slot-based serving).

The reference has no serving story (its eval drivers run offline
batch-1 ``generate`` loops — ``mmbench.py:594-641``); the round-1 server
(`eval/server.py`) micro-batches but decodes each batch to completion, so a
short request waits for the longest one in its batch.  This engine removes
that head-of-line blocking: a fixed number of *slots* (batch lanes) decode
together one token per step, finished lanes free immediately, and queued
requests prefill into free lanes mid-stream — the standard continuous
batching of production LLM servers, built TPU-style on static shapes.

Design (no change to ``llama.forward`` needed):

- The KV cache write index is a single shared cursor ``cur``: every step
  writes all lanes' new k/v at cell ``cur`` (exactly what the jitted decode
  step already does).  Per-lane validity lives in the (slots, S) attention
  mask; RoPE positions are per-lane token counts, so a lane's logical
  sequence is independent of which physical cells it occupies.
- New requests prefill into fresh lane caches (prompts bucket-padded right)
  and are inserted into free slots with one ``dynamic_update_index_in_dim``
  each — admission never recompiles or disturbs running lanes.  Consecutive
  queued requests sharing a prompt bucket prefill as ONE batch (text and
  multimodal alike; multimodal groups concatenate their modality-mask
  bundles along the batch axis).
- When ``cur`` hits capacity, a jitted *compaction* gathers each lane's
  valid cells to the front of its row (cached k/v already contain rotary
  phases, so moving cells is value-preserving) and the cursor rewinds to
  the longest lane.  Dead cells left by finished requests are reclaimed the
  same way.

- Dispatches are *pipelined*: the full lane state (last token, position,
  active flag, sampling budget) is carried ON DEVICE between dispatches, so
  dispatch i+1 is issued from dispatch i's carry before the host has read
  dispatch i's tokens — the per-dispatch host sync (a full link RTT on
  remote/tunneled chips) overlaps device compute instead of serializing
  with it.  Host bookkeeping lags by at most ``pipeline_depth`` dispatches;
  per-slot request snapshots taken at issue time keep emission exact across
  retire/re-admit races.

Static shapes throughout: one compiled step executable for the lifetime of
the engine, one prefill executable per prompt bucket.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from moka_tpu.core.config import LlamaConfig
from moka_tpu.models import llama
from moka_tpu.ops.moka import MokaSpec

Array = jax.Array


# ---------------------------------------------------------------- jitted ops

@functools.partial(jax.jit, static_argnames=("cfg", "spec", "use_flash",
                                             "cache_dtype", "kv_quant"))
def _prefill(base, adapters, *, cfg: LlamaConfig, spec: MokaSpec | None,
             inputs_embeds: Array, prompt_mask: Array,
             masks: llama.MaskBundle | None,
             rng: Array, temperature: Array, top_k: Array, top_p: Array,
             use_flash: bool = False, cache_dtype=jnp.bfloat16,
             kv_quant: bool = False):
    """Batched prefill into fresh lane caches sized to the prompt bucket.

    inputs_embeds (n, Lp, d): one or more queued requests sharing a bucket
    (admission groups them — one dispatch instead of n).  The first token is
    sampled per request (temperature == 0 rows take the argmax).
    Returns (first tokens (n,), lane_k/lane_v (layers, n, Lp, K, hd) — or
    int8 ``{"q", "s"}`` dicts when ``kv_quant``)."""
    from moka_tpu.eval.sampling import sample_tokens
    n, Lp, _ = inputs_embeds.shape
    cache = llama.init_kv_cache(cfg, n, Lp, dtype=cache_dtype,
                                quantized=kv_quant)
    pos = jnp.maximum(jnp.cumsum(prompt_mask, axis=-1) - 1, 0)
    logits, cache = llama.forward(
        base, cfg, adapters=adapters, spec=spec,
        inputs_embeds=inputs_embeds, masks=masks,
        attn_mask=prompt_mask, positions=pos, cache=cache,
        use_flash=use_flash)
    # last valid prompt position (works for left- OR right-padded prompts)
    last_idx = (Lp - 1 - jnp.argmax(jnp.flip(prompt_mask, axis=1), axis=1)
                ).astype(jnp.int32)
    last = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)
    tok = sample_tokens(last[:, 0, :], rng, temperature, top_k, top_p)
    return tok, cache["k"], cache["v"]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _insert(gk, gv, amask: Array, lanes_k, lanes_v,
            lane_masks: Array, slots: Array):
    """Write n prefilled lanes into the global cache in ONE dispatch.

    lanes_k/v are (layers, n, Lp, K, hd) with Lp <= S — or int8 cache dicts
    whose leaves have that layout; each lane row beyond Lp is zeroed (mask
    cleared) so stale cells from the previous occupant never leak into
    attention.  The n-loop unrolls at trace time (n <= n_slots); one
    executable per (n, Lp) admission-group shape."""
    S = llama.kv_cache_shape({"k": gk})[2]
    Lp = llama.kv_cache_shape({"k": lanes_k})[2]
    pad = ((0, 0), (0, S - Lp), (0, 0), (0, 0))
    for i in range(slots.shape[0]):
        put = lambda g, lane: jax.lax.dynamic_update_index_in_dim(
            g, jnp.pad(lane[:, i], pad), slots[i], axis=1)
        gk = jax.tree.map(put, gk, lanes_k)
        gv = jax.tree.map(put, gv, lanes_v)
        amask = jax.lax.dynamic_update_index_in_dim(
            amask, jnp.pad(lane_masks[i], ((0, S - Lp),)), slots[i], axis=0)
    return gk, gv, amask


@functools.partial(jax.jit,
                   static_argnames=("cfg", "spec", "paged_decode",
                                    "n_steps", "eos_id"),
                   donate_argnums=(2, 3, 4, 5, 6, 7, 8))
def _step_multi(base, adapters, gk: Array, gv: Array, amask: Array,
                tokens: Array, counts: Array, active: Array,
                budget: Array, cur: Array,
                rng: Array, temperature: Array, top_k: Array,
                top_p: Array, *,
                cfg: LlamaConfig, spec: MokaSpec | None,
                paged_decode: bool, n_steps: int, eos_id: int):
    """``n_steps`` decode steps in ONE dispatch (an on-device scan).

    Per-dispatch host-sync cost dominates single-token steps on
    high-latency links (remote/tunneled chips) and is pure overhead even
    locally; scanning k steps amortizes it k-fold.  Lanes that emit eos or
    exhaust their budget mid-scan go inactive on device (their later cells
    stay masked, their output rows repeat the last token and are dropped by
    the host scheduler).  Admission only happens between dispatches, so a
    freed lane idles for the remainder of the scan — the throughput/latency
    knob is ``steps_per_dispatch``.

    The full lane state (tokens, counts, active, budget) is returned so the
    next dispatch can be issued from the device-resident carry WITHOUT
    waiting for the host to read this dispatch's tokens — the engine
    pipelines dispatches and overlaps the host sync with device compute.

    Returns (toks (n_steps, slots), tokens, counts, active, budget,
    gk, gv, amask)."""
    from moka_tpu.eval.sampling import sample_tokens

    def body(carry, i):
        gk, gv, amask, tokens, counts, active, budget = carry
        cell = cur + i
        amask = amask.at[:, cell].set(active.astype(amask.dtype))
        embeds = jnp.take(base["embed"], tokens[:, None], axis=0)
        cache = {"k": gk, "v": gv, "length": cell}
        logits, cache = llama.forward(
            base, cfg, adapters=adapters, spec=spec,
            inputs_embeds=embeds, masks=None,
            attn_mask=amask, positions=counts[:, None], cache=cache,
            paged_decode=paged_decode)
        new_tok = sample_tokens(logits[:, -1, :], jax.random.fold_in(rng, i),
                                temperature, top_k, top_p)
        new_tok = jnp.where(active, new_tok, tokens)
        counts = counts + active.astype(counts.dtype)
        budget = budget - active.astype(budget.dtype)
        active = active & (new_tok != eos_id) & (budget > 0)
        return (cache["k"], cache["v"], amask, new_tok, counts, active,
                budget), new_tok

    carry, toks = jax.lax.scan(
        body, (gk, gv, amask, tokens, counts, active, budget),
        jnp.arange(n_steps))
    gk, gv, amask, tokens, counts, active, budget = carry
    return toks, tokens, counts, active, budget, gk, gv, amask


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _compact(gk, gv, amask: Array):
    """Gather each lane's valid cells to the front of its row.

    Returns (gk, gv, amask, new_cur) with new_cur = max lane occupancy."""
    S = amask.shape[1]
    # stable argsort of ~valid puts valid cell indices first, in order
    order = jnp.argsort(1 - amask, axis=1, stable=True)  # (slots, S)
    idx = order[None, :, :, None, None]
    gather = lambda g: jnp.take_along_axis(g, idx, axis=2)
    gk = jax.tree.map(gather, gk)
    gv = jax.tree.map(gather, gv)
    counts = jnp.sum(amask, axis=1).astype(jnp.int32)
    amask = (jnp.arange(S)[None, :] < counts[:, None]).astype(amask.dtype)
    return gk, gv, amask, jnp.max(counts)


def _concat_masks(group) -> "llama.MaskBundle | None":
    """Concatenate per-request MaskBundles along the batch axis.

    modality is (M, 1, Lp) per request, question (1, Lp); a bucket-matched
    admission group stacks to (M, n, Lp) / (n, Lp)."""
    if group[0].masks is None:
        return None
    if len(group) == 1:
        return group[0].masks
    return llama.MaskBundle(
        jnp.concatenate([jnp.asarray(r.masks.modality) for r in group],
                        axis=1),
        jnp.concatenate([jnp.asarray(r.masks.question) for r in group],
                        axis=0))


# ------------------------------------------------------------------- engine

@dataclasses.dataclass
class _Request:
    embeds: np.ndarray          # (1, Lp, d) bucket-padded prompt embeddings
    prompt_mask: np.ndarray     # (1, Lp)
    masks: llama.MaskBundle | None
    max_new_tokens: int
    done: "queue.Queue"
    tokens: list = dataclasses.field(default_factory=list)
    # optional live token feed: every emitted token id, then None (end)
    stream: "queue.Queue | None" = None
    # per-request sampling (temperature 0 = greedy, HF do_sample=False)
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0


class DecodeEngine:
    """Continuous-batching greedy decode over a fixed slot grid.

    Args:
      n_slots: concurrent decode lanes (the static batch of the step fn).
      cache_capacity: physical KV cells per lane (>= longest prompt +
        headroom; compaction reclaims dead cells when the cursor wraps).
      eos_id / pad_id: termination token / padding of returned sequences.
    """

    def __init__(self, base, adapters, *, cfg: LlamaConfig,
                 spec: MokaSpec | None, n_slots: int = 8,
                 cache_capacity: int = 2048, eos_id: int = 2,
                 pad_id: int = 0, use_flash: bool | None = None,
                 paged_decode: bool | None = None,
                 steps_per_dispatch: int = 1,
                 cache_dtype=jnp.bfloat16, kv_quant: bool = False,
                 sample_seed: int = 0, pipeline_depth: int = 1):
        self.base, self.adapters = base, adapters
        self.cfg, self.spec = cfg, spec
        self.n_slots, self.S = n_slots, cache_capacity
        self.eos_id, self.pad_id = eos_id, pad_id
        if use_flash is None:
            use_flash = jax.default_backend() == "tpu"
        self.use_flash = use_flash
        if paged_decode is None:
            # the measured capacity/model-size gate shared with the batch
            # decoders (eval/decode.py::paged_decode_auto): the block loop
            # only pays where the cache read dominates the step — and is
            # mandatory-on for int8 caches (eager dequant materializes)
            from moka_tpu.eval.decode import paged_decode_auto
            paged_decode = paged_decode_auto(cfg, cache_capacity,
                                             kv_quant=kv_quant)
        self.paged_decode = paged_decode
        # >1 = scan k decode steps per dispatch (amortizes the per-dispatch
        # host sync; new requests wait up to k steps for admission)
        self.steps_per_dispatch = steps_per_dispatch

        self.cache_dtype = cache_dtype
        # int8 cache: halves per-step cache HBM reads (the decode bound at
        # 7B — PERFORMANCE.md); lanes quantize k/v on write, every consumer
        # (insert/compact/step/paged kernel) handles the {"q","s"} layout
        self.kv_quant = kv_quant
        cache = llama.init_kv_cache(cfg, n_slots, cache_capacity,
                                    dtype=cache_dtype, quantized=kv_quant)
        self.gk, self.gv = cache["k"], cache["v"]
        self.amask = jnp.zeros((n_slots, cache_capacity), jnp.float32)
        self.cur = 0                       # next shared write cell
        self.tokens = np.zeros(n_slots, np.int32)   # last token per lane
        self.counts = np.zeros(n_slots, np.int32)   # logical length per lane
        self.budget = np.zeros(n_slots, np.int32)   # remaining new tokens
        # per-lane sampling parameters (temperature 0 = greedy lane)
        self.temp = np.zeros(n_slots, np.float32)
        self.topk = np.zeros(n_slots, np.int32)
        self.topp = np.ones(n_slots, np.float32)
        self._key = jax.random.key(sample_seed)
        self._dispatch_no = 0
        # Device-resident lane state.  Admission scatters new-lane values in
        # WITHOUT a host sync and each decode dispatch carries the updated
        # state back as device arrays, so dispatch i+1 can be ISSUED from the
        # carry of dispatch i before the host has read dispatch i's tokens —
        # the host sync (one link RTT on tunneled chips) overlaps device
        # compute.  ``pipeline_depth`` bounds how many dispatches may be in
        # flight unharvested (0 = harvest immediately, the unpipelined
        # round-1..3 behavior).
        self.pipeline_depth = max(0, int(pipeline_depth))
        self._tokens_dev = jnp.zeros((n_slots,), jnp.int32)
        self._counts_dev = jnp.zeros((n_slots,), jnp.int32)
        self._active_dev = jnp.zeros((n_slots,), jnp.bool_)
        self._budget_dev = jnp.zeros((n_slots,), jnp.int32)
        self._temp_dev = jnp.zeros((n_slots,), jnp.float32)
        self._topk_dev = jnp.zeros((n_slots,), jnp.int32)
        self._topp_dev = jnp.ones((n_slots,), jnp.float32)
        # in-flight decode dispatches awaiting host-side token emission:
        # (device toks (k, slots), per-slot request snapshot at issue time)
        self._inflight: "collections.deque" = collections.deque()
        # (group, slots, device toks) awaiting host-side emission
        self._pending_admits: list = []
        self.slot_req: list[_Request | None] = [None] * n_slots
        # deque (not Queue): admission peeks at the head to group
        # same-bucket requests into one batched prefill
        self.pending: "collections.deque[_Request]" = collections.deque()
        self._lock = threading.Lock()

    # -- public API --------------------------------------------------------

    def submit(self, embeds, prompt_mask, masks=None,
               max_new_tokens: int = 128,
               stream: "queue.Queue | None" = None,
               temperature: float = 0.0, top_k: int = 0,
               top_p: float = 1.0) -> "queue.Queue":
        """Queue one request; returns a Queue that receives the np.int32
        token array when generation finishes.  ``stream``: optional Queue
        that receives each token id as it is emitted, then None.
        ``temperature``/``top_k``/``top_p``: per-request sampling; the
        default temperature 0 decodes greedily (HF ``do_sample=False``)."""
        done: queue.Queue = queue.Queue(maxsize=1)
        self.pending.append(_Request(np.asarray(embeds),
                                     np.asarray(prompt_mask), masks,
                                     max_new_tokens, done, stream=stream,
                                     temperature=float(temperature),
                                     top_k=int(top_k), top_p=float(top_p)))
        return done

    def start(self) -> None:
        """Run the admit/step loop on a daemon thread (server mode)."""
        self._stop = False
        self._thread = threading.Thread(target=self._serve_loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop = True
        if getattr(self, "_thread", None) is not None:
            self._thread.join(timeout=5)

    def _serve_loop(self) -> None:
        import time
        import traceback
        while not self._stop:
            try:
                with self._lock:
                    self._admit()
                    busy = any(self.slot_req)
                    issued = self._issue() if busy else False
                    depth = self.pipeline_depth if busy else 0
                    if not issued:
                        depth = min(depth, max(0, len(self._inflight) - 1))
                    self._harvest_to(depth)
                    busy = busy or bool(self._inflight)
            except Exception:
                # fail every waiter instead of hanging clients, then exit
                traceback.print_exc()
                err = np.asarray([], np.int32)
                for r in self.slot_req:
                    if r is not None:
                        self._finish(r, err)
                self.slot_req = [None] * self.n_slots
                self._inflight.clear()
                while self.pending:
                    self._finish(self.pending.popleft(), err)
                self._stop = True
                return
            if not busy:
                time.sleep(0.005)

    def run_until_drained(self, max_steps: int = 100_000) -> int:
        """Drive the engine until no pending or active requests remain.
        Returns the number of decode dispatches executed (each runs
        ``steps_per_dispatch`` token steps)."""
        steps = 0
        while (self.pending or any(self.slot_req) or self._inflight) \
                and steps < max_steps:
            self._admit()
            issued = False
            if any(self.slot_req):
                issued = self._issue()
                steps += int(issued)
            # keep at most pipeline_depth dispatches unharvested while more
            # work exists; drain fully once the host view goes idle — and
            # force progress when _issue declined (all owed tokens already
            # in flight)
            depth = self.pipeline_depth if any(self.slot_req) else 0
            if not issued:
                depth = min(depth, max(0, len(self._inflight) - 1))
            self._harvest_to(depth)
        return steps

    # -- scheduler internals -------------------------------------------------

    def _free_slots(self):
        return [i for i, r in enumerate(self.slot_req) if r is None]

    @staticmethod
    def _finish(req: _Request, tokens: np.ndarray) -> None:
        if req.stream is not None:
            req.stream.put(None)  # end-of-stream sentinel
        req.done.put(tokens)

    def _fits(self, req: _Request) -> bool:
        if int(req.prompt_mask.sum()) + req.max_new_tokens > self.S:
            self._finish(req, np.asarray([], np.int32))  # cannot fit
            return False
        return True

    def _admit(self):
        free = self._free_slots()
        while free and self.pending:
            req = self.pending.popleft()
            if not self._fits(req):
                continue
            Lp = req.embeds.shape[1]
            # scan the whole pending deque for requests sharing the prompt
            # bucket AND modality kind (multimodal: also the mask-bundle
            # shape, so _concat_masks cannot mismatch) and batch them into
            # ONE prefill (n dispatches -> 1).  Non-matching requests keep
            # their relative order; the head request is always admitted
            # first, so nothing starves.
            group = [req]
            is_mm = req.masks is not None

            def _matches(cand: _Request) -> bool:
                if cand.embeds.shape[1] != Lp:
                    return False
                if (cand.masks is not None) != is_mm:
                    return False
                if is_mm and (cand.masks.modality.shape
                              != req.masks.modality.shape):
                    return False
                return True

            skipped = []
            while self.pending and len(group) < len(free):
                nxt = self.pending.popleft()
                if not _matches(nxt):
                    skipped.append(nxt)
                elif self._fits(nxt):
                    group.append(nxt)
            self.pending.extendleft(reversed(skipped))
            self._dispatch_no += 1
            toks, ks, vs = _prefill(
                self.base, self.adapters, cfg=self.cfg, spec=self.spec,
                inputs_embeds=jnp.asarray(
                    np.concatenate([r.embeds for r in group])),
                prompt_mask=jnp.asarray(
                    np.concatenate([r.prompt_mask for r in group]),
                    jnp.float32),
                masks=_concat_masks(group),
                rng=jax.random.fold_in(self._key, self._dispatch_no),
                temperature=jnp.asarray([r.temperature for r in group],
                                        jnp.float32),
                top_k=jnp.asarray([r.top_k for r in group], jnp.int32),
                top_p=jnp.asarray([r.top_p for r in group], jnp.float32),
                use_flash=self.use_flash,
                cache_dtype=self.cache_dtype, kv_quant=self.kv_quant)
            slots = [free.pop(0) for _ in group]
            slots_d = jnp.asarray(slots, jnp.int32)
            self.gk, self.gv, self.amask = _insert(
                self.gk, self.gv, self.amask, ks, vs,
                jnp.asarray(np.concatenate(
                    [r.prompt_mask for r in group]), jnp.float32), slots_d)
            # scatter the new lanes' state into the device mirrors (async —
            # no host sync; the prefill-token read happens in _flush_admits
            # AFTER the next decode dispatch is issued).  The active flag is
            # computed ON DEVICE from the prefill token so an eos-first-token
            # or budget-1 lane never decodes, even though the host has not
            # seen the token yet.
            lens = np.asarray([int(r.prompt_mask.sum()) for r in group],
                              np.int32)
            buds = np.asarray([r.max_new_tokens - 1 for r in group],
                              np.int32)
            buds_d = jnp.asarray(buds)
            self._tokens_dev = self._tokens_dev.at[slots_d].set(toks)
            self._counts_dev = self._counts_dev.at[slots_d].set(
                jnp.asarray(lens))
            self._budget_dev = self._budget_dev.at[slots_d].set(buds_d)
            self._active_dev = self._active_dev.at[slots_d].set(
                (toks != self.eos_id) & (buds_d > 0))
            self._temp_dev = self._temp_dev.at[slots_d].set(
                jnp.asarray([r.temperature for r in group], jnp.float32))
            self._topk_dev = self._topk_dev.at[slots_d].set(
                jnp.asarray([r.top_k for r in group], jnp.int32))
            self._topp_dev = self._topp_dev.at[slots_d].set(
                jnp.asarray([r.top_p for r in group], jnp.float32))
            self._pending_admits.append((group, slots, toks))
            for r, slot in zip(group, slots):
                self.slot_req[slot] = r
                self.counts[slot] = int(r.prompt_mask.sum())
                # matches buds_d: the prefill token (emitted later, in
                # _flush_admits, charge=False) is already paid for here, so
                # _issue's horizon never runs one token high pre-flush
                self.budget[slot] = r.max_new_tokens - 1
                self.temp[slot] = r.temperature
                self.topk[slot] = r.top_k
                self.topp[slot] = r.top_p
                self.cur = max(self.cur, Lp)

    def _emit(self, slot: int, tok: int, charge: bool = True):
        """Record one generated token; retire the lane on eos/budget.
        ``charge=False`` for the deferred prefill token, whose budget debit
        already happened at admit (host and device mirrors stay equal)."""
        req = self.slot_req[slot]
        req.tokens.append(tok)
        if req.stream is not None:
            req.stream.put(tok)
        if charge:
            self.budget[slot] -= 1
        if tok == self.eos_id or self.budget[slot] <= 0:
            self._finish(req, np.asarray(req.tokens, np.int32))
            self.slot_req[slot] = None
            self.amask = self.amask.at[slot].set(0.0)  # reclaimable cells
            self.counts[slot] = 0

    def _flush_admits(self):
        """Host-side emission of deferred first tokens (the device scatter
        already happened in ``_admit``).  Called AFTER the next decode
        dispatch so the prefill-result sync overlaps the decode scan; a lane
        retired here (eos/budget-1 first token) wastes at most that one
        already-dispatched scan — its outputs are dropped by the
        ``slot_req[slot] is None`` guard and its cells are re-masked."""
        for group, slots, toks in self._pending_admits:
            vals = np.asarray(toks)
            for i, (r, slot) in enumerate(zip(group, slots)):
                self.tokens[slot] = int(vals[i])
                self._emit(slot, int(vals[i]), charge=False)
        self._pending_admits.clear()

    def _issue(self):
        """Issue ONE decode dispatch from the device-resident lane state.

        No host sync happens here: the lane carry (tokens/counts/active/
        budget) lives on device, so dispatch i+1 can launch while the host
        is still waiting on dispatch i's tokens (``_harvest_to``).  Host
        bookkeeping (budgets for the horizon, ``cur``) may lag the device by
        up to ``pipeline_depth`` dispatches — the horizon below subtracts
        the in-flight steps so the lag cannot issue whole wasted scans
        (measured: at k=64 un-adjusted pipelining LOST to unpipelined
        because each stale tail dispatch burned 64 dead-lane steps).

        Returns False (and issues nothing) when every token still owed by
        the active lanes is already covered by in-flight dispatches — the
        caller should harvest instead."""
        k = self.steps_per_dispatch

        # steps already dispatched but not yet harvested: the host budgets
        # below don't know about them yet.  Charged PER LANE via the issue
        # snapshots — a lane admitted after a dispatch was issued gets no
        # tokens from it (the harvest guard drops rows whose snapshot
        # occupant differs), so a uniform subtraction would under-count its
        # owed tokens and could decline to issue right after an admission.
        def lane_inflight(i, r):
            return sum(t.shape[0] for t, snap in self._inflight
                       if snap[i] is r)
        if k > 1:
            # cap the scan at the relevant retirement horizon: with requests
            # queued, the SOONEST lane retirement (early re-admission — the
            # freed lane refills next loop instead of idling out the scan);
            # otherwise the LATEST (steps past every lane's budget are pure
            # waste).  Rounded up to a power of two to bound the set of
            # compiled _step_multi executables at log2(steps_per_dispatch).
            remaining = [self.budget[i] - lane_inflight(i, r)
                         for i, r in enumerate(self.slot_req)
                         if r is not None]
            owed = [r for r in remaining if r > 0]
            if not owed:
                if self._inflight:
                    return False
                owed = [1]  # unreachable in practice; keep k minimal
            horizon = min(owed) if self.pending else max(owed)
            cap = 1
            while cap < max(1, horizon):
                cap *= 2
            k = min(k, cap)
        elif self._inflight and not any(
                self.budget[i] - lane_inflight(i, r) > 0
                for i, r in enumerate(self.slot_req) if r is not None):
            return False
        if self.cur > self.S - k:
            # compaction reads lane occupancy back to the host: drain the
            # pipeline first so retired lanes' cells are already re-masked
            self._harvest_to(0)
            self.gk, self.gv, self.amask, new_cur = _compact(
                self.gk, self.gv, self.amask)
            self.cur = int(new_cur)
            if self.cur > self.S - k:  # genuinely full: lanes at capacity
                raise RuntimeError(
                    f"cache capacity {self.S} exhausted by active lanes")
        self._dispatch_no += 1
        rng = jax.random.fold_in(self._key, self._dispatch_no)
        (toks_d, self._tokens_dev, self._counts_dev, self._active_dev,
         self._budget_dev, self.gk, self.gv, self.amask) = _step_multi(
            self.base, self.adapters, self.gk, self.gv, self.amask,
            self._tokens_dev, self._counts_dev, self._active_dev,
            self._budget_dev, jnp.asarray(self.cur, jnp.int32),
            rng, self._temp_dev, self._topk_dev, self._topp_dev,
            cfg=self.cfg, spec=self.spec,
            paged_decode=self.paged_decode, n_steps=k,
            eos_id=self.eos_id)
        # snapshot WHICH request occupied each slot at issue time: harvest
        # emits a row to a slot only while the same request still owns it
        # (a lane retired+re-admitted between issue and harvest must not
        # leak the old occupant's repeated rows into the new request)
        self._inflight.append((toks_d, list(self.slot_req)))
        self.cur += k
        # prefill-token sync AFTER the dispatch is in flight (overlaps it)
        self._flush_admits()
        return True

    def _harvest_to(self, depth: int):
        """Emit tokens of in-flight dispatches until <= ``depth`` remain."""
        while len(self._inflight) > depth:
            toks_d, snapshot = self._inflight.popleft()
            toks = np.asarray(toks_d)  # the one host sync per dispatch
            for i in range(toks.shape[0]):
                for slot in range(self.n_slots):
                    # skip lanes that were empty at issue, retired at an
                    # earlier micro-step (their rows repeat the last token),
                    # or re-admitted to a new request since issue
                    if snapshot[slot] is None or \
                            self.slot_req[slot] is not snapshot[slot]:
                        continue
                    self.counts[slot] += 1
                    self.tokens[slot] = int(toks[i, slot])
                    self._emit(slot, int(toks[i, slot]))

    def _decode_step(self):
        """One issue + harvest-to-depth cycle (kept for tests/tools that
        drive the engine manually)."""
        issued = self._issue()
        self._harvest_to(self.pipeline_depth if issued
                         else max(0, len(self._inflight) - 1))
