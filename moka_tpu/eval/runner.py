"""Distributed batched inference driver.

Reference: ``AudioVisualText/scripts/finetune/inference_cut.py`` — DDP wrap
+ ``Test_DistributedSampler`` (strided rank sharding WITHOUT wrap-padding,
:32-50, so no duplicate predictions), batched greedy generate, per-rank
JSONL shards merged by the scorers.

TPU equivalent: ``jax.process_index()``-strided index sharding; each host
runs the jitted generate on its shard and writes
``result_rank{r}.jsonl``."""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, Sequence


def shard_indices(n: int, rank: int, world: int) -> list[int]:
    """Strided, no padding duplicates (inference_cut.py:32-50)."""
    return list(range(rank, n, world))


def batched(seq: Sequence, batch_size: int) -> Iterable[list]:
    buf = []
    for x in seq:
        buf.append(x)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def write_jsonl(path: str, rows: Iterable[dict], mode: str = "a") -> None:
    with open(path, mode) as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def run_inference(dataset, generate_fn: Callable[[list], list[dict]],
                  out_dir: str, task: str, batch_size: int = 8,
                  rank: int | None = None, world: int | None = None) -> str:
    """generate_fn(items) -> list of result dicts (one per item)."""
    import jax
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"result_rank{rank}_{task}.jsonl")
    if os.path.exists(out_path):
        os.remove(out_path)
    idxs = shard_indices(len(dataset), rank, world)
    for chunk in batched(idxs, batch_size):
        items = [dataset[i] for i in chunk]
        write_jsonl(out_path, generate_fn(items))
    return out_path
