"""Parameter/activation sharding rules.

FSDP (ZeRO-3 equivalent) + tensor parallel via one rule table instead of a
runtime engine: frozen base weights are sharded over the ``fsdp`` axis and
all-gathered per layer by XLA; the 7 projections additionally shard over
``model`` (supersedes the reference's vestigial ``pretraining_tp`` branches,
``AudioVisualText/models/modeling_llama.py:308-323``).  Adapters and
projectors are tiny and stay replicated, so their gradient all-reduce is a
few MB over ICI — the whole DeepSpeed ZeRO engine collapses into these
annotations.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Rules are (path regex, spec) pairs; first match wins.  Paths look like
# "llama/layers/q", "adapters/layers/q/a", "llama/embed", ...
# Layer-stacked arrays have a leading n_layers axis (always unsharded).
RULES: list[tuple[str, P]] = [
    # --- frozen LLaMA base (layer-stacked) ---
    (r".*layers/(q|k|v)$",        P(None, "fsdp", "model")),
    (r".*layers/o$",              P(None, "model", "fsdp")),
    (r".*layers/(gate|up)$",      P(None, "fsdp", "model")),
    (r".*layers/down$",           P(None, "model", "fsdp")),
    # --- int8-quantized base: {w_i8, scale} dict leaves (ops/quant.py).
    # w_i8 shards like the bf16 weight; the (N, 1, d_out) per-out-channel
    # scale shards along d_out to match the weight's output axis (the
    # ZeRO-3-for-quantized-bases analog of zero_stage3_config_70b.json).
    # (w_i4 = nibble-packed int4: the packed axis is still the input dim,
    # at half length — same spec applies.)
    (r".*layers/(q|k|v|gate|up)/w_i[84]$",  P(None, "fsdp", "model")),
    (r".*layers/(q|k|v|gate|up)/scale$",    P(None, None, "model")),
    (r".*layers/(o|down)/w_i[84]$",         P(None, "model", "fsdp")),
    (r".*layers/(o|down)/scale$",           P(None, None, "fsdp")),
    (r".*layers/(attn_norm|mlp_norm)$", P(None, None)),
    # (.*/)? — these leaves sit at the tree root when the llama dict is
    # sharded bare (paths like "lm_head"), under a prefix otherwise
    (r"(.*/)?embed$",             P(None, "fsdp")),
    (r"(.*/)?lm_head$",           P("fsdp", "model")),
    # quantized lm_head: (d, V) int weight + (1, V) per-out-channel scale
    (r"(.*/)?lm_head/w_i[84]$",   P("fsdp", "model")),
    (r"(.*/)?lm_head/scale$",     P(None, "model")),
    (r"(.*/)?final_norm$",        P(None)),
    # --- adapters: replicated (a few MB total) ---
    (r".*adapters.*",             P()),
    # --- encoders / projectors: replicated by default ---
    (r".*",                       P()),
]


def spec_for_path(path: str, ndim: int) -> P:
    for pat, spec in RULES:
        if re.fullmatch(pat, path):
            # pad/truncate spec to the array rank
            parts = list(spec) + [None] * (ndim - len(spec))
            return P(*parts[:ndim])
    return P()


def _path_str(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return "/".join(out)


def _divisible_spec(mesh: Mesh, spec: P, shape) -> P:
    """Drop spec entries whose mesh-axis product does not divide the dim.

    Real checkpoints have indivisible dims — e.g. the resized LLaMA vocab
    32011 (32000 + 11 special tokens) is odd, so the lm_head's (d, V)
    cannot TP-shard its vocab axis over model=2 (caught by
    ``exp_multichip_aot.py`` at flagship shapes; ``jax.device_put`` requires
    even division).  Such dims fall back to replicated-along-that-dim; the
    rest of the spec is kept."""
    parts = []
    for dim, part in zip(shape, spec):
        if part is None:
            parts.append(None)
            continue
        names = part if isinstance(part, tuple) else (part,)
        n = 1
        for name in names:
            n *= mesh.shape[name]
        parts.append(part if dim % n == 0 else None)
    return P(*parts)


def param_shardings(mesh: Mesh, params, host_offload: bool = False) -> dict:
    """NamedSharding pytree matching ``params`` (works on shapes or arrays).

    ``host_offload=True`` places the (sharded) leaves in ``pinned_host``
    memory — the analog of the reference's ZeRO-3 parameter offload for
    100B-class bases (``zero_stage3_config_100b_1e7_offload.json:13-20``);
    XLA streams them to HBM per use."""
    def one(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        spec = spec_for_path(_path_str(path), len(shape))
        sh = NamedSharding(mesh, _divisible_spec(mesh, spec, shape))
        if host_offload:
            sh = sh.with_memory_kind("pinned_host")
        return sh
    return jax.tree_util.tree_map_with_path(one, params)


def stream_shardings(mesh: Mesh, params) -> dict:
    """Device-memory shardings for streaming a ``pinned_host``-resident
    base into HBM per use (``llama.forward(host_stream=...)``).

    The ``layers`` subtree gets PER-SLICE shardings (the stacked leading
    layer axis dropped): the layer scan's body DMAs exactly one layer's
    weights host->device per iteration, so peak HBM holds one layer of the
    base instead of all of it — the TPU-native analog of the reference's
    ZeRO-3 parameter offload for 100B-class bases
    (``zero_stage3_config_100b_1e7_offload.json:13-20``), with XLA's
    latency-hiding scheduler overlapping the DMA with the previous layer's
    compute.  Non-stacked leaves (embed/lm_head/final_norm) get their full
    rule-table sharding in device memory."""
    def one(path, leaf):
        p = _path_str(path)
        shape = tuple(getattr(leaf, "shape", ()))
        spec = spec_for_path(p, len(shape))
        if "layers/" in p:
            # drop the stacked layer axis: the scan slices it away
            spec = P(*list(spec)[1:])
            shape = shape[1:]
        return NamedSharding(mesh, _divisible_spec(mesh, spec, shape),
                             memory_kind="device")
    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params, host_offload: bool = False):
    return jax.device_put(params,
                          param_shardings(mesh, params,
                                          host_offload=host_offload))


def constrain(mesh: Mesh, x, *spec_parts):
    """with_sharding_constraint helper for activations."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec_parts)))
