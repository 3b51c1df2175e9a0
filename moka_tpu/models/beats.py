"""BEATs audio encoder (frozen) — conv patch embed + deep-norm transformer
with gated relative position bias.

Reference: ``AudioVisualText/models/beats/BEATs.py`` (frontend,
``BEATs.py:89-160``) and ``models/beats/backbone.py`` (TransformerEncoder,
MultiheadAttention with T5-bucket relative bias shared across layers
``backbone.py:78-81,392-430`` and GRU-style gating ``backbone.py:650-658``;
deep-norm post-LN residual scaling ``backbone.py:248-273``).

TPU translation choices:
  * the 16x16 patch conv is an unfold+matmul (MXU) like the CLIP tower;
  * the grouped conv positional embedding stays a real conv
    (``lax.conv_general_dilated`` with ``feature_group_count``) — it is 0.1%
    of the FLOPs; weight-norm is folded into the stored weight by the
    checkpoint importer;
  * the reference's (scores/32 - rowmax)*32 trick (``backbone.py:513-515,
    623-624``) is a numerical identity for softmax and is replaced by a plain
    fp32 softmax;
  * the relative bias table is embedded once (shared across layers,
    ``backbone.py:78-81``) and each layer applies its own query-conditioned
    gate inside the scan.

The encoder is frozen (``multimodal_encoder.py:183-186``): no dropout paths.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BeatsConfig:
    """Defaults = BEATs_iter3_plus_AS2M checkpoint config
    (``BEATs.py:26-66``; deep_norm/relative bias/gru flags restored from the
    ckpt cfg at load time, ``multimodal_encoder.py:178-182``)."""

    input_patch_size: int = 16
    embed_dim: int = 512
    encoder_embed_dim: int = 768
    encoder_layers: int = 12
    encoder_ffn_dim: int = 3072
    encoder_heads: int = 12
    conv_bias: bool = False
    deep_norm: bool = True
    layer_norm_first: bool = False
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 1280
    gru_rel_pos: bool = True
    conv_pos: int = 128
    conv_pos_groups: int = 16
    ln_eps: float = 1e-5
    # int8-quantized towers only: per-token int8 activations on the dense
    # dots (MXU int8 path); frozen + fwd-only, see ClipVitConfig.a8_dots
    a8_dots: bool = False

    @property
    def head_dim(self) -> int:
        return self.encoder_embed_dim // self.encoder_heads

    @property
    def deep_norm_alpha(self) -> float:
        return (2 * self.encoder_layers) ** 0.25 if self.deep_norm else 1.0

    @staticmethod
    def tiny() -> "BeatsConfig":
        return BeatsConfig(input_patch_size=16, embed_dim=24,
                           encoder_embed_dim=48, encoder_layers=2,
                           encoder_ffn_dim=96, encoder_heads=4,
                           num_buckets=16, max_distance=64, conv_pos=16,
                           conv_pos_groups=4)


def init_beats_params(rng: Array, cfg: BeatsConfig, dtype=jnp.float32) -> dict:
    e, h, f, p = cfg.embed_dim, cfg.encoder_embed_dim, cfg.encoder_ffn_dim, \
        cfg.input_patch_size
    n, hd = cfg.encoder_layers, cfg.head_dim
    ks = list(jax.random.split(rng, 16))

    def lin(k, a, b, std=0.02):
        return {"w": (jax.random.normal(k, (a, b)) * std).astype(dtype),
                "b": jnp.zeros((b,), dtype)}

    def lnp():
        return {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}

    def stack(maker):
        outs = [maker(k) for k in jax.random.split(ks.pop(), n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    layers = {
        "q": stack(lambda k: lin(k, h, h)),
        "k": stack(lambda k: lin(k, h, h)),
        "v": stack(lambda k: lin(k, h, h)),
        "out": stack(lambda k: lin(k, h, h)),
        "ln_attn": stack(lambda k: lnp()),
        "fc1": stack(lambda k: lin(k, h, f)),
        "fc2": stack(lambda k: lin(k, f, h)),
        "ln_final": stack(lambda k: lnp()),
        "grep": stack(lambda k: lin(k, hd, 8)),
        "grep_a": stack(lambda k: jnp.ones((cfg.encoder_heads,), dtype)),
    }
    return {
        "patch": (jax.random.normal(ks.pop(), (p * p, e)) * 0.02).astype(dtype),
        "patch_bias": jnp.zeros((e,), dtype) if cfg.conv_bias else None,
        "frontend_ln": {"g": jnp.ones((e,), dtype), "b": jnp.zeros((e,), dtype)},
        "post_proj": lin(ks.pop(), e, h),
        "pos_conv_w": (jax.random.normal(
            ks.pop(), (h, h // cfg.conv_pos_groups, cfg.conv_pos))
            * math.sqrt(4.0 / (cfg.conv_pos * h))).astype(dtype),
        "pos_conv_b": jnp.zeros((h,), dtype),
        "encoder_ln": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
        "rel_bias": (jax.random.normal(
            ks.pop(), (cfg.num_buckets, cfg.encoder_heads)) * 0.02).astype(dtype),
        "layers": layers,
    }


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]).astype(x.dtype)


def _dense(x, p, a8=False):
    # p["w"] may be an int8/int4 dict (quantize_encoder — the tower is as
    # frozen as the LLaMA base); the dequant fuses into the dot operand.
    # a8 (int8 weights only): per-token int8 activations -> MXU int8 dots.
    from moka_tpu.ops.quant import is_quantized, qmatmul, qmatmul_a8
    if is_quantized(p["w"]):
        if a8 and "w_i8" in p["w"] and x.ndim == 3:
            return qmatmul_a8(x, p["w"]) + p["b"]
        return qmatmul(x, p["w"], spec="...d,df->...f") + p["b"]
    return jnp.einsum("...d,df->...f", x, p["w"]) + p["b"]


def _t5_bucket_bidirectional(rel: Array, num_buckets: int,
                             max_distance: int) -> Array:
    """T5 relative-position bucketing (``backbone.py:392-417``)."""
    nb = num_buckets // 2
    ret = (rel > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, nb - 1)
    return ret + jnp.where(is_small, n, val_large)


def relative_bias(params: dict, cfg: BeatsConfig, length: int) -> Array:
    """(heads, L, L) shared-table bias (``backbone.py:419-430``)."""
    pos = jnp.arange(length)
    rel = pos[None, :] - pos[:, None]  # memory - context
    bucket = _t5_bucket_bidirectional(rel, cfg.num_buckets, cfg.max_distance)
    vals = jnp.take(params["rel_bias"], bucket, axis=0)  # (L, L, heads)
    return vals.transpose(2, 0, 1)


def patchify_fbank(fbank: Array, patch: int) -> Array:
    """(B, T, 128) -> (B, T//p * 128//p, p*p) in the conv's flatten order:
    spatial index = t' * n_freq_patches + f', block row-major (kt, kf)."""
    B, T, F = fbank.shape
    tp, fp = T // patch, F // patch
    x = fbank[:, : tp * patch, :].reshape(B, tp, patch, fp, patch)
    x = x.transpose(0, 1, 3, 2, 4)  # B, tp, fp, kt, kf
    return x.reshape(B, tp * fp, patch * patch)


def _pos_conv(x: Array, params: dict, cfg: BeatsConfig) -> Array:
    """Grouped conv positional embedding + SamePad trim + GELU
    (``backbone.py:33-46,114-116``)."""
    pad = cfg.conv_pos // 2
    y = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 1), params["pos_conv_w"], window_strides=(1,),
        padding=[(pad, pad)], feature_group_count=cfg.conv_pos_groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = y + params["pos_conv_b"][None, :, None]
    if cfg.conv_pos % 2 == 0:
        y = y[:, :, :-1]  # SamePad removes the extra trailing step
    return jax.nn.gelu(y.transpose(0, 2, 1), approximate=False)


def beats_encode(params: dict, cfg: BeatsConfig, fbank: Array,
                 padding_mask: Array | None = None) -> Array:
    """(B, T, 128) normalized fbank -> (B, n_tokens, encoder_embed_dim).

    Mirrors ``BEATs.extract_features(..., feature_only=True)``
    (``BEATs.py:134-182``): patch embed -> LN -> 512->768 proj -> conv pos ->
    LN -> 12 deep-norm layers with gated relative bias."""
    x = jnp.einsum("bnp,pe->bne", patchify_fbank(fbank, cfg.input_patch_size),
                   params["patch"])
    if params.get("patch_bias") is not None:
        x = x + params["patch_bias"]
    x = _ln(x, params["frontend_ln"], cfg.ln_eps)
    x = _dense(x, params["post_proj"])

    if padding_mask is not None:
        x = x * (1 - padding_mask.astype(x.dtype))[..., None]

    x = x + _pos_conv(x, params, cfg)
    if not cfg.layer_norm_first:
        x = _ln(x, params["encoder_ln"], cfg.ln_eps)

    B, L, h = x.shape
    H, hd = cfg.encoder_heads, cfg.head_dim
    alpha = cfg.deep_norm_alpha
    pos_bias = relative_bias(params, cfg, L) if \
        cfg.relative_position_embedding else None
    if padding_mask is not None:
        key_bias = jnp.where(padding_mask[:, None, None, :] > 0, -1e30, 0.0)
    else:
        key_bias = None

    def layer(x, p):
        dense = functools.partial(_dense, a8=cfg.a8_dots)
        q = dense(x, p["q"]).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = dense(x, p["k"]).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = dense(x, p["v"]).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(jnp.float32(hd))
        if key_bias is not None:
            s = s + key_bias
        if pos_bias is not None:
            bias = pos_bias[None]
            if cfg.gru_rel_pos:
                # query-conditioned gate (backbone.py:652-658)
                gates = jax.nn.sigmoid(
                    _dense(q, p["grep"]).reshape(B, H, L, 2, 4).sum(-1))
                gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
                gate = gate_a * (gate_b * p["grep_a"][None, :, None, None]
                                 - 1.0) + 2.0
                bias = gate * bias
            s = s + bias
        pr = jax.nn.softmax(s.astype(jnp.float32), -1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", pr.astype(v.dtype), v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, h)
        x = _ln(x * alpha + dense(ctx, p["out"]), p["ln_attn"], cfg.ln_eps)
        r = x
        y = dense(jax.nn.gelu(dense(x, p["fc1"]), approximate=False),
                  p["fc2"])
        x = _ln(r * alpha + y, p["ln_final"], cfg.ln_eps)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x


def encode_audio_segments(params: dict, cfg: BeatsConfig,
                          audio: Array) -> Array:
    """(b, t, T, 128) fbank segments -> (b, t, n, d)
    (reference ``AudioEncoder.forward``, multimodal_encoder.py:195-202)."""
    b, t = audio.shape[:2]
    flat = audio.reshape(b * t, *audio.shape[2:])
    feats = beats_encode(params, cfg, flat)
    return feats.reshape(b, t, feats.shape[1], feats.shape[2])
