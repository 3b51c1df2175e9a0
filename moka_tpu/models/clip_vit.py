"""CLIP vision tower (ViT-L/14) — frozen feature extractor.

Reference wraps HF ``CLIPVisionModel`` and selects intermediate hidden
states (``multimodal_encoder.py:30-81``; actual layer selection [14, 23] via
``configs/unified_config.py:14``), dropping the CLS token ("patch" mode).

TPU notes: the patchify conv is expressed as a reshape + matmul (a stride-14
conv with kernel=stride IS a patch-unfold matmul — lands on the MXU instead
of a strided conv), layers run under ``lax.scan``, and because only selected
hidden states are needed the scan stacks every layer's output and we index —
XLA DCEs the unused ones at compile time when the selection is static.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ClipVitConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    intermediate: int = 4096
    ln_eps: float = 1e-5
    # int8-quantized towers only: run the dense dots with per-token int8
    # activations on the MXU int8 path (the tower is frozen + fwd-only, so
    # this is the W8A8 recipe with no gradient-side risk)
    a8_dots: bool = False
    # flash attention for the tower's (b*t, 257)-token self-attention:
    # the eager path materializes (b*t, H, 257, 257) fp32 scores (~169 MB
    # per layer at the 10-frame recipe); the flash kernel keeps them in
    # VMEM (non-causal, maskless)
    use_flash: bool = False

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def vit_l_14() -> "ClipVitConfig":
        return ClipVitConfig()

    @staticmethod
    def tiny() -> "ClipVitConfig":
        return ClipVitConfig(image_size=28, patch_size=14, hidden=32,
                             n_layers=2, n_heads=4, intermediate=64)


def init_clip_params(rng: Array, cfg: ClipVitConfig,
                     dtype=jnp.float32) -> dict:
    h, i, n = cfg.hidden, cfg.intermediate, cfg.n_layers
    p = cfg.patch_size
    ks = list(jax.random.split(rng, 16))

    def lin(k, a, b):
        return {"w": (jax.random.normal(k, (a, b)) * 0.02).astype(dtype),
                "b": jnp.zeros((b,), dtype)}

    def stack(maker):
        outs = [maker(k) for k in jax.random.split(ks.pop(), n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    layers = {
        "ln1": stack(lambda k: {"g": jnp.ones((h,), dtype),
                                "b": jnp.zeros((h,), dtype)}),
        "q": stack(lambda k: lin(k, h, h)),
        "k": stack(lambda k: lin(k, h, h)),
        "v": stack(lambda k: lin(k, h, h)),
        "out": stack(lambda k: lin(k, h, h)),
        "ln2": stack(lambda k: {"g": jnp.ones((h,), dtype),
                                "b": jnp.zeros((h,), dtype)}),
        "fc1": stack(lambda k: lin(k, h, i)),
        "fc2": stack(lambda k: lin(k, i, h)),
    }
    return {
        "cls": (jax.random.normal(ks.pop(), (h,)) * 0.02).astype(dtype),
        # patch embed as a matmul over unfolded (p*p*3) pixel blocks, no bias
        # (HF CLIPVisionEmbeddings conv has bias=False)
        "patch": (jax.random.normal(ks.pop(), (p * p * 3, h)) * 0.02).astype(dtype),
        "pos": (jax.random.normal(ks.pop(),
                                  (cfg.n_patches + 1, h)) * 0.02).astype(dtype),
        "pre_ln": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
        "post_ln": {"g": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)},
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


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def patchify(images: Array, patch: int) -> Array:
    """(b, 3, H, W) -> (b, n_patches, patch*patch*3) matching HF's
    Conv2d(k=p, s=p) + flatten(2).transpose ordering (channel-major within
    each patch: weight layout (h, 3, p, p) -> flattened (3*p*p))."""
    b, c, H, W = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # b, gh, gw, c, p, p
    return x.reshape(b, gh * gw, c * patch * patch)


def clip_hidden_states(params: dict, cfg: ClipVitConfig, images: Array,
                       select_layers: tuple[int, ...]) -> list[Array]:
    """Returns [hidden_states[l][:, 1:] for l in select_layers] (CLS dropped).

    ``hidden_states[0]`` is the post-pre_layernorm embedding; index l>0 is the
    output of encoder layer l (HF convention, so [14, 23] are layer-14 and
    layer-23 outputs)."""
    b = images.shape[0]
    x = jnp.einsum("bnp,ph->bnh", patchify(images, cfg.patch_size),
                   params["patch"])
    cls = jnp.broadcast_to(params["cls"][None, None], (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][None]
    x = _ln(x, params["pre_ln"], cfg.ln_eps)

    def layer(x, p):
        dense = functools.partial(_dense, a8=cfg.a8_dots)
        r = x
        y = _ln(x, p["ln1"], cfg.ln_eps)
        bb, L, h = y.shape
        hd = h // cfg.n_heads
        q = dense(y, p["q"]).reshape(bb, L, cfg.n_heads, hd)
        k = dense(y, p["k"]).reshape(bb, L, cfg.n_heads, hd)
        v = dense(y, p["v"]).reshape(bb, L, cfg.n_heads, hd)
        if cfg.use_flash:
            from moka_tpu.ops.flash_attention import flash_mha
            ctx = flash_mha(q, k, v, jnp.ones((bb, L), jnp.int32),
                            causal=False)
        else:
            s = jnp.einsum("bqnh,bknh->bnqk", q, k,
                           preferred_element_type=jnp.float32)
            s = s / jnp.sqrt(jnp.float32(hd))
            pr = jax.nn.softmax(s.astype(jnp.float32), -1)
            ctx = jnp.einsum("bnqk,bknh->bqnh", pr.astype(v.dtype), v)
        x = r + dense(ctx.reshape(bb, L, h), p["out"])
        r = x
        y = _ln(x, p["ln2"], cfg.ln_eps)
        x = r + dense(quick_gelu(dense(y, p["fc1"])), p["fc2"])
        return x, x

    x_final, all_states = jax.lax.scan(layer, x, params["layers"])
    out = []
    for l in select_layers:
        h = x if l == 0 else all_states[l - 1]
        out.append(h[:, 1:])
    return out


def encode_video(params: dict, cfg: ClipVitConfig, video: Array,
                 select_layers: tuple[int, ...]) -> list[Array]:
    """(b, t, 3, H, W) -> [(b, t*n_patches, hidden)] per selected layer
    (reference ``VisualEncoder.forward``, multimodal_encoder.py:72-81)."""
    b, t = video.shape[:2]
    frames = video.reshape(b * t, *video.shape[2:])
    feats = clip_hidden_states(params, cfg, frames, select_layers)
    return [f.reshape(b, t * f.shape[1], f.shape[2]) for f in feats]
