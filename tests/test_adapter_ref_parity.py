"""Execution parity of the MokA op against the reference's OWN torch layers.

Unlike ``test_moka_op.py`` (which checks against hand-written numpy mirrors),
these tests import the reference's adapter modules themselves and run them:

  * AVT flavor: ``AudioVisualText/peft_hyper/tuners/lora.py`` ``Linear``
    (train path :460-531, 'test' prefill :385-457, single-token decode
    :373-381),
  * VT flavor: ``VisualText/modified_peft/tuners/lora/layer.py`` ``Linear``
    (dual-adapter forward :548-671, masks-None fallback :672-678),

with random weights copied into the JAX op, asserting the outputs (and, for
the train path, the adapter gradients) match to fp32 tolerance.  If the
reference and our op ever disagree on a reading of the math, these tests —
not the mirror tests — catch it.
"""

import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from moka_tpu.ops.moka import MokaSpec, lora_delta, moka_delta, moka_linear

REF_AVT = "/root/reference/AudioVisualText"
REF_VT = "/root/reference/VisualText"


def _import_avt_linear():
    import os
    if not os.path.isdir(REF_AVT):
        pytest.skip("reference tree not available")
    if REF_AVT not in sys.path:
        sys.path.insert(0, REF_AVT)
    from peft_hyper.tuners.lora import Linear
    return Linear


def _import_vt_linear():
    import os
    if not os.path.isdir(REF_VT):
        pytest.skip("reference tree not available")
    # the vendored PEFT 0.11.1 imports optional-backend helpers that the
    # image's newer peft dropped; stub the missing names (never called on
    # the plain-Linear path these tests exercise)
    import peft.import_utils
    import peft.utils
    for mod in (peft.utils, peft.import_utils):
        # get_auto_gptq_quant_linear must return None (used in an
        # isinstance check); the is_*_available probes return False
        if not hasattr(mod, "get_auto_gptq_quant_linear"):
            mod.get_auto_gptq_quant_linear = lambda *a, **k: None
        for name in ("is_auto_awq_available", "is_auto_gptq_available",
                     "is_eetq_available", "is_hqq_available",
                     "is_aqlm_available"):
            if not hasattr(mod, name):
                setattr(mod, name, lambda *a, **k: False)
    if REF_VT not in sys.path:
        sys.path.insert(0, REF_VT)
    from modified_peft.tuners.lora.layer import Linear
    return Linear


def _masks_avt(rng, b, L):
    """Disjoint text/video/audio masks + a contiguous question span inside
    the text region (the assembler guarantees contiguity —
    ``unified_arch.py:153-163``; the reference slices ``indices[0]`` to
    ``indices[-1]+1`` so only contiguous spans are well-defined for it)."""
    text = np.zeros((b, L), np.float32)
    video = np.zeros((b, L), np.float32)
    audio = np.zeros((b, L), np.float32)
    question = np.zeros((b, L), np.float32)
    for i in range(b):
        t_end = L // 2 + int(rng.integers(0, L // 8))
        v_end = t_end + (L - t_end) // 2
        text[i, :t_end] = 1
        video[i, t_end:v_end] = 1
        audio[i, v_end:] = 1
        qs = int(rng.integers(1, t_end // 2))
        qe = qs + int(rng.integers(2, t_end - qs))
        question[i, qs:qe] = 1
    return text, video, audio, question


AVT_SHAPES = [(2, 24, 16, 16), (1, 40, 8, 12), (3, 32, 24, 8)]


@pytest.mark.parametrize("b,L,d_in,d_out", AVT_SHAPES)
@pytest.mark.parametrize("method", ["train", "test"])
def test_avt_linear_full_path(b, L, d_in, d_out, method):
    """Train forward (lora.py:460-531) and 'test' prefill (:385-457) vs the
    reference module itself."""
    Linear = _import_avt_linear()
    torch.manual_seed(b * 100 + L)
    blc_weight = 0.7
    # note: the reference's custom eval() returns None (lora.py:404-409),
    # so it cannot be chained
    ref = Linear(d_in, d_out, r=444, lora_alpha=16, lora_nums=3,
                 blc_weight=blc_weight, lora_dropout=0.0,
                 loramethod=method, bias=False)
    ref.eval()
    # zero-init B would make the delta vanish; randomize all adapter weights
    with torch.no_grad():
        for i in range(3):
            getattr(ref, f"lora_A{i}").weight.normal_(0, 0.5)
        ref.lora_B0.weight.normal_(0, 0.5)

    rng = np.random.default_rng(L + d_in)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    text, video, audio, question = _masks_avt(rng, b, L)
    masks_t = [torch.from_numpy(m[..., None]) for m in
               (text, video, audio, question)]
    with torch.no_grad():
        want = ref(torch.from_numpy(x), masks_t).numpy()

    spec = MokaSpec.avt(rank=4, lora_alpha=16.0, blc_weight=blc_weight,
                        dropout_rate=0.0)
    w = jnp.asarray(ref.weight.detach().numpy().T)          # (d_in, d_out)
    a = jnp.stack([jnp.asarray(getattr(ref, f"lora_A{i}").weight
                               .detach().numpy().T) for i in range(3)])
    bb = jnp.asarray(ref.lora_B0.weight.detach().numpy().T)  # (r, d_out)
    got = moka_linear(
        jnp.asarray(x), w, a, bb,
        jnp.asarray(np.stack([text, video, audio])), jnp.asarray(question),
        spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_avt_linear_decode_fast_path():
    """Single-token 'test' decode (lora.py:373-381) == text-adapter LoRA."""
    Linear = _import_avt_linear()
    torch.manual_seed(7)
    d_in, d_out = 24, 16
    ref = Linear(d_in, d_out, r=444, lora_alpha=16, lora_nums=3,
                 blc_weight=1.0, lora_dropout=0.0, loramethod="test",
                 bias=False)
    ref.eval()
    with torch.no_grad():
        for i in range(3):
            getattr(ref, f"lora_A{i}").weight.normal_(0, 0.5)
        ref.lora_B0.weight.normal_(0, 0.5)
    x = np.random.default_rng(0).standard_normal((3, 1, d_in)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), None).numpy()

    spec = MokaSpec.avt(rank=4, lora_alpha=16.0, dropout_rate=0.0)
    w = jnp.asarray(ref.weight.detach().numpy().T)
    a = jnp.stack([jnp.asarray(getattr(ref, f"lora_A{i}").weight
                               .detach().numpy().T) for i in range(3)])
    bb = jnp.asarray(ref.lora_B0.weight.detach().numpy().T)
    got = moka_linear(jnp.asarray(x), w, a, bb, None, None, spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_avt_linear_gradient_parity():
    """Adapter gradients through the reference train path == JAX grads."""
    Linear = _import_avt_linear()
    torch.manual_seed(3)
    b, L, d_in, d_out = 2, 24, 12, 10
    ref = Linear(d_in, d_out, r=444, lora_alpha=16, lora_nums=3,
                 blc_weight=0.5, lora_dropout=0.0, loramethod="train",
                 bias=False)
    with torch.no_grad():
        for i in range(3):
            getattr(ref, f"lora_A{i}").weight.normal_(0, 0.5)
        ref.lora_B0.weight.normal_(0, 0.5)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    text, video, audio, question = _masks_avt(rng, b, L)
    g = rng.standard_normal((b, L, d_out)).astype(np.float32)

    masks_t = [torch.from_numpy(m[..., None]) for m in
               (text, video, audio, question)]
    out = ref(torch.from_numpy(x), masks_t)
    out.backward(torch.from_numpy(g))
    want_a = np.stack([getattr(ref, f"lora_A{i}").weight.grad.numpy().T
                       for i in range(3)])
    want_b = ref.lora_B0.weight.grad.numpy().T

    spec = MokaSpec.avt(rank=4, lora_alpha=16.0, blc_weight=0.5,
                        dropout_rate=0.0)
    a = jnp.stack([jnp.asarray(getattr(ref, f"lora_A{i}").weight
                               .detach().numpy().T) for i in range(3)])
    bb = jnp.asarray(ref.lora_B0.weight.detach().numpy().T)
    mm = jnp.asarray(np.stack([text, video, audio]))
    qm = jnp.asarray(question)

    def f(a_, b_):
        return jnp.sum(moka_delta(jnp.asarray(x), a_, b_, mm, qm, spec)
                       * jnp.asarray(g))

    got_a, got_b = jax.grad(f, argnums=(0, 1))(a, bb)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_b), want_b, rtol=2e-4,
                               atol=2e-4)


def _make_vt_linear(Linear, d_in, d_out, r, alpha, attn_weight, seed):
    torch.manual_seed(seed)
    base = torch.nn.Linear(d_in, d_out, bias=False)
    ref = Linear(base, "image", r=r, lora_alpha=alpha, lora_dropout=0.0,
                 init_lora_weights=True, attn_weight=attn_weight)
    ref.update_layer("text", r, lora_alpha=alpha, lora_dropout=0.0,
                     init_lora_weights=True, use_rslora=False, use_dora=False)
    with torch.no_grad():
        for name in ("image", "text"):
            ref.lora_A[name].weight.normal_(0, 0.5)
            ref.lora_B[name].weight.normal_(0, 0.5)
    return ref.eval()


def _masks_vt(rng, b, L):
    """Image block + text elsewhere; question = a non-contiguous subset of
    the text tokens (the VT reference gathers by indices — layer.py:634 —
    so non-contiguous question masks are legal in this flavor)."""
    text = np.zeros((b, L), np.float32)
    image = np.zeros((b, L), np.float32)
    question = np.zeros((b, L), np.float32)
    for i in range(b):
        i_start = int(rng.integers(1, L // 3))
        i_end = i_start + L // 4
        image[i, i_start:i_end] = 1
        text[i] = 1 - image[i]
        cand = np.flatnonzero(text[i, i_end:]) + i_end
        pick = rng.choice(cand, size=max(2, len(cand) // 3), replace=False)
        question[i, pick] = 1
    return text, image, question


VT_SHAPES = [(2, 24, 16, 16), (1, 40, 8, 12), (3, 32, 24, 8)]


@pytest.mark.parametrize("b,L,d_in,d_out", VT_SHAPES)
def test_vt_linear_dual_adapter(b, L, d_in, d_out):
    """Dual-adapter forward (layer.py:548-671) vs the reference module."""
    Linear = _import_vt_linear()
    attn_weight = 0.05
    ref = _make_vt_linear(Linear, d_in, d_out, r=4, alpha=16,
                          attn_weight=attn_weight, seed=b * 10 + L)

    rng = np.random.default_rng(L * 3 + d_out)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    text, image, question = _masks_vt(rng, b, L)
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   torch.from_numpy(text[..., None]),
                   torch.from_numpy(image[..., None]),
                   torch.from_numpy(question[..., None])).numpy()

    spec = MokaSpec.vt(rank=4, lora_alpha=16.0, attn_weight=attn_weight,
                       dropout_rate=0.0)
    w = jnp.asarray(ref.base_layer.weight.detach().numpy().T)
    a = jnp.stack([jnp.asarray(ref.lora_A["text"].weight.detach().numpy().T),
                   jnp.asarray(ref.lora_A["image"].weight.detach().numpy().T)])
    bb = jnp.asarray(ref.lora_B["text"].weight.detach().numpy().T)
    got = moka_linear(jnp.asarray(x), w, a, bb,
                      jnp.asarray(np.stack([text, image])),
                      jnp.asarray(question), spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_vt_linear_masks_none_fallback():
    """masks-None decode fallback (layer.py:672-678) == plain text LoRA."""
    Linear = _import_vt_linear()
    d_in, d_out = 20, 14
    ref = _make_vt_linear(Linear, d_in, d_out, r=4, alpha=16,
                          attn_weight=0.05, seed=5)
    x = np.random.default_rng(2).standard_normal((2, 1, d_in)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), None, None, None).numpy()

    spec = MokaSpec.vt(rank=4, lora_alpha=16.0, attn_weight=0.05,
                       dropout_rate=0.0)
    w = jnp.asarray(ref.base_layer.weight.detach().numpy().T)
    a = jnp.stack([jnp.asarray(ref.lora_A["text"].weight.detach().numpy().T),
                   jnp.asarray(ref.lora_A["image"].weight.detach().numpy().T)])
    bb = jnp.asarray(ref.lora_B["text"].weight.detach().numpy().T)
    got = moka_linear(jnp.asarray(x), w, a, bb, None, None, spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_vt_linear_no_question_sample():
    """A sample with zero question tokens skips attention (layer.py:636-637);
    check against the reference with one such sample in the batch."""
    Linear = _import_vt_linear()
    b, L, d_in, d_out = 2, 24, 12, 12
    ref = _make_vt_linear(Linear, d_in, d_out, r=4, alpha=16,
                          attn_weight=0.3, seed=9)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    text, image, question = _masks_vt(rng, b, L)
    question[1, :] = 0  # sample 1 has no question tokens
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   torch.from_numpy(text[..., None]),
                   torch.from_numpy(image[..., None]),
                   torch.from_numpy(question[..., None])).numpy()

    spec = MokaSpec.vt(rank=4, lora_alpha=16.0, attn_weight=0.3,
                       dropout_rate=0.0)
    w = jnp.asarray(ref.base_layer.weight.detach().numpy().T)
    a = jnp.stack([jnp.asarray(ref.lora_A["text"].weight.detach().numpy().T),
                   jnp.asarray(ref.lora_A["image"].weight.detach().numpy().T)])
    bb = jnp.asarray(ref.lora_B["text"].weight.detach().numpy().T)
    got = moka_linear(jnp.asarray(x), w, a, bb,
                      jnp.asarray(np.stack([text, image])),
                      jnp.asarray(question), spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
