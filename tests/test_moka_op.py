"""Parity tests: vectorized MokA op vs a literal per-sample reimplementation.

The "naive" functions below mirror the reference's Python loops statement by
statement (AVT ``peft_hyper/tuners/lora.py:460-531``, VT
``modified_peft/tuners/lora/layer.py:548-681``) in numpy, including the
contiguous-span key slicing.  The vectorized op must match to float32
tolerance.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moka_tpu.ops.moka import (MokaSpec, decode_scale, init_moka_params,
                               lora_delta, moka_delta, moka_linear)


def naive_avt_delta(x, A, B, masks, qmask, *, scaling, blc_weight):
    """AVT train/prefill path, mirroring lora.py:460-531 (loops and all)."""
    b, L, _ = x.shape
    M, _, r = A.shape
    only_inputs = [x * masks[i][..., None] for i in range(M)]
    out_a = [only_inputs[i] @ A[i] * scaling for i in range(M)]

    streams = [out_a[0]]
    for mod in (1, 2):
        tok = out_a[mod]
        question_token = out_a[0] * qmask[..., None]
        new = np.zeros_like(tok)
        for i in range(b):
            idx = np.where(qmask[i] == 1)[0]
            key = question_token[i, idx[0]:idx[-1] + 1, :]
            q = tok[i]
            score = q @ key.T / math.sqrt(r)
            score = score - score.max(-1, keepdims=True)
            p = np.exp(score)
            p = p / p.sum(-1, keepdims=True)
            out = p @ key
            attn = masks[mod][i][..., None] * out
            new[i] = tok[i] + attn * blc_weight
        streams.append(new)
    input_b = sum(streams)
    return input_b @ B


def naive_vt_delta(x, A, B, text_mask, image_mask, qmask, *, scaling,
                   attn_weight):
    """VT path, mirroring layer.py:548-681 (gather/scatter and all)."""
    b, L, d = x.shape
    r = A.shape[-1]
    x_flat = x.reshape(-1, d)
    tm = text_mask.reshape(-1)
    im = image_mask.reshape(-1)
    buf = np.zeros((b * L, r), dtype=x.dtype)
    idx_t = np.nonzero(tm == 1)[0]
    buf[idx_t] = x_flat[idx_t] @ A[0]
    idx_i = np.nonzero(im == 1)[0]
    buf[idx_i] = x_flat[idx_i] @ A[1]
    buf = buf.reshape(b, L, r)
    for i in range(b):
        ii = np.where(image_mask[i] == 1)[0]
        if len(ii) == 0:
            continue
        qi = np.where(qmask[i] == 1)[0]
        if len(qi) == 0:
            continue
        q = buf[i, ii, :]
        k = buf[i, qi, :]
        score = q @ k.T / math.sqrt(r)
        score = score - score.max(-1, keepdims=True)
        p = np.exp(score)
        p = p / p.sum(-1, keepdims=True)
        buf[i, ii, :] = buf[i, ii, :] + attn_weight * (p @ k)
    flat = buf.reshape(-1, r)
    out = np.zeros((b * L, B.shape[-1]), dtype=x.dtype)
    out[idx_t] = flat[idx_t] @ B * scaling
    out[idx_i] = flat[idx_i] @ B * scaling
    return out.reshape(b, L, -1)


def _make_masks(rng, b, L, n_mod, q_span=(2, 6)):
    """Disjoint modality masks + a contiguous question span inside text."""
    masks = np.zeros((n_mod, b, L), dtype=np.float32)
    qmask = np.zeros((b, L), dtype=np.float32)
    for i in range(b):
        # layout: [text(question inside) | mod1 | mod2 | ... | pad]
        cut = rng.integers(L // 2, L - n_mod * 2)
        masks[0, i, :cut] = 1.0
        start = rng.integers(0, cut - 3)
        end = rng.integers(start + 1, cut)
        qmask[i, start:end + 1] = 1.0
        pos = cut
        for m in range(1, n_mod):
            width = rng.integers(1, (L - cut) // n_mod)
            masks[m, i, pos:pos + width] = 1.0
            pos += width
        # remaining rows are padding: in no mask
    return masks, qmask


@pytest.mark.parametrize("seed", [0, 1])
def test_avt_parity(seed):
    rng = np.random.default_rng(seed)
    b, L, d_in, d_out, r = 3, 24, 16, 12, 4
    spec = MokaSpec.avt(rank=r, lora_alpha=16.0, blc_weight=0.7,
                        dropout_rate=0.0)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    A = rng.standard_normal((3, d_in, r)).astype(np.float32) * 0.1
    B = rng.standard_normal((r, d_out)).astype(np.float32) * 0.1
    masks, qmask = _make_masks(rng, b, L, 3)

    want = naive_avt_delta(x, A, B, masks, qmask, scaling=16.0 / r,
                           blc_weight=0.7)
    got = moka_delta(jnp.asarray(x), jnp.asarray(A), jnp.asarray(B),
                     jnp.asarray(masks), jnp.asarray(qmask), spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_vt_parity(seed):
    rng = np.random.default_rng(seed)
    b, L, d_in, d_out, r = 2, 20, 16, 12, 4
    spec = MokaSpec.vt(rank=r, lora_alpha=16.0, attn_weight=0.05,
                       dropout_rate=0.0)
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    A = rng.standard_normal((2, d_in, r)).astype(np.float32) * 0.1
    B = rng.standard_normal((r, d_out)).astype(np.float32) * 0.1
    masks, qmask = _make_masks(rng, b, L, 2)

    want = naive_vt_delta(x, A, B, masks[0], masks[1], qmask,
                          scaling=16.0 / r, attn_weight=0.05)
    got = moka_delta(jnp.asarray(x), jnp.asarray(A), jnp.asarray(B),
                     jnp.asarray(masks), jnp.asarray(qmask), spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_no_question_tokens_is_finite():
    """A sample with an empty question span must not NaN (VT skips it)."""
    spec = MokaSpec.vt(rank=4, dropout_rate=0.0)
    b, L, d = 2, 8, 6
    x = jnp.ones((b, L, d))
    A = jnp.ones((2, d, 4)) * 0.1
    B = jnp.ones((4, d)) * 0.1
    masks = jnp.zeros((2, b, L)).at[0, :, :4].set(1.0).at[1, :, 4:].set(1.0)
    qmask = jnp.zeros((b, L)).at[0, 1:3].set(1.0)  # sample 1: no question
    out = moka_delta(x, A, B, masks, qmask, spec)
    assert bool(jnp.all(jnp.isfinite(out)))
    # sample 1 image rows must equal the no-attention path
    no_attn = (x[1:] * masks[1, 1:, :, None]) @ A[1] @ B * (16.0 / 4)
    np.testing.assert_allclose(np.asarray(out[1, 4:]),
                               np.asarray(no_attn[0, 4:]), rtol=1e-5)


def test_decode_path_matches_text_adapter():
    spec = MokaSpec.avt(rank=4, lora_alpha=16.0, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    d_in, d_out = 16, 12
    x = jnp.asarray(rng.standard_normal((2, 1, d_in)).astype(np.float32))
    p = init_moka_params(jax.random.key(0), d_in, d_out, spec)
    w = jnp.asarray(rng.standard_normal((d_in, d_out)).astype(np.float32))
    # zero-init B => adapter contributes nothing at step 0
    y = moka_linear(x, w, p["a"], p["b"], None, None, spec)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), rtol=1e-6)
    # nonzero B: decode delta == B(A0(x)*scale)
    b_mat = jnp.asarray(rng.standard_normal((4, d_out)).astype(np.float32))
    y2 = moka_linear(x, w, p["a"], b_mat, None, None, spec)
    want = x @ w + (x @ p["a"][0] * decode_scale(spec)) @ b_mat
    np.testing.assert_allclose(np.asarray(y2), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_grads_flow_only_through_adapters():
    """Frozen base: grads wrt adapters exist; base weight is not an argument
    of the differentiated function (architectural guarantee)."""
    spec = MokaSpec.avt(rank=4, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    b, L, d = 2, 16, 8
    x = jnp.asarray(rng.standard_normal((b, L, d)).astype(np.float32))
    masks, qmask = _make_masks(rng, b, L, 3)
    masks, qmask = jnp.asarray(masks), jnp.asarray(qmask)
    A = jnp.asarray(rng.standard_normal((3, d, 4)).astype(np.float32) * 0.1)
    B = jnp.asarray(rng.standard_normal((4, d)).astype(np.float32) * 0.1)

    def loss(p):
        return jnp.sum(moka_delta(x, p["a"], p["b"], masks, qmask, spec) ** 2)

    g = jax.grad(loss)({"a": A, "b": B})
    assert np.isfinite(np.asarray(g["a"])).all()
    assert float(jnp.abs(g["a"]).sum()) > 0
    assert float(jnp.abs(g["b"]).sum()) > 0


@pytest.mark.parametrize("flavor", ["avt", "vt"])
def test_flash_rank_attn_matches_jnp(flavor):
    """flash_rank_attn=True routes the rank-space attention through the
    Pallas flash kernel (interpret mode on CPU): forward AND adapter grads
    must match the jnp path, including a no-question sample whose rows get
    zero attention (and zero attention-gradient)."""
    rng = np.random.default_rng(7)
    n_mod = 3 if flavor == "avt" else 2
    spec = (MokaSpec.avt(rank=4, blc_weight=0.7, dropout_rate=0.0)
            if flavor == "avt" else
            MokaSpec.vt(rank=4, attn_weight=0.05, dropout_rate=0.0))
    b, L, d_in, d_out = 3, 24, 16, 12
    x = rng.standard_normal((b, L, d_in)).astype(np.float32)
    A = rng.standard_normal((n_mod, d_in, 4)).astype(np.float32) * 0.1
    B = rng.standard_normal((4, d_out)).astype(np.float32) * 0.1
    masks, qmask = _make_masks(rng, b, L, n_mod)
    qmask[1, :] = 0.0  # sample 1: no question tokens at all

    def loss(params, spec):
        d = moka_delta(x, params["a"], params["b"], jnp.asarray(masks),
                       jnp.asarray(qmask), spec)
        return jnp.sum(d * jnp.cos(d)), d

    params = {"a": jnp.asarray(A), "b": jnp.asarray(B)}
    (l0, d0), g0 = jax.value_and_grad(loss, has_aux=True)(params, spec)
    (l1, d1), g1 = jax.value_and_grad(loss, has_aux=True)(
        params, spec.with_flash_rank_attn())
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=2e-4, atol=1e-5)


def test_lora_dropout_statistics_and_grads():
    """Raw-bits dropout: empirical keep rate ≈ 1-rate, kept entries scaled
    by 1/keep, deterministic per key, works under grad and with the rbg
    PRNG implementation (the training configuration)."""
    from moka_tpu.ops.moka import lora_dropout
    x = jnp.ones((64, 1024), jnp.float32)
    for impl in (None, "rbg"):
        key = (jax.random.key(3) if impl is None
               else jax.random.key(3, impl=impl))
        y = lora_dropout(x, key, 0.05)
        kept = float(jnp.mean((np.asarray(y) > 0)))
        assert abs(kept - 0.95) < 0.01, (impl, kept)
        vals = np.unique(np.asarray(y))
        np.testing.assert_allclose(sorted(vals), [0.0, 1.0 / 0.95],
                                   rtol=1e-6)
        y2 = lora_dropout(x, key, 0.05)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    g = jax.grad(lambda v: jnp.sum(lora_dropout(v, jax.random.key(0),
                                                0.5)))(x)
    vals = np.unique(np.asarray(g))
    np.testing.assert_allclose(sorted(vals), [0.0, 2.0], rtol=1e-6)


def test_question_window_matches_full():
    """Windowed rank attention (max_question_tokens) is exact vs the full-L
    path: spans at the start, middle, and tail (window-clamp), a row with no
    question, fwd and grads, both flavors."""
    b, L, d_in, d_out, kq = 4, 64, 16, 24, 16
    key = jax.random.key(7)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, L, d_in), jnp.float32)
    for flavor in ("avt", "vt"):
        spec = (MokaSpec.avt(rank=4) if flavor == "avt"
                else MokaSpec.vt(rank=4))
        spec_w = spec.with_question_window(kq)
        p = init_moka_params(ks[1], d_in, d_out, spec)
        p["b"] = jax.random.normal(ks[2], p["b"].shape, jnp.float32) * 0.1
        M = spec.num_modalities
        mod = np.zeros((M, b, L), np.float32)
        mod[0, :, : L // 2] = 1
        for m in range(1, M):
            mod[m, :, L // 2 + (m - 1) * 8: L // 2 + m * 8] = 1
        qm = np.zeros((b, L), np.float32)
        qm[0, 0:5] = 1            # span at the very start
        qm[1, 20:20 + kq] = 1     # exactly window-sized, mid-sequence
        qm[2, L - 3:] = 1         # tail: start clamps to L - kq
        # row 3: no question at all (attention must contribute nothing)
        mod_j, qm_j = jnp.asarray(mod), jnp.asarray(qm)

        def f(params, s):
            return moka_delta(x, params["a"], params["b"], mod_j, qm_j, s)

        np.testing.assert_allclose(np.asarray(f(p, spec_w)),
                                   np.asarray(f(p, spec)),
                                   rtol=1e-6, atol=1e-7)
        g0 = jax.grad(lambda q: jnp.sum(f(q, spec) ** 2))(p)
        g1 = jax.grad(lambda q: jnp.sum(f(q, spec_w) ** 2))(p)
        for k in g0:
            np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                       rtol=1e-5, atol=1e-7)
    # kq >= L degenerates to the untouched full path
    from moka_tpu.ops.moka import question_window
    kfull, mfull = question_window(x[..., :4], qm_j, L)
    np.testing.assert_array_equal(np.asarray(kfull), np.asarray(x[..., :4]))


def test_assembler_question_window_guard():
    """assemble_sample fails fast when a question span exceeds the
    configured rank-attention window."""
    from moka_tpu.data import assembler as asm
    t2i = {t: 100 + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    ids = ([5, 6] + [t2i["<question_start>"]] + [7] * 10
           + [t2i["<question_end>"]] + [8, 9])
    labels = [-100] * (len(ids) - 2) + [8, 9]
    ok = asm.assemble_sample(np.asarray(ids), np.asarray(labels), t2i,
                             pad_id=0, max_question_tokens=10)
    assert int(ok.question_mask.sum()) == 10
    with pytest.raises(ValueError, match="question span"):
        asm.assemble_sample(np.asarray(ids), np.asarray(labels), t2i,
                            pad_id=0, max_question_tokens=9)


def test_assembler_question_overflow_disable():
    """Training fallback: question_overflow='disable' zeroes the sample's
    question mask (exact no-cross-attn via the has_q guard) instead of
    aborting; everything else (ids/labels/masks) is untouched."""
    from moka_tpu.data import assembler as asm
    t2i = {t: 100 + i for i, t in enumerate(asm.SPECIAL_TOKENS)}
    ids = ([5, 6] + [t2i["<question_start>"]] + [7] * 10
           + [t2i["<question_end>"]] + [8, 9])
    labels = [-100] * (len(ids) - 2) + [8, 9]
    soft = asm.assemble_sample(np.asarray(ids), np.asarray(labels), t2i,
                               pad_id=0, max_question_tokens=9,
                               question_overflow="disable")
    assert int(soft.question_mask.sum()) == 0
    ref = asm.assemble_sample(np.asarray(ids), np.asarray(labels), t2i,
                              pad_id=0)
    np.testing.assert_array_equal(soft.ids, ref.ids)
    np.testing.assert_array_equal(soft.labels, ref.labels)
    np.testing.assert_array_equal(soft.text_mask, ref.text_mask)


def test_vt_collate_question_overflow_disable():
    """collate_vt train fallback zeroes only the overflowing sample's
    question mask; the others keep theirs."""
    import pytest as _pytest
    from moka_tpu.data.vt_dataset import build_vt_sample, collate_vt
    img_id, pad_id, n_img = 3, 0, 2
    def make(q_len):
        # [inst tokens][img][img][question tail (unsupervised)][answer]
        ids = np.asarray([5, 6, img_id, img_id] + [7] * q_len + [8, 9],
                         np.int64)
        labels = np.full(len(ids), -100, np.int64)
        labels[-2:] = [8, 9]
        return build_vt_sample(ids, labels, img_id, pad_id,
                               num_image_tokens=n_img)
    short, long_ = make(3), make(12)
    with _pytest.raises(ValueError, match="question span"):
        collate_vt([short, long_], pad_id, max_question_tokens=8)
    batch = collate_vt([short, long_], pad_id, max_question_tokens=8,
                       question_overflow="disable")
    assert batch["question_mask"][0].sum() == 3
    assert batch["question_mask"][1].sum() == 0
