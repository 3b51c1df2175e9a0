"""fbd block-diagonal op (dense parity, Pallas-vs-einsum parity, gradients)
and the extra adapters (LoRA merge parity, IA3, BOFT orthogonality)."""

import numpy as np
import jax
import jax.numpy as jnp

from moka_tpu.adapters.peft import (BoftSpec, LoraSpec, boft_linear,
                                    boft_weight, ia3_linear, init_boft,
                                    init_ia3, init_lora, lora_linear,
                                    merge_lora)
from moka_tpu.ops.fbd import block_diag_matmul, cayley, fast_block_diag


def test_fast_block_diag_matches_dense():
    rng = np.random.default_rng(0)
    z, N, b = 2, 3, 4
    blocks = rng.standard_normal((z, N, b, b)).astype(np.float32)
    dense = np.zeros((z, N * b, N * b), np.float32)
    for zi in range(z):
        for ni in range(N):
            dense[zi, ni * b:(ni + 1) * b, ni * b:(ni + 1) * b] = \
                blocks[zi, ni]
    got = fast_block_diag(jnp.asarray(blocks))
    np.testing.assert_allclose(np.asarray(got), dense, rtol=1e-6)


def test_block_diag_matmul_parity_and_grads():
    rng = np.random.default_rng(1)
    z, N, b, m = 2, 4, 8, 128
    blocks = jnp.asarray(rng.standard_normal((z, N, b, b)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((z, N * b, m)), jnp.float32)

    dense = fast_block_diag(blocks)
    want = jnp.einsum("zij,zjm->zim", dense, x)
    got_einsum = block_diag_matmul(blocks, x, use_pallas=False)
    got_pallas = block_diag_matmul(blocks, x, use_pallas=True,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got_einsum), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_pallas), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    g = jax.grad(lambda b_: jnp.sum(
        block_diag_matmul(b_, x, use_pallas=False) ** 2))(blocks)
    assert np.isfinite(np.asarray(g)).all()


def test_lora_merge_parity():
    rng = np.random.default_rng(2)
    spec = LoraSpec(rank=4, alpha=16.0)
    w = jnp.asarray(rng.standard_normal((16, 12)), jnp.float32)
    p = init_lora(jax.random.key(0), 16, 12, spec)
    p = {"a": p["a"], "b": jnp.asarray(rng.standard_normal((4, 12)) * 0.1,
                                       jnp.float32)}
    x = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
    y1 = lora_linear(x, w, p, spec)
    y2 = x @ merge_lora(w, p, spec)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


def test_ia3():
    x = jnp.ones((2, 4))
    w = jnp.eye(4)
    p = init_ia3(4)
    p["scale"] = jnp.asarray([1.0, 2.0, 0.5, 0.0])
    y = ia3_linear(x, w, p)
    np.testing.assert_allclose(np.asarray(y[0]), [1, 2, 0.5, 0])


def test_cayley_orthogonal():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((5, 4, 4)) * 0.3, jnp.float32)
    r = cayley(q)
    eye = np.eye(4)
    prod = np.asarray(jnp.einsum("nij,nkj->nik", r, r))
    np.testing.assert_allclose(prod, np.broadcast_to(eye, prod.shape),
                               atol=1e-5)


def test_boft_identity_at_init_and_norm_preserving():
    rng = np.random.default_rng(4)
    spec = BoftSpec(block_size=4, n_factors=2)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    p = init_boft(16, spec)
    np.testing.assert_allclose(np.asarray(boft_weight(w, p, spec)),
                               np.asarray(w), rtol=1e-6)
    # random q: transform is orthogonal -> column norms of W preserved
    p = {"q": jnp.asarray(rng.standard_normal(p["q"].shape) * 0.2,
                          jnp.float32)}
    w2 = boft_weight(w, p, spec)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(w2), axis=0),
        np.linalg.norm(np.asarray(w), axis=0), rtol=1e-4)
    x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    assert boft_linear(x, w, p, spec).shape == (2, 8)


def test_oft_orthogonal_transform():
    from moka_tpu.adapters.peft import init_oft, oft_linear, oft_weight
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    p = init_oft(8, block_size=4)
    np.testing.assert_allclose(np.asarray(oft_weight(w, p)), np.asarray(w),
                               rtol=1e-6)
    p = {"q": jnp.asarray(rng.standard_normal((2, 4, 4)) * 0.2, jnp.float32)}
    w2 = oft_weight(w, p)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w2), axis=0),
                               np.linalg.norm(np.asarray(w), axis=0),
                               rtol=1e-4)
    assert oft_linear(jnp.ones((2, 8)), w, p).shape == (2, 6)


def test_loha_lokr_vera_zero_init_and_grads():
    from moka_tpu.adapters.peft import (init_loha, init_lokr, init_vera,
                                        loha_linear, lokr_linear,
                                        vera_linear)
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    base = x @ w

    ph = init_loha(jax.random.key(0), 8, 6)
    np.testing.assert_allclose(np.asarray(loha_linear(x, w, ph)),
                               np.asarray(base), rtol=1e-5)
    pk = init_lokr(jax.random.key(1), 8, 6, factor_in=2, factor_out=2)
    np.testing.assert_allclose(np.asarray(lokr_linear(x, w, pk)),
                               np.asarray(base), rtol=1e-5)
    pv = init_vera(jax.random.key(2), 8, 6)
    np.testing.assert_allclose(np.asarray(vera_linear(x, w, pv)),
                               np.asarray(base), rtol=1e-5)

    for p, fn in ((ph, loha_linear), (pk, lokr_linear), (pv, vera_linear)):
        g = jax.grad(lambda p_: jnp.sum(fn(x, w, p_) ** 2))(p)
        assert sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g)) > 0


def test_adalora():
    from moka_tpu.adapters.peft import (AdaLoraSpec, adalora_allocate,
                                        adalora_delta, adalora_importance,
                                        adalora_linear, adalora_orth_reg,
                                        init_adalora)
    rng = np.random.default_rng(7)
    spec = AdaLoraSpec(init_rank=6, target_rank=2)
    w = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 8)), jnp.float32)
    p = init_adalora(jax.random.key(0), 8, 6, spec)
    # lam zero-init -> identity
    np.testing.assert_allclose(np.asarray(adalora_linear(x, w, p)),
                               np.asarray(x @ w), rtol=1e-5)
    p = {**p, "lam": jnp.asarray(rng.standard_normal(6), jnp.float32)}
    assert float(jnp.abs(adalora_delta(p)).sum()) > 0
    assert float(adalora_orth_reg(p)) > 0

    g = jax.grad(lambda pp: jnp.sum(adalora_linear(x, w, pp) ** 2)
                 + 0.5 * adalora_orth_reg(pp))(p)
    imp = adalora_importance(p, g)
    assert imp.shape == (6,)
    # budget allocation keeps exactly k directions globally
    masks = adalora_allocate([imp, imp * 0.5], total_budget=4)
    assert sum(int(m.sum()) for m in masks) == 4
