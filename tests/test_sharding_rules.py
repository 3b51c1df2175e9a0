"""Sharding rule-table unit tests.

Round-1 regression: ``quantize_llama_base`` rewrites projection leaves into
``{w_i8, scale}`` dicts, so parameter paths become ``llama/layers/q/w_i8`` —
which fell through the old rules (anchored on ``layers/q$``) to fully
replicated, silently keeping a full int8 base copy per chip under
``--quantize-base --mesh fsdp``.  These tests pin the quantized paths to the
same FSDP/TP layout as the bf16 weights (the ZeRO-3 analog of the
reference's ``zero_stage3_config_70b.json``).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from moka_tpu.parallel.sharding import param_shardings, spec_for_path


def test_bf16_base_rules():
    assert spec_for_path("llama/layers/q", 3) == P(None, "fsdp", "model")
    assert spec_for_path("llama/layers/o", 3) == P(None, "model", "fsdp")
    assert spec_for_path("llama/layers/down", 3) == P(None, "model", "fsdp")
    assert spec_for_path("llama/embed", 2) == P(None, "fsdp")


def test_quantized_base_rules_shard():
    """The w_i8 leaves shard like the bf16 weight; scales follow the
    weight's output axis."""
    for name in ("q", "k", "v", "gate", "up"):
        assert spec_for_path(f"llama/layers/{name}/w_i8", 3) == \
            P(None, "fsdp", "model"), name
        assert spec_for_path(f"llama/layers/{name}/scale", 3) == \
            P(None, None, "model"), name
    for name in ("o", "down"):
        assert spec_for_path(f"llama/layers/{name}/w_i8", 3) == \
            P(None, "model", "fsdp"), name
        assert spec_for_path(f"llama/layers/{name}/scale", 3) == \
            P(None, None, "fsdp"), name


def test_adapters_replicated():
    # replicated = no mesh axis on any dim (spec may be padded with Nones)
    assert all(s is None for s in spec_for_path("adapters/layers/q/a", 4))
    assert all(s is None for s in spec_for_path("adapters/layers/down/b", 3))


def test_quantized_tree_shards_on_mesh():
    """End-to-end: a quantized tiny llama tree actually lands sharded on an
    8-virtual-device mesh (not replicated)."""
    from moka_tpu.core.config import LlamaConfig, MeshConfig
    from moka_tpu.models.llama import init_llama_params
    from moka_tpu.ops.quant import quantize_llama_base
    from moka_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    if len(devices) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, model=2),
                     devices=devices[:8])
    cfg = LlamaConfig.tiny(vocab_size=128, n_layers=2)
    base = quantize_llama_base(
        init_llama_params(jax.random.key(0), cfg, dtype=jnp.float32))
    sh = param_shardings(mesh, base)
    spec = sh["layers"]["q"]["w_i8"].spec
    assert spec == P(None, "fsdp", "model"), spec
    placed = jax.device_put(base, sh)
    # each shard holds 1/(4*2) of the weight
    w = placed["layers"]["q"]["w_i8"]
    shard_shape = w.addressable_shards[0].data.shape
    assert shard_shape[1] == w.shape[1] // 4
    assert shard_shape[2] == w.shape[2] // 2
    # dequantized result identical to the replicated tree
    from moka_tpu.ops.quant import dequantize
    np.testing.assert_array_equal(
        np.asarray(dequantize(jax.device_get(placed["layers"]["q"]))),
        np.asarray(dequantize(jax.device_get(base["layers"]["q"]))))
