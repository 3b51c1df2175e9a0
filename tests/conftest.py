"""Test harness config: force an 8-device virtual CPU mesh before JAX import.

The reference (GeWu-Lab/MokA) has no tests at all (SURVEY.md §4); here every
distributed/sharding code path is testable on CPU via
``--xla_force_host_platform_device_count`` — the capability the reference lacks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep compile times manageable for tiny test models.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The sandbox pins JAX_PLATFORMS=axon (TPU) at a level the env var can't
# override; the config knob wins as long as no backend is initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
