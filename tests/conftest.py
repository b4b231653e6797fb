"""Test harness: run on CPU with 8 virtual devices and 64-bit enabled.

The virtual-device mesh is the TPU-world analogue of multi-node testing
without a cluster (SURVEY.md section 4): sharding/halo tests exercise the
same pjit/shard_map code paths that run on a real pod slice.
"""

import os

# Force CPU for tests even when the session environment points at a TPU
# (override with MGTPU_TEST_PLATFORM=tpu to run the suite on hardware).
# jax may already be imported by a pytest plugin (jaxtyping), so set the
# platform through jax.config as well as the env — both work pre-backend-init.
_platform = os.environ.get("MGTPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)
