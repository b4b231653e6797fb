"""Test harness: run on CPU with 8 virtual devices and 64-bit enabled.

The virtual-device mesh is the TPU-world analogue of multi-node testing
without a cluster (SURVEY.md section 4): sharding/halo tests exercise the
same pjit/shard_map code paths that run on a real pod slice.

Real-hardware tier: ``MGTPU_TEST_PLATFORM=tpu pytest tests -m tpu`` runs
the ``@pytest.mark.tpu`` tests (compiled Pallas kernel parity + a real
solve) on the attached chip; in the default CPU run they are skipped.
"""

import os

# Force CPU for tests even when the session environment points at a TPU
# (override with MGTPU_TEST_PLATFORM=tpu to run on hardware).  jax may
# already be imported by a pytest plugin (jaxtyping), so set the platform
# through jax.config as well as the env — both work pre-backend-init.
_platform = os.environ.get("MGTPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# else: leave JAX_PLATFORMS alone — the hardware plugin may register the
# TPU under its own platform name (e.g. 'axon'), so forcing 'tpu' or
# setting PYTHONPATH-style overrides breaks backend discovery.

import jax
import pytest

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # Hardware tier: first compile of each kernel over the tunneled
    # backend takes 20-40s — share the persistent compile cache with the
    # bench scripts so repeat runs take seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/mgtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs the real TPU chip (run with MGTPU_TEST_PLATFORM=tpu)",
    )


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.devices()[0].platform == "tpu"
    skip_tpu = pytest.mark.skip(reason="needs real TPU "
                                       "(MGTPU_TEST_PLATFORM=tpu)")
    skip_cpu = pytest.mark.skip(reason="CPU-mesh test tier (8 virtual "
                                       "devices); skipped on hardware")
    for item in items:
        if "tpu" in item.keywords:
            if not on_tpu:
                item.add_marker(skip_tpu)
        elif on_tpu:
            # The default tier assumes the 8-virtual-device CPU mesh.
            item.add_marker(skip_cpu)
