"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity/accuracy tests run in float64 on the CPU backend (TPU f64 is emulated
and slow); sharding tests use the 8 virtual CPU devices.
"""

import os

# Hard override: the ambient environment may export JAX_PLATFORMS=axon (the
# TPU tunnel); accuracy tests must run on the local CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")  # env alone is ignored when the
# axon TPU plugin is present, so force it at the config level too
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu"
