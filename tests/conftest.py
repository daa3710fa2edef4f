"""Test harness config: force CPU with 8 virtual devices so SPMD paths are
exercised without TPU hardware (substitutes for the reference's missing fake
backend, SURVEY.md section 4).

Note: in environments where a TPU PJRT plugin is force-registered at
interpreter start (sitecustomize calling ``jax.config.update('jax_platforms',
'<tpu>,cpu')``), env vars alone cannot win — we must update the jax config
AFTER import. XLA_FLAGS must still be set before the CPU backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend()
)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for SPMD tests"
