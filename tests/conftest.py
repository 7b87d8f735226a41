"""Test config: run everything on CPU with 8 virtual devices so mesh /
collective logic is exercised without a TPU pod (SURVEY §4 item 6)."""

import os

# Overwrite (not setdefault): the environment may pre-set JAX_PLATFORMS to a
# hardware platform; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site hook may have force-selected a hardware platform via
# jax.config.update("jax_platforms", ...), which outranks the env var —
# override it back at config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
