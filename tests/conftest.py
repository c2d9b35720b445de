"""Test harness: force an 8-device virtual CPU mesh (the TPU-world "fake
backend" — SURVEY.md §4) before JAX is imported anywhere."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (one real TPU
# behind a tunnel) — per-dispatch latency makes the test suite crawl there,
# and multi-device tests need the virtual CPU mesh anyway.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize may have imported jax already (axon plugin registration), so
# the env var alone is not enough — update the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
