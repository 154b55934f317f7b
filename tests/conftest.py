"""Test harness: force JAX onto a virtual 8-device CPU mesh so multi-device
sharding paths are exercised without TPU hardware (the standard JAX
fake-multi-device mechanism; SURVEY.md §4).

The environment's axon site hook registers a TPU backend at interpreter
startup and pins jax_platforms, so env vars alone are not enough — we override
the config and clear the already-initialized backends."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass
# persistent compile cache: model graphs are large; re-runs must be fast
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(11)
