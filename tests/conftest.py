"""Test configuration: force a virtual 8-device CPU backend.

Multi-chip sharding logic is tested on CPU via
``--xla_force_host_platform_device_count=8`` (the standard JAX substitute
for real multi-host hardware); numerical tests also run on CPU for
determinism.  Must run before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This environment's sitecustomize may have pre-imported jax and registered a
# TPU plugin; the config update below still wins as long as no backend has
# been initialized yet (conftest runs before any test imports).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh; got " + jax.default_backend()
    )
    assert jax.device_count() >= 8, "expected >=8 virtual CPU devices for sharding tests"


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(19960903)
