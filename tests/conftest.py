import os
import sys

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4). The harness exports
# JAX_PLATFORMS=axon (the real TPU tunnel) and may import jax before this
# file's env mutations land, so force the platform through jax.config, which
# takes effect as long as no backend has been initialized yet.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU backend; got "
        f"{jax.devices()}")
    assert len(jax.devices()) == 8
