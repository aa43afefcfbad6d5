import os
import sys

# The container boots with JAX_PLATFORMS=axon (a tunneled real TPU) and a
# sitecustomize that imports jax before conftest runs, so the env var alone
# is not enough — use config.update, which takes effect before first backend
# initialization.  Tests run on a virtual 8-device CPU mesh.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
