import os
import sys

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. Must be set before jax is imported anywhere.
# Force the CPU backend (the ambient environment may point JAX at real TPU
# hardware via JAX_PLATFORMS=axon; tests must not depend on the tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the axon TPU backend in every
# interpreter and re-pins JAX_PLATFORMS; the config update below is the only
# reliable way to keep tests on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

