import os
import sys

# Tests run on a virtual 8-device CPU mesh (multi-chip TPU hardware is not
# available in CI; sharding semantics are identical). Must be set before the
# first JAX *use* (the axon PJRT plugin may already be registered by
# sitecustomize at interpreter boot, but backend selection is lazy).
assert "jax" not in sys.modules or os.environ.get("JAX_PLATFORMS") == "cpu", \
    "jax imported before conftest could force the CPU platform"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
