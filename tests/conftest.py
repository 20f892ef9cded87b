import os

# Tests run on a virtual 8-device CPU mesh (multi-chip TPU hardware is not
# available in CI; sharding semantics are identical).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
