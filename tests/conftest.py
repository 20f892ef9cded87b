import os
import sys

# Tests run on a virtual 8-device CPU mesh (multi-chip TPU hardware is not
# available in CI; sharding semantics are identical). sitecustomize may have
# imported jax already (axon plugin registration at interpreter boot), but
# backend *selection* is lazy, so setting the env here still takes effect as
# long as no jax computation has run yet.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

if "jax" in sys.modules:
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
