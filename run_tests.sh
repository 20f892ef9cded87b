#!/bin/bash
# CPU-only test runner. Clearing PALLAS_AXON_POOL_IPS skips the boot-time axon
# TPU claim in sitecustomize (which serializes across processes and can block
# for minutes under contention); conftest.py forces JAX_PLATFORMS=cpu anyway.
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
