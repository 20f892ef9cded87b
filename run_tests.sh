#!/bin/bash
# CPU-only test runner. Clearing PALLAS_AXON_POOL_IPS skips the boot-time axon
# TPU claim in sitecustomize (which serializes across processes and can block
# for minutes under contention); conftest.py forces JAX_PLATFORMS=cpu anyway.
set -e
cd "$(dirname "$0")"

# Build the native runtime FIRST and fail loudly if it doesn't compile —
# a silent native.available()=False must never masquerade as a green run
# (reference bar: the whole runtime compiles or nothing ships, Makefile).
SRC=genozip_tpu/native/gxz_native.cpp
LIB=genozip_tpu/native/libgxz.so
if [ ! -f "$LIB" ] || [ "$SRC" -nt "$LIB" ]; then
    echo "building $LIB ..."
    g++ -O3 -march=native -shared -fPIC "$SRC" -o "$LIB.tmp" -lz -ldeflate \
        || { echo "FATAL: native runtime failed to compile" >&2; exit 2; }
    mv "$LIB.tmp" "$LIB"
fi
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu GXZ_REQUIRE_NATIVE=1 \
    python -c "from genozip_tpu import native; assert native.available()" \
    || { echo "FATAL: native runtime failed to load" >&2; exit 2; }

exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q "$@"
