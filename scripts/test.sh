#!/bin/bash
# Fast test runner: skip the axon TPU-tunnel registration (minutes of connect
# time at interpreter start) — tests run on the CPU backend anyway.
cd "$(dirname "$0")/.." || exit 1
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m pytest tests/ "$@"
