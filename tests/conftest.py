"""Test harness: force the CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh; the real-TPU
path is exercised by bench.py / __graft_entry__.py on hardware.

NOTE: on this machine the axon TPU-tunnel plugin registers itself from
sitecustomize at interpreter start and takes minutes to connect.  For fast
local iteration run tests via ``scripts/test.sh`` which unsets
``PALLAS_AXON_POOL_IPS`` before Python starts; this conftest still forces the
CPU backend either way so plain ``python -m pytest tests/`` is correct too.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize may have imported jax and registered the TPU
# backend before this conftest runs — in that case the env vars above are
# too late, so force the platform through the config API as well (this
# works as long as no computation has executed yet).
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# NOTE: the JAX persistent compilation cache is intentionally NOT enabled —
# on this host the XLA:CPU AOT loader reports machine-feature mismatches on
# reload (SIGILL risk).  Runtime compiles are cheap enough for these tests.
