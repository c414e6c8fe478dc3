"""Test configuration: force CPU with 8 virtual devices.

Real TPU hardware in this environment is a single chip; multi-chip
sharding tests run on a virtual 8-device CPU mesh instead (the driver
separately dry-runs the multi-chip path via __graft_entry__).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Tests run the numpy backend (bit-identical algorithms, no XLA compile
# latency); the JAX/TPU path is exercised by bench.py, __graft_entry__,
# and the verify-skill TPU drives.
os.environ.setdefault("ELP_BACKEND", "numpy")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the
# environment; the config knob wins.  Tests must NEVER touch the real
# chip — they run on 8 virtual CPU devices.
#
# No persistent compilation cache here: XLA:CPU AOT cache entries pin
# the builder machine's CPU features and load pathologically slowly on
# any other machine (~60 s per hit) — cold compiles are cheaper.
jax.config.update("jax_platforms", "cpu")
