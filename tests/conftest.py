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

# Persistent compilation cache: XLA-compiles of the u32-limb field ops are
# the dominant test cost; cache them across runs.
import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS from the
# environment; the config knob wins.  Tests must NEVER touch the real
# chip — they run on 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
