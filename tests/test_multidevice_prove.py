"""Multi-device certification: the GSPMD sharded prover on a 2-device
CPU mesh must produce a proof byte-identical to the committed
numpy-backend reference proof (assets/dryrun/, kept honest by
tests/test_dryrun_assets.py).

Tier: ci_heavy.  The subprocess pays ~5-10 min of XLA:CPU compiles on
the 2-vCPU host, which blows the default-tier wall-clock budget; the
sharded path is still certified every round by the driver's
__graft_entry__.dryrun_multichip (8 devices) and by running this tier
explicitly:

    python -m pytest tests/ -m ci_heavy -q

Runs in a subprocess because ELP_BACKEND is frozen at import.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import __graft_entry__ as g
g.dryrun_multichip(2)
print("DRYRUN2_OK")
"""


@pytest.mark.ci_heavy
def test_two_device_sharded_prove_matches_reference():
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2").strip(),
    )
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "DRYRUN2_OK" in res.stdout, res.stdout
