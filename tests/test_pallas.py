"""Pallas Poseidon sponge kernel vs the host reference (interpret mode
on CPU; the compiled path runs on the real chip via bench.py and the
verify drives).  Subprocess because ELP_BACKEND is frozen at import."""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
from eth_lc_plonky2_tpu.ops import goldilocks as gl, poseidon as pos
from eth_lc_plonky2_tpu.ops.pallas import poseidon_pallas as pp

rng = np.random.default_rng(11)
# interpret mode executes op-by-op (~25 s per absorb chunk), so test
# one single-chunk and one two-chunk width; wider widths only change
# the (already covered) absorb count.  The compiled kernel runs on the
# real chip via bench.py and the verify drives.
for L in (2, 11):
    n = pp.TILE
    vals = rng.integers(0, gl.P, size=(L, n), dtype=np.uint64)
    m = gl.from_u64(vals)
    dlo, dhi = pp.hash_columns(m, interpret=True)
    got = np.asarray(gl.to_u64((dlo, dhi)))  # (n, 4)
    for j in (0, 1, n - 1):
        want = pos.hash_no_pad_host([int(v) for v in vals[:, j]])
        assert [int(v) for v in got[j]] == want, (L, j)
print("PALLAS_SPONGE_OK")
"""


def test_pallas_sponge_interpret():
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
        JAX_COMPILATION_CACHE_DIR=os.path.join(_REPO, ".jax_cache"),
    )
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "PALLAS_SPONGE_OK" in res.stdout
