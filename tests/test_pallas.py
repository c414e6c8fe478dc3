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

_NTT_SCRIPT = r"""
import functools
import numpy as np
import jax.numpy as jnp
from eth_lc_plonky2_tpu.ops import goldilocks as gl, ntt as nttm
from eth_lc_plonky2_tpu.ops.pallas import ntt_mxu as mxu

rng = np.random.default_rng(12)
# MXU matmul base kernel (natural output) vs the scan path —
# adversarial values included (p-1 stresses the byte-plane exactness)
for log_n in (4, 7, 8):
    n = 1 << log_n
    vals = rng.integers(0, gl.P, size=(mxu.TILE_B, n), dtype=np.uint64)
    vals[0, :] = gl.P - 1
    f = gl.from_u64(vals)
    for inv in (False, True):
        want = np.asarray(gl.to_u64(nttm.ntt(f, inverse=inv)))
        olo, ohi = mxu.ntt_base(f[0], f[1], inv, interpret=True)
        got = np.asarray(gl.to_u64((olo, ohi)))
        if inv:  # kernel omits the 1/n scale (callers compose it)
            got = ((got.astype(object) * pow(n, gl.P - 2, gl.P)) % gl.P).astype(np.uint64)
        assert np.array_equal(got, want), (log_n, inv)
# Bailey four-step recursion over the base kernel (the n > 256
# production path), one and two recursion levels
mxu.ntt_base = functools.partial(mxu.ntt_base, interpret=True)
for log_n in (9, 14):
    n = 1 << log_n
    vals = rng.integers(0, gl.P, size=(2, n), dtype=np.uint64)
    f = gl.from_u64(vals)
    for inv in (False, True):
        want = np.asarray(gl.to_u64(nttm.ntt(f, inverse=inv)))
        out = nttm._ntt_nat_tpu(f, log_n, inv)
        if inv:
            out = nttm._scale_inverse(out, n)
        assert np.array_equal(np.asarray(gl.to_u64(out)), want), (log_n, inv)
print("PALLAS_NTT_OK")
"""


def _run_pallas_subprocess(script: str, marker: str):
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert marker in res.stdout


def test_pallas_ntt_interpret():
    _run_pallas_subprocess(_NTT_SCRIPT, "PALLAS_NTT_OK")


def test_pallas_sponge_interpret():
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
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
