"""Multi-device prover tests on a virtual 8-device CPU mesh.

The distributed-systems contract (SURVEY.md §4 "multi-node testing"):
proofs are deterministic given witness + transcript, so the sharded
pipeline must produce BYTE-IDENTICAL results to the single-device
pipeline.  ELP_BACKEND is frozen at import, so the JAX-backend run
happens in a subprocess (same pattern as test_jax_backend.py).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import numpy as np
import jax
assert len(jax.devices()) == 8, jax.devices()

from jax.sharding import NamedSharding, PartitionSpec as P
from eth_lc_plonky2_tpu.ops import goldilocks as gl, ntt as nttm
from eth_lc_plonky2_tpu.parallel import make_mesh
from eth_lc_plonky2_tpu.parallel.ntt import make_dist_ntt, make_dist_coset_lde
from eth_lc_plonky2_tpu.parallel.commit import make_sharded_commit
from eth_lc_plonky2_tpu.parallel.prover import prove_sharded
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify
from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig

mesh = make_mesh(8)
rng = np.random.default_rng(7)

# --- 1. distributed NTT == single-device NTT (fwd + inv), natural order ---
for log_n in (8, 10):
    n = 1 << log_n
    vals = rng.integers(0, gl.P, size=(n,), dtype=np.uint64)
    f = gl.from_u64(vals)
    f_sharded = tuple(jax.device_put(a, NamedSharding(mesh, P("x"))) for a in f)
    for inverse in (False, True):
        want = np.asarray(gl.to_u64(nttm.ntt(f, inverse=inverse)))
        got = np.asarray(gl.to_u64(make_dist_ntt(mesh, n, inverse)(f_sharded)))
        assert np.array_equal(want, got), f"dist ntt mismatch n={n} inv={inverse}"
print("DIST_NTT_OK")

# --- 2. distributed coset LDE ---
n = 256
coeffs = gl.from_u64(rng.integers(0, gl.P, size=(n,), dtype=np.uint64))
c_sh = tuple(jax.device_put(a, NamedSharding(mesh, P("x"))) for a in coeffs)
want = np.asarray(gl.to_u64(nttm.coset_lde(coeffs, 3)))
got = np.asarray(gl.to_u64(make_dist_coset_lde(mesh, n, 3)(c_sh)))
assert np.array_equal(want, got), "dist coset lde mismatch"
print("DIST_LDE_OK")

# --- 3. sharded commit == single-device commit ---
vals = rng.integers(0, gl.P, size=(16, 256), dtype=np.uint64)
single = pr.commit_values(vals, 3, 4)
f = gl.from_u64(vals)
f_cols = tuple(jax.device_put(a, NamedSharding(mesh, P("x", None))) for a in f)
lde_s, digests_s, cap_s = make_sharded_commit(mesh, 3, 4)(f_cols)
assert np.array_equal(np.asarray(gl.to_u64(lde_s)), np.asarray(gl.to_u64(single.lde)))
assert np.array_equal(np.asarray(gl.to_u64(digests_s)), np.asarray(gl.to_u64(single.tree.levels[0])))
assert np.array_equal(np.asarray(gl.to_u64(cap_s)), single.cap)
print("SHARDED_COMMIT_OK")

# --- 4. sharded prove == single-device prove, byte for byte ---
cfg = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12))
b = CircuitBuilder(cfg)
x = b.add_virtual_target()
acc = x
while len(b.rows) < 120:
    acc = b.mul_add(acc, x, x)
b.split_le(acc, 32)
b.register_public_input(acc)
data = b.build()
pd, vk = pr.preprocess(data)
w = data.new_witness()
w.set(x, 1)
w.generate()

p1 = pr.prove(pd, w)
pd.kernels.clear()
p2 = prove_sharded(pd, w, mesh)

def eq(a, b_, what):
    assert np.array_equal(np.asarray(a), np.asarray(b_)), f"proof mismatch: {what}"

eq(p1.public_inputs, p2.public_inputs, "public_inputs")
eq(p1.wires_cap, p2.wires_cap, "wires_cap")
eq(p1.zs_cap, p2.zs_cap, "zs_cap")
eq(p1.quotient_cap, p2.quotient_cap, "quotient_cap")
assert p1.openings.values.keys() == p2.openings.values.keys()
for k in p1.openings.values:
    eq(p1.openings.values[k], p2.openings.values[k], f"openings {k}")
f1, f2 = p1.fri_proof, p2.fri_proof
eq(f1.final_poly, f2.final_poly, "final_poly")
assert f1.pow_witness == f2.pow_witness
assert f1.query_indices == f2.query_indices
for c1, c2 in zip(f1.layer_caps, f2.layer_caps):
    eq(c1, c2, "layer cap")
for q1, q2 in zip(f1.query_proofs, f2.query_proofs):
    for tag in q1.batch_leaves:
        eq(q1.batch_leaves[tag], q2.batch_leaves[tag], f"query leaves {tag}")
        for a, bb in zip(q1.batch_paths[tag], q2.batch_paths[tag]):
            eq(a, bb, f"query path {tag}")
    for a, bb in zip(q1.layer_leaves, q2.layer_leaves):
        eq(a, bb, "layer leaf")
verify(data, vk, p2)
print("SHARDED_PROVE_OK")
"""


@pytest.mark.heavy
def test_parallel_equality():
    """Heavy tier: ~40 cold XLA compiles for the 8-device layouts
    (~10+ min on this 2-core host).  The same property — sharded proof
    byte-identical to single-device — is certified in the DEFAULT tier
    by tests/test_multidevice_prove.py (2-device mesh, small config,
    committed numpy reference) and every round by the driver's
    dryrun_multichip; this test additionally covers the full-size
    config and the explicit dist-NTT/commit kernels."""
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
    )
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    for marker in ("DIST_NTT_OK", "DIST_LDE_OK", "SHARDED_COMMIT_OK", "SHARDED_PROVE_OK"):
        assert marker in res.stdout, res.stdout
