"""Recursion layer (L4): prove, in an outer circuit, that an inner
proof of this proof system verifies.

Mirrors the reference's use of plonky2's recursive verifier —
`add_virtual_proof_with_pis` / `add_virtual_verifier_data` /
`verify_proof` at /root/reference/eth-lc-plonky2/src/targets.rs:468-470
and witness setters at targets.rs:896-897 — including the negative
contract: a tampered inner proof must NOT produce a provable outer
witness (either the witness generators hit a copy-constraint conflict
or the constraint set is violated).
"""

import dataclasses as dc

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import recursion as rec
from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.debug import check_constraints
from eth_lc_plonky2_tpu.prover.verify import verify

P = gl.P

# Reduced FRI strengths keep the outer circuit small enough for the
# default suite; soundness-parameter choice is orthogonal to the
# gadget logic under test.
INNER_FRI = FriConfig(proof_of_work_bits=4, num_query_rounds=4)
OUTER_CFG = CircuitConfig(
    num_wires=142, num_routed_wires=80,
    fri=FriConfig(proof_of_work_bits=4, num_query_rounds=4),
)


@pytest.fixture(scope="module")
def inner():
    b = CircuitBuilder(CircuitConfig(fri=INNER_FRI))
    x = b.add_virtual_target()
    acc = x
    for _ in range(20):
        acc = b.mul_add(acc, x, x)
    b.register_public_input(acc)
    data = b.build()
    pd, vk = pr.preprocess(data)
    w = data.new_witness()
    w.set(x, 3)
    w.generate()
    proof = pr.prove(pd, w)
    verify(data, vk, proof)
    return data, vk, proof


@pytest.fixture(scope="module")
def outer(inner):
    inner_data, vk, proof = inner
    ob = CircuitBuilder(OUTER_CFG)
    pt = rec.add_virtual_proof_with_pis(ob, inner_data)
    vd = rec.add_virtual_verifier_data(ob, inner_data)
    rec.verify_proof_circuit(ob, pt, vd, inner_data)
    ob.register_public_inputs(pt.public_inputs)
    return ob.build(), pt, vd


def _witness(outer_data, pt, vd, proof, vk):
    ow = outer_data.new_witness()
    rec.set_proof_with_pis_target(ow, pt, proof)
    rec.set_verifier_data_target(ow, vd, vk)
    ow.generate()
    return ow


def _rejected(outer_data, pt, vd, proof, vk) -> bool:
    """True iff the tampered proof cannot satisfy the outer circuit."""
    try:
        ow = _witness(outer_data, pt, vd, proof, vk)
    except ValueError:
        return True  # witness-generation copy-constraint conflict
    viol = check_constraints(
        outer_data, ow.full_matrix(),
        [ow.get(t) for t in outer_data.public_input_targets])
    return len(viol) > 0


def test_outer_proves_inner_verification(inner, outer):
    inner_data, vk, proof = inner
    outer_data, pt, vd = outer
    ow = _witness(outer_data, pt, vd, proof, vk)
    viol = check_constraints(
        outer_data, ow.full_matrix(),
        [ow.get(t) for t in outer_data.public_input_targets])
    assert viol == []
    opd, ovk = pr.preprocess(outer_data)
    outer_proof = pr.prove(opd, ow)
    verify(outer_data, ovk, outer_proof)
    # inner public inputs surface as outer public inputs
    assert [int(v) for v in outer_proof.public_inputs] == [
        int(v) for v in proof.public_inputs]


def test_tampered_public_input_rejected(inner, outer):
    inner_data, vk, proof = inner
    outer_data, pt, vd = outer
    bad = dc.replace(proof, public_inputs=np.array(
        [(int(proof.public_inputs[0]) + 1) % P], dtype=np.uint64))
    assert _rejected(outer_data, pt, vd, bad, vk)


def test_tampered_cap_rejected(inner, outer):
    inner_data, vk, proof = inner
    outer_data, pt, vd = outer
    caps = np.array(proof.wires_cap, dtype=np.uint64).copy()
    caps[0, 0] = int(caps[0, 0]) ^ 1
    bad = dc.replace(proof, wires_cap=caps)
    assert _rejected(outer_data, pt, vd, bad, vk)


def test_tampered_opening_rejected(inner, outer):
    inner_data, vk, proof = inner
    outer_data, pt, vd = outer
    vals = dict(proof.openings.values)
    key = ("W", 0)
    rows = np.array(vals[key], dtype=np.uint64).copy()
    rows[0, 0] = (int(rows[0, 0]) + 1) % P
    vals[key] = rows
    bad = dc.replace(proof, openings=dc.replace(proof.openings, values=vals))
    assert _rejected(outer_data, pt, vd, bad, vk)


def test_wrong_verifier_data_rejected(inner, outer):
    inner_data, vk, proof = inner
    outer_data, pt, vd = outer
    caps = np.array(vk.pre_cap, dtype=np.uint64).copy()
    caps[0, 0] = int(caps[0, 0]) ^ 1
    bad_vk = dc.replace(vk, pre_cap=caps)
    assert _rejected(outer_data, pt, vd, proof, bad_vk)
