"""BLS proof absorption: the app circuit verifies an inner proof whose
public inputs are the 4-element Poseidon digest of the
targets.rs:471-482 bound values (signing_root_bytes / signature_bytes
/ pubkey bytes / participation bits), hashes its own copies of those
wires in-circuit, and connects the digests.  A signing-root mismatch
between the inner proof and the app witness must make the circuit
unsatisfiable."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.eth.synthetic import make_synthetic_update_pair
from eth_lc_plonky2_tpu.models import bls
from eth_lc_plonky2_tpu.models import lc_circuit as lc
from eth_lc_plonky2_tpu.ops import poseidon as pos
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.debug import check_constraints

SIZE = 4
TEST_FRI = FriConfig(proof_of_work_bits=4, num_query_rounds=4)
APP_CFG = CircuitConfig(num_wires=184, fri=TEST_FRI)


def host_bound_digest(kw, size):
    """The expected inner-PI digest, computed with the host Poseidon."""
    vals = list(kw["signing_root"]) + list(kw["signature"])
    for pk, bit in zip(kw["sync_committee_pubkeys"], kw["sync_committee_bits"]):
        vals.extend(pk)
        vals.append(int(bit))
    assert len(vals) == bls.num_bls_bound_values(size)
    return pos.hash_no_pad_host(vals)


@pytest.fixture(scope="module")
def setup():
    syn = make_synthetic_update_pair(SIZE, seed=7)
    kw = syn.witness_kwargs
    inner_data = bls.build_dummy_bls_circuit(SIZE, fri=TEST_FRI)
    assert len(inner_data.public_input_targets) == bls.DIGEST_LEN
    inner_proof, inner_vk = bls.prove_dummy_bls(
        inner_data,
        kw["signing_root"],
        kw["signature"],
        kw["sync_committee_pubkeys"],
        kw["sync_committee_bits"],
    )

    b = CircuitBuilder(APP_CFG)
    t = lc.add_virtual_proof_target(b, committee_size=SIZE, threshold=syn.threshold)
    pt, vd = bls.absorb_bls_proof(b, t, inner_data)
    data = b.build()
    return syn, inner_data, inner_proof, inner_vk, data, t, pt, vd


def _run(data, t, pt, vd, kw, inner_proof, inner_vk):
    w = data.new_witness()
    lc.set_proof_target(w, t, **kw)
    bls.set_bls_proof_target(w, pt, vd, inner_proof, inner_vk)
    w.generate()
    return w


def test_absorbed_proof_satisfies_circuit(setup):
    syn, inner_data, inner_proof, inner_vk, data, t, pt, vd = setup
    w = _run(data, t, pt, vd, syn.witness_kwargs, inner_proof, inner_vk)
    assert check_constraints(data, w.full_matrix()) == []


def test_mismatched_signing_root_rejected(setup):
    """Inner proof attests a different signing root -> unsatisfiable
    (witness-generation copy conflict or constraint violation)."""
    syn, inner_data, inner_proof, inner_vk, data, t, pt, vd = setup
    kw = syn.witness_kwargs
    bad_root = bytes(32)
    assert bad_root != kw["signing_root"]
    bad_proof, bad_vk = bls.prove_dummy_bls(
        inner_data,
        bad_root,
        kw["signature"],
        kw["sync_committee_pubkeys"],
        kw["sync_committee_bits"],
    )
    try:
        w = _run(data, t, pt, vd, kw, bad_proof, bad_vk)
    except ValueError:
        return  # rejected at witness generation
    assert len(check_constraints(data, w.full_matrix())) > 0


def test_mismatched_participation_bit_rejected(setup):
    syn, inner_data, inner_proof, inner_vk, data, t, pt, vd = setup
    kw = syn.witness_kwargs
    bits = list(kw["sync_committee_bits"])
    bits[0] = 1 - int(bits[0])
    bad_proof, bad_vk = bls.prove_dummy_bls(
        inner_data,
        kw["signing_root"],
        kw["signature"],
        kw["sync_committee_pubkeys"],
        bits,
    )
    try:
        w = _run(data, t, pt, vd, kw, bad_proof, bad_vk)
    except ValueError:
        return
    assert len(check_constraints(data, w.full_matrix())) > 0


def test_pi_digest_binds_values_in_canonical_order(setup):
    """The inner proof's 4 PIs are the Poseidon digest of the bound
    values in exact targets.rs:471-482 order, and the honest outer
    witness reproduces the same digest at the inner-PI targets."""
    syn, inner_data, inner_proof, inner_vk, data, t, pt, vd = setup
    kw = syn.witness_kwargs
    expect = host_bound_digest(kw, SIZE)
    assert [int(v) for v in inner_proof.public_inputs] == [int(v) for v in expect]
    w = _run(data, t, pt, vd, kw, inner_proof, inner_vk)
    assert [w.get(x) for x in pt.public_inputs] == [int(v) for v in expect]


@pytest.mark.ci_heavy
def test_absorbing_circuit_proves_and_verifies(setup):
    """The absorbing app circuit goes through preprocess/prove/verify
    end-to-end (VERDICT r3 item 6: absorption proven per round via the
    ci_heavy tier, not just constraint-checked; the constraint-level
    absorption checks above stay in the default tier)."""
    from eth_lc_plonky2_tpu.prover.verify import verify

    syn, inner_data, inner_proof, inner_vk, data, t, pt, vd = setup
    w = _run(data, t, pt, vd, syn.witness_kwargs, inner_proof, inner_vk)
    pd, vk = pr.preprocess(data)
    proof = pr.prove(pd, w)
    verify(data, vk, proof)
