"""Prove-time soundness negatives for the light-client subcircuits.

The reference's negative tests `#[should_panic]` on `prove()` over a
fully-set witness (/root/reference/eth-lc-plonky2/src/unit_tests.rs:
377,555,654,686 and the finality-branch case): the CONSTRAINTS reject
the bad statement, not merely the witness-generation bookkeeping.
The default-tier mirrors in test_lc_subcircuits.py fire earlier, as
witness-generation conflicts; these tests force generation past the
conflict (overwrite semantics, no conflict check) so a complete —
inconsistent — witness reaches the real prover, then assert the
prover+verifier pair rejects it with VerificationError.

This is the exact contract the reference pins: an unsatisfiable
light-client statement cannot yield a verifying proof.
"""

import hashlib
import types

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gadgets_biguint as gb
from eth_lc_plonky2_tpu.circuit import gadgets_merkle as gm
from eth_lc_plonky2_tpu.circuit import gadgets_sha256 as gs
from eth_lc_plonky2_tpu.models import lc_circuit as lc
from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.ops import sha256 as shaops
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.debug import check_constraints
from eth_lc_plonky2_tpu.prover.verify import VerificationError, verify

P = gl.P

# small FRI params: soundness of the CONSTRAINT identity at zeta does
# not depend on query count, and these proves run on the numpy backend
CFG = CircuitConfig(num_wires=184, fri=FriConfig(proof_of_work_bits=4, num_query_rounds=4))


def force_generate(w, overrides=()):
    """Run witness generation with overwrite semantics (skip the
    conflict check), then re-force `overrides` [(target, value)...]
    LAST so the adversarial values are what the constraint system
    sees.  Mirrors the reference situation where `PartialWitness`
    accepts any fully-set assignment and `prove()` is the gatekeeper."""

    def _force(self, t, v):
        sid = self._sid(t)
        self.values[sid] = int(v) % P
        self.known[sid] = True

    w.set = types.MethodType(_force, w)
    try:
        w.generate()
        for t, v in overrides:
            w.set(t, v)
    finally:
        del w.set


def hash256_overrides(target, digest32: bytes):
    words = shaops.words_from_bytes(digest32)
    return [(t, int(v)) for t, v in zip(target, words)]


def assert_prover_rejects(data, w):
    """The fully-set inconsistent witness must (a) violate constraints
    and (b) fail prove+verify — the reference's panic-on-prove
    contract, realized here as VerificationError."""
    assert check_constraints(data, w.full_matrix()) != [], (
        "expected an unsatisfiable witness; the negative case is wrong"
    )
    pd, vk = pr.preprocess(data)
    with pytest.raises(VerificationError):
        proof = pr.prove(pd, w)
        verify(data, vk, proof)


# ---------------------------------------------------------------------------
# 1+2. VerifySyncCommittee conditional equality (unit_tests.rs:377,555)
# ---------------------------------------------------------------------------


def _verify_sync_committee_case(is_next: int, new_i: bytes):
    rng = np.random.default_rng(11)
    leaves = [bytes(rng.integers(0, 256, 32, dtype=np.uint8)) for _ in range(32)]
    committee_ii = leaves[lc.SYNC_COMMITTEE_INDEX - 32]
    layer = list(leaves)
    idx = lc.SYNC_COMMITTEE_INDEX - 32
    branch = []
    while len(layer) > 1:
        branch.append(layer[idx ^ 1])
        layer = [hashlib.sha256(layer[i] + layer[i + 1]).digest() for i in range(0, len(layer), 2)]
        idx //= 2
    root = layer[0]

    b = CircuitBuilder(CFG)
    t = lc.add_virtual_verify_sync_committee_target(b)
    data = b.build()
    w = data.new_witness()
    w.set(t.is_attested_from_next_period, is_next)
    gs.set_hash256(w, t.cur_sync_committee_i, b"\x01" * 32)
    gs.set_hash256(w, t.cur_sync_committee_ii, b"\x02" * 32)
    gs.set_hash256(w, t.new_sync_committee_i, new_i)
    gs.set_hash256(w, t.new_sync_committee_ii, committee_ii)
    gs.set_hash256(w, t.finalized_state_root, root)
    for sib_t, sib in zip(t.new_sync_committee_ii_branch, branch):
        gs.set_hash256(w, sib_t, sib)
    force_generate(w, overrides=hash256_overrides(t.new_sync_committee_i, new_i))
    assert_prover_rejects(data, w)


def test_next_period_wrong_new_i_rejected_at_prove():
    """unit_tests.rs:377 — attested from next period but new_i != cur_ii."""
    _verify_sync_committee_case(1, b"\x01" * 32)


def test_not_next_period_wrong_new_i_rejected_at_prove():
    """unit_tests.rs:555 — not next period but new_i != cur_i."""
    _verify_sync_committee_case(0, b"\x02" * 32)


# ---------------------------------------------------------------------------
# 3+4. UpdateValidity (unit_tests.rs:654,686)
# ---------------------------------------------------------------------------


def _update_validity_case(cur_slot: int, finalized_slot: int, participation: int):
    b = CircuitBuilder(CFG)
    t = lc.add_virtual_update_validity_target(b)
    data = b.build()
    w = data.new_witness()
    gb.set_biguint_target(w, t.cur_slot_big, cur_slot)
    gb.set_biguint_target(w, t.finalized_slot_big, finalized_slot)
    gb.set_biguint_target(w, t.participation_big, participation)
    # input limbs are never generator outputs, so no override needed:
    # with the bad inputs pinned, NO consistent completion exists
    force_generate(w)
    assert_prover_rejects(data, w)


def test_slot_regression_rejected_at_prove():
    """unit_tests.rs:654 — cur_slot > finalized_slot."""
    _update_validity_case(200, 100, 433)


def test_low_participation_rejected_at_prove():
    """unit_tests.rs:686 — participation 300 <= threshold 342."""
    _update_validity_case(100, 200, 300)


# ---------------------------------------------------------------------------
# 5. Finality-branch Merkle proof with a forged root
# ---------------------------------------------------------------------------


def test_wrong_finality_root_rejected_at_prove():
    """The finality-branch membership proof (index 105, height 6)
    against a wrong attested state root: the SHA-256 chain cannot
    terminate in the forged root."""
    rng = np.random.default_rng(3)
    leaf = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
    branch = [bytes(rng.integers(0, 256, 32, dtype=np.uint8))
              for _ in range(lc.FINALIZED_HEADER_HEIGHT)]
    wrong_root = b"\xab" * 32

    b = CircuitBuilder(CFG)
    t = gm.add_verify_merkle_proof(b, lc.FINALIZED_HEADER_INDEX, lc.FINALIZED_HEADER_HEIGHT)
    data = b.build()
    w = data.new_witness()
    gm.set_verify_merkle_proof_target(w, leaf, branch, t)
    gs.set_hash256(w, t.root, wrong_root)
    # the SHA generator overwrites the claimed-root slot with the true
    # root during forced generation; re-force the forgery afterwards
    force_generate(w, overrides=hash256_overrides(t.root, wrong_root))
    assert_prover_rejects(data, w)
