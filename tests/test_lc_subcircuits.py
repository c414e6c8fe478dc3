"""Light-client subcircuit tests — mirrors the reference's unit_tests.rs
(SURVEY.md §4): real witness + prove/verify per subcircuit, negatives
mapped to generation-conflict (ValueError), vectors drawn from the
mainnet fixtures via hashlib/SSZ host code."""

import hashlib
import os

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gadgets_biguint as gb
from eth_lc_plonky2_tpu.circuit import gadgets_merkle as gm
from eth_lc_plonky2_tpu.circuit import gadgets_sha256 as gs
from eth_lc_plonky2_tpu.eth import ssz
from eth_lc_plonky2_tpu.eth.lc_update import load_update
from eth_lc_plonky2_tpu.models import lc_circuit as lc
from eth_lc_plonky2_tpu.ops import sha256 as shaops
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.debug import check_constraints
from eth_lc_plonky2_tpu.prover.verify import verify

FIXTURE_633 = "/root/reference/eth-lc-plonky2/src/light_client_update_period_633.json"
FIXTURE_634 = "/root/reference/eth-lc-plonky2/src/light_client_update_period_634.json"
needs_fixtures = pytest.mark.skipif(
    not os.path.exists(FIXTURE_633), reason="reference fixtures not mounted"
)

CFG = CircuitConfig(num_wires=184, fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12))


def _prove_verify(b, data, w):
    pd, vk = pr.preprocess(data)
    proof = pr.prove(pd, w)
    verify(data, vk, proof)
    return proof


def _digest(w, h):
    return shaops.bytes_from_words(np.array([w.get(t) for t in h], dtype=np.uint32))


@needs_fixtures
class TestSigningRoot:
    def test_signing_root_proved(self):
        """unit_tests.rs test_signing_root mirror, vectors from fixture 633."""
        u = load_update(FIXTURE_633)
        header_root = u.attested_header.tree_hash_root()
        signing_root = u.signing_root()
        domain = ssz.hash_pair  # noqa: just to reference; domain computed below
        from eth_lc_plonky2_tpu.eth.domain import DOMAIN_SYNC_COMMITTEE, compute_domain, fork_version_at_slot

        dom = compute_domain(DOMAIN_SYNC_COMMITTEE, fork_version_at_slot(u.attested_header.slot))
        assert ssz.signing_data_root(header_root, dom) == signing_root

        b = CircuitBuilder(CFG)
        t = lc.add_virtual_signing_root_target(b)
        data = b.build()
        w = data.new_witness()
        gs.set_hash256(w, t.header_root, header_root)
        gs.set_hash256(w, t.domain, dom)
        w.generate()
        assert _digest(w, t.signing_root) == signing_root
        assert check_constraints(data, w.full_matrix()) == []
        _prove_verify(b, data, w)


@needs_fixtures
class TestBeaconBlockHeader:
    def test_header_root_witness(self):
        """unit_tests.rs test_beacon_block_header mirror (witness-level)."""
        u = load_update(FIXTURE_633)
        h = u.attested_header
        b = CircuitBuilder(CFG)
        t = lc.add_virtual_beacon_block_header_target(b)
        data = b.build()
        w = data.new_witness()
        lc._set_u64_leaf(w, t.slot, h.slot)
        lc._set_u64_leaf(w, t.proposer_index, h.proposer_index)
        gs.set_hash256(w, t.parent_root, h.parent_root)
        gs.set_hash256(w, t.state_root, h.state_root)
        gs.set_hash256(w, t.body_root, h.body_root)
        w.generate()
        assert _digest(w, t.header_root) == h.tree_hash_root()
        assert check_constraints(data, w.full_matrix()) == []


@needs_fixtures
class TestFinalityBranch:
    def test_verify_finality_branch_witness(self):
        """unit_tests.rs test_verify_finality_branch mirror."""
        u = load_update(FIXTURE_633)
        b = CircuitBuilder(CFG)
        t = gm.add_verify_merkle_proof(b, lc.FINALIZED_HEADER_INDEX, lc.FINALIZED_HEADER_HEIGHT)
        data = b.build()
        w = data.new_witness()
        gm.set_verify_merkle_proof_target(
            w, u.finalized_header.tree_hash_root(), u.finality_branch, t
        )
        gs.set_hash256(w, t.root, u.attested_header.state_root)
        w.generate()
        assert check_constraints(data, w.full_matrix()) == []

    def test_wrong_root_conflicts(self):
        u = load_update(FIXTURE_633)
        b = CircuitBuilder(CFG)
        t = gm.add_verify_merkle_proof(b, lc.FINALIZED_HEADER_INDEX, lc.FINALIZED_HEADER_HEIGHT)
        data = b.build()
        w = data.new_witness()
        gm.set_verify_merkle_proof_target(
            w, u.finalized_header.tree_hash_root(), u.finality_branch, t
        )
        gs.set_hash256(w, t.root, b"\xab" * 32)
        with pytest.raises(ValueError):
            w.generate()


@needs_fixtures
class TestContractState:
    def test_contract_state_witness(self):
        """unit_tests.rs test_contract_state mirror: the PI values."""
        u633 = load_update(FIXTURE_633)
        u634 = load_update(FIXTURE_634)
        com_633 = u633.next_sync_committee.tree_hash_root()
        com_634 = u634.next_sync_committee.tree_hash_root()
        b = CircuitBuilder(CFG)
        t = lc.add_virtual_contract_state_target(b)
        data = b.build()
        w = data.new_witness()
        cur_slot = u633.finalized_header.slot
        cur_header = u633.finalized_header.tree_hash_root()
        lc._set_u64_leaf(w, t.cur_slot, cur_slot)
        gs.set_hash256(w, t.cur_header, cur_header)
        gs.set_hash256(w, t.cur_sync_committee_i, com_633)
        gs.set_hash256(w, t.cur_sync_committee_ii, com_634)
        new_slot = u634.finalized_header.slot
        new_header = u634.finalized_header.tree_hash_root()
        lc._set_u64_leaf(w, t.new_slot, new_slot)
        gs.set_hash256(w, t.new_header, new_header)
        gs.set_hash256(w, t.new_sync_committee_i, com_633)
        gs.set_hash256(w, t.new_sync_committee_ii, com_634)
        w.generate()
        assert _digest(w, t.cur_state) == ssz.contract_state_root(cur_slot, cur_header, com_633, com_634)
        assert _digest(w, t.new_state) == ssz.contract_state_root(new_slot, new_header, com_633, com_634)
        assert check_constraints(data, w.full_matrix()) == []


class TestFindSyncCommittee:
    def _build(self):
        b = CircuitBuilder(CFG)
        t = lc.add_virtual_find_sync_committee_target(b)
        # expose mux output
        for tt in t.sync_committee_for_attested_slot:
            b.register_public_input(tt)
        data = b.build()
        return b, t, data

    def test_same_period(self):
        """unit_tests.rs test_find_sync_committee_target (same-period leg)."""
        b, t, data = self._build()
        w = data.new_witness()
        gb.set_biguint_target(w, t.cur_slot_big, 5188736)
        gb.set_biguint_target(w, t.attested_slot_big, 5188822)  # same period 633
        gs.set_hash256(w, t.cur_sync_committee_i, b"\x01" * 32)
        gs.set_hash256(w, t.cur_sync_committee_ii, b"\x02" * 32)
        w.generate()
        assert w.get(t.is_attested_from_next_period) == 0
        assert _digest(w, t.sync_committee_for_attested_slot) == b"\x01" * 32
        assert check_constraints(data, w.full_matrix(), [w.get(x) for x in data.public_input_targets]) == []
        _prove_verify(b, data, w)

    def test_next_period(self):
        b, t, data = self._build()
        w = data.new_witness()
        gb.set_biguint_target(w, t.cur_slot_big, 5188736)  # period 633
        gb.set_biguint_target(w, t.attested_slot_big, 5201076)  # period 634
        gs.set_hash256(w, t.cur_sync_committee_i, b"\x01" * 32)
        gs.set_hash256(w, t.cur_sync_committee_ii, b"\x02" * 32)
        w.generate()
        assert w.get(t.is_attested_from_next_period) == 1
        assert _digest(w, t.sync_committee_for_attested_slot) == b"\x02" * 32

    def test_two_periods_ahead_rejected(self):
        b, t, data = self._build()
        w = data.new_witness()
        gb.set_biguint_target(w, t.cur_slot_big, 5188736)  # period 633
        gb.set_biguint_target(w, t.attested_slot_big, 5188736 + 2 * 8192)  # period 635
        gs.set_hash256(w, t.cur_sync_committee_i, b"\x01" * 32)
        gs.set_hash256(w, t.cur_sync_committee_ii, b"\x02" * 32)
        with pytest.raises(ValueError):
            w.generate()


class TestVerifySyncCommittee:
    def _fixture_case(self, is_next: int, new_i: bytes, expect_ok: bool):
        rng = np.random.default_rng(11)
        leaves = [bytes(rng.integers(0, 256, 32, dtype=np.uint8)) for _ in range(32)]
        committee_ii = leaves[lc.SYNC_COMMITTEE_INDEX - 32]  # index 55 -> leaf 23
        # build branch for generalized index 55 within a 32-leaf tree
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
        cur_i = b"\x01" * 32
        cur_ii = b"\x02" * 32
        gs.set_hash256(w, t.cur_sync_committee_i, cur_i)
        gs.set_hash256(w, t.cur_sync_committee_ii, cur_ii)
        gs.set_hash256(w, t.new_sync_committee_i, new_i)
        gs.set_hash256(w, t.new_sync_committee_ii, committee_ii)
        gs.set_hash256(w, t.finalized_state_root, root)
        for sib_t, sib in zip(t.new_sync_committee_ii_branch, branch):
            gs.set_hash256(w, sib_t, sib)
        if not expect_ok:
            # the mul-masked equality conflicts during generation — the
            # reference's #[should_panic]-on-prove contract
            with pytest.raises(ValueError):
                w.generate()
            return
        w.generate()
        assert check_constraints(data, w.full_matrix()) == []
        _prove_verify(b, data, w)

    def test_next_period_rollover_ok(self):
        """unit_tests.rs ..._when_attested_from_next_period1: new_i == cur_ii."""
        self._fixture_case(1, b"\x02" * 32, True)

    def test_next_period_wrong_new_i_rejected(self):
        """..._when_attested_from_next_period2 (#[should_panic])."""
        self._fixture_case(1, b"\x01" * 32, False)

    def test_not_next_period_ok(self):
        """..._when_not_attested_from_next_period1: new_i == cur_i."""
        self._fixture_case(0, b"\x01" * 32, True)

    def test_not_next_period_wrong_new_i_rejected(self):
        """..._when_not_attested_from_next_period2 (#[should_panic])."""
        self._fixture_case(0, b"\x02" * 32, False)


class TestUpdateValidity:
    def _run(self, cur_slot, finalized_slot, participation):
        b = CircuitBuilder(CFG)
        t = lc.add_virtual_update_validity_target(b)
        data = b.build()
        w = data.new_witness()
        gb.set_biguint_target(w, t.cur_slot_big, cur_slot)
        gb.set_biguint_target(w, t.finalized_slot_big, finalized_slot)
        gb.set_biguint_target(w, t.participation_big, participation)
        w.generate()
        return b, data, w

    def test_valid(self):
        """unit_tests.rs test_update_validity: participation 433 passes."""
        b, data, w = self._run(100, 200, 433)
        assert check_constraints(data, w.full_matrix()) == []
        _prove_verify(b, data, w)

    def test_slot_regression_rejected(self):
        with pytest.raises(ValueError):
            self._run(200, 100, 433)

    def test_low_participation_rejected(self):
        """participation 300 fails (#[should_panic] mirror)."""
        with pytest.raises(ValueError):
            self._run(100, 200, 300)


class TestSyncCommitteeSSZ:
    def _host_root(self, pubkeys, agg):
        chunks = []
        for pk in pubkeys:
            l, r = ssz.pubkey_leaves(pk)
            chunks += [l, r]
        return ssz.hash_pair(ssz.merkleize(chunks), ssz.pubkey_root(agg))

    def test_reduced_committee_witness(self):
        """Structural mirror of test_ssz_sync_committee at size 8."""
        rng = np.random.default_rng(5)
        size = 8
        pubkeys = [bytes(rng.integers(0, 256, 48, dtype=np.uint8)) for _ in range(size)]
        agg = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
        b = CircuitBuilder(CFG)
        sc = lc.add_virtual_sync_committee_target(b, size)
        root = lc.ssz_sync_committee(b, sc)
        data = b.build()
        w = data.new_witness()
        for pk_t, pk in zip(sc.pubkeys, pubkeys):
            for bt, byte in zip(pk_t, pk):
                w.set(bt, byte)
        for bt, byte in zip(sc.aggregate_pubkey, agg):
            w.set(bt, byte)
        w.generate()
        assert _digest(w, root) == self._host_root(pubkeys, agg)
        assert check_constraints(data, w.full_matrix()) == []

    @needs_fixtures
    @pytest.mark.heavy
    def test_full_committee_512_witness(self):
        """The reference's most valuable vector: the full 512-pubkey SSZ
        root of the period-633 fixture committee."""
        u = load_update(FIXTURE_633)
        b = CircuitBuilder(CFG)
        sc = lc.add_virtual_sync_committee_target(b, 512)
        root = lc.ssz_sync_committee(b, sc)
        data = b.build()
        w = data.new_witness()
        for pk_t, pk in zip(sc.pubkeys, u.next_sync_committee.pubkeys):
            for bt, byte in zip(pk_t, pk):
                w.set(bt, byte)
        for bt, byte in zip(sc.aggregate_pubkey, u.next_sync_committee.aggregate_pubkey):
            w.set(bt, byte)
        w.generate()
        assert _digest(w, root) == u.next_sync_committee.tree_hash_root()
        assert check_constraints(data, w.full_matrix()) == []
