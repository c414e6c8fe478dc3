"""SSZ / domain / update-parsing tests against the reference's mainnet
fixtures (loaded read-only from the reference mount) and its pinned
vectors (SURVEY.md §4)."""

import os

import pytest

from eth_lc_plonky2_tpu.eth import ssz
from eth_lc_plonky2_tpu.eth.domain import SLOTS_PER_PERIOD
from eth_lc_plonky2_tpu.eth.lc_update import bits_from_hex, load_update

FIXTURE_633 = "/root/reference/eth-lc-plonky2/src/light_client_update_period_633.json"
FIXTURE_634 = "/root/reference/eth-lc-plonky2/src/light_client_update_period_634.json"

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(FIXTURE_633), reason="reference fixtures not mounted"
)


def test_uint64_leaf():
    assert ssz.uint64_leaf(25000) == (25000).to_bytes(8, "little") + b"\x00" * 24


def test_merkleize_pads_to_pow2():
    z = b"\x00" * 32
    assert ssz.merkleize([z, z]) == ssz.hash_pair(z, z)
    # 5 leaves pad to 8
    r8 = ssz.merkleize([z] * 8)
    r5 = ssz.merkleize([z] * 5)
    assert r5 == r8


def test_bits_from_hex_lsb_first():
    # parity with utils.rs:323-329 (test_bits_from_hex): LSB-first per byte
    bits = bits_from_hex("0x01")
    assert bits[0] == 1 and sum(bits) == 1
    bits = bits_from_hex("0x80")
    assert bits[7] == 1 and sum(bits) == 1


@needs_fixtures
class TestFixtures:
    def test_load_and_periods(self):
        u633 = load_update(FIXTURE_633)
        u634 = load_update(FIXTURE_634)
        assert u633.attested_header.slot == 5188822
        assert u633.finalized_header.slot == 5188736
        assert u634.attested_header.slot == 5201076
        assert u634.finalized_header.slot == 5200992
        assert u633.attested_period == 633
        assert u634.attested_period == 634
        assert len(u633.next_sync_committee.pubkeys) == 512
        assert len(u633.finality_branch) == 6
        assert len(u633.next_sync_committee_branch) == 5

    def test_participation_supermajority(self):
        u = load_update(FIXTURE_633)
        assert 342 < u.participation <= 512

    def test_finality_branch_verifies(self):
        """The finality branch must prove the finalized header root at
        generalized index 105 (height 6) against the attested state root
        (targets.rs:449-461 wiring)."""
        u = load_update(FIXTURE_633)
        leaf = u.finalized_header.tree_hash_root()
        idx = 105
        node = leaf
        for sib in u.finality_branch:
            if idx % 2 == 0:
                node = ssz.hash_pair(node, sib)
            else:
                node = ssz.hash_pair(sib, node)
            idx //= 2
        assert node == u.attested_header.state_root

    def test_committee_branch_verifies(self):
        """next_sync_committee at index 55, height 5, against the
        ATTESTED state root (the reference wires its
        'finalized_state_root' input to the attested header's state
        root — targets.rs:577-580, SURVEY.md §2)."""
        u = load_update(FIXTURE_634)
        leaf = u.next_sync_committee.tree_hash_root()
        idx = 55
        node = leaf
        for sib in u.next_sync_committee_branch:
            if idx % 2 == 0:
                node = ssz.hash_pair(node, sib)
            else:
                node = ssz.hash_pair(sib, node)
            idx //= 2
        assert node == u.attested_header.state_root

    def test_sync_committee_root_stable(self):
        u = load_update(FIXTURE_633)
        root = u.next_sync_committee.tree_hash_root()
        assert len(root) == 32
        # deterministic
        assert root == u.next_sync_committee.tree_hash_root()
