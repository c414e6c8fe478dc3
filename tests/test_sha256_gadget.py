"""In-circuit SHA-256 segment + Merkle gadget tests.

Mirrors the reference's merkle_tree_gadget tests (SURVEY.md §4):
prove+verify real subcircuits; expected roots recomputed independently
with hashlib (the same values the reference hard-codes)."""

import hashlib

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gadgets_merkle as gm
from eth_lc_plonky2_tpu.circuit import gadgets_sha256 as gs
from eth_lc_plonky2_tpu.ops import sha256 as shaops
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify, VerificationError

SHA_CONFIG = CircuitConfig(
    num_wires=184, fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12)
)


def _digest_bytes(w, target):
    return shaops.bytes_from_words(
        np.array([w.get(t) for t in target], dtype=np.uint32)
    )


class TestTwoToOneWitness:
    def test_two_to_one_matches_hashlib(self):
        b = CircuitBuilder(SHA_CONFIG)
        left = gs.add_virtual_hash256(b)
        right = gs.add_virtual_hash256(b)
        out = gs.two_to_one_sha256(b, left, right)
        data = b.build()
        w = data.new_witness()
        l = bytes(range(32))
        r = bytes(range(32, 64))
        gs.set_hash256(w, left, l)
        gs.set_hash256(w, right, r)
        w.generate()
        assert _digest_bytes(w, out) == hashlib.sha256(l + r).digest()

    def test_two_to_one_prove_verify(self):
        b = CircuitBuilder(SHA_CONFIG)
        left = gs.add_virtual_hash256(b)
        right = gs.add_virtual_hash256(b)
        out = gs.two_to_one_sha256(b, left, right)
        expected = gs.add_virtual_hash256(b)
        gs.connect_hash256(b, out, expected)
        b.register_public_inputs(out)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        l = b"\x11" * 32
        r = b"\x22" * 32
        gs.set_hash256(w, left, l)
        gs.set_hash256(w, right, r)
        gs.set_hash256(w, expected, hashlib.sha256(l + r).digest())
        w.generate()
        proof = pr.prove(pd, w)
        verify(data, vk, proof)
        got = shaops.bytes_from_words(np.array(proof.public_inputs, dtype=np.uint32))
        assert got == hashlib.sha256(l + r).digest()

    def test_wrong_expected_root_fails_at_generation(self):
        b = CircuitBuilder(SHA_CONFIG)
        left = gs.add_virtual_hash256(b)
        right = gs.add_virtual_hash256(b)
        out = gs.two_to_one_sha256(b, left, right)
        expected = gs.add_virtual_hash256(b)
        gs.connect_hash256(b, out, expected)
        data = b.build()
        w = data.new_witness()
        gs.set_hash256(w, left, b"\x00" * 32)
        gs.set_hash256(w, right, b"\x00" * 32)
        gs.set_hash256(w, expected, b"\xff" * 32)  # wrong
        with pytest.raises(ValueError):
            w.generate()


class TestMerkleTreeGadget:
    @pytest.mark.parametrize("height", [1, 2])
    def test_merkle_root_zero_leaves(self, height):
        """The reference pins these roots (merkle_tree_gadget.rs tests:
        e.g. height-1 root f5a5fd42...); recompute via hashlib."""
        b = CircuitBuilder(SHA_CONFIG)
        tree = gm.add_virtual_merkle_tree_sha256(b, height)
        expected = gs.add_virtual_hash256(b)
        gs.connect_hash256(b, expected, tree.root)
        b.register_public_inputs(tree.root)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        leaves = [b"\x00" * 32] * (1 << height)
        gm.set_partial_merkle_tree_sha256_target(w, leaves, tree)
        gs.set_hash256(w, expected, gm.merkle_root_sha256(leaves))
        w.generate()
        proof = pr.prove(pd, w)
        verify(data, vk, proof)
        if height == 1:
            got = shaops.bytes_from_words(np.array(proof.public_inputs, dtype=np.uint32))
            assert got[:4] == bytes([245, 165, 253, 66])

    def test_verify_merkle_proof(self):
        height = 3
        leaf_index = 5
        rng = np.random.default_rng(7)
        leaves = [bytes(rng.integers(0, 256, 32, dtype=np.uint8)) for _ in range(8)]
        root = gm.merkle_root_sha256(leaves)
        # branch for leaf 5
        layer = list(leaves)
        idx = leaf_index
        branch = []
        while len(layer) > 1:
            branch.append(layer[idx ^ 1])
            layer = [
                hashlib.sha256(layer[i] + layer[i + 1]).digest()
                for i in range(0, len(layer), 2)
            ]
            idx //= 2
        b = CircuitBuilder(SHA_CONFIG)
        vt = gm.add_verify_merkle_proof(b, leaf_index, height)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        gm.set_verify_merkle_proof_target(w, leaves[leaf_index], branch, vt)
        gs.set_hash256(w, vt.root, root)
        w.generate()
        proof = pr.prove(pd, w)
        verify(data, vk, proof)

    def test_forged_sha_witness_rejected(self):
        """Forge one round's output word (copy-consistent) — the SHA
        segment constraints must reject it at verification."""
        from eth_lc_plonky2_tpu.circuit import gates_sha256 as gsha

        b = CircuitBuilder(SHA_CONFIG)
        left = gs.add_virtual_hash256(b)
        right = gs.add_virtual_hash256(b)
        out = gs.two_to_one_sha256(b, left, right)
        b.register_public_inputs(out)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        gs.set_hash256(w, left, b"\x00" * 32)
        gs.set_hash256(w, right, b"\x00" * 32)
        w.generate()
        # flip a bit wire in the middle of the first segment (round 30's
        # a-bit 7) AND its word so word-consistency still holds locally
        row = 4 + 30
        sid_bit = int(data.rep[row * data.config.num_wires + gsha.A_BITS + 7])
        sid_word = int(data.rep[row * data.config.num_wires + gsha.COL_WA])
        bit = int(w.values[sid_bit])
        w.values[sid_bit] = 1 - bit
        w.values[sid_word] = int(w.values[sid_word]) + (128 if bit == 0 else -128)
        proof = pr.prove(pd, w)
        with pytest.raises(VerificationError):
            verify(data, vk, proof)


def test_batched_quotient_matches_eval():
    """absorb_sha_quotient (the jax-path batched evaluator) computes
    bit-identical values to the unrolled eval() + per-constraint
    absorption on arbitrary field inputs — the invariant that keeps
    jax-backend proof bytes equal to the numpy backend's."""
    import jax.numpy as jnp

    from eth_lc_plonky2_tpu.circuit import gates_sha256 as g
    from eth_lc_plonky2_tpu.circuit.algebra import DeviceBaseAlgebra
    from eth_lc_plonky2_tpu.ops import goldilocks as gl

    rng = np.random.default_rng(11)
    n_lde = 256
    rate = 3
    nw = g.NUM_WIRES_REQUIRED
    gate = g.Sha256RoundGate()
    nc = gate.num_constraints

    def rnd(shape):
        return gl.from_u64(rng.integers(0, gl.P, size=shape, dtype=np.uint64))

    wires_lde = rnd((nw, n_lde))
    const_rows = rnd((4, n_lde))
    sel = rnd((n_lde,))
    apow_rows = [rnd((nc,)) for _ in range(2)]
    accs = [rnd((n_lde,)) for _ in range(2)]

    def roll(a, offset):
        from eth_lc_plonky2_tpu.ops import ntt as nttm

        return nttm.roll_lde(a, offset, rate)

    # reference: unrolled eval + one absorb per constraint
    A = DeviceBaseAlgebra((n_lde,))
    cons = gate.eval(
        A,
        lambda col, offset=0: roll((wires_lde[0][col], wires_lde[1][col]), offset),
        lambda i: (const_rows[0][i], const_rows[1][i]),
    )
    assert len(cons) == nc
    want = []
    for j in range(2):
        acc = accs[j]
        for k, cval in enumerate(cons):
            p = (
                jnp.broadcast_to(apow_rows[j][0][k], (n_lde,)),
                jnp.broadcast_to(apow_rows[j][1][k], (n_lde,)),
            )
            acc = gl.add(acc, gl.mul(p, gl.mul(sel, cval)))
        want.append(acc)

    got = g.absorb_sha_quotient(
        wires_lde,
        lambda i: (const_rows[0][i], const_rows[1][i]),
        sel,
        apow_rows,
        accs,
        rate,
    )
    for j in range(2):
        np.testing.assert_array_equal(np.asarray(got[j][0]), np.asarray(want[j][0]))
        np.testing.assert_array_equal(np.asarray(got[j][1]), np.asarray(want[j][1]))
