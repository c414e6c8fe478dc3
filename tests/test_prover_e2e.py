"""End-to-end prove + verify on small circuits, incl. soundness
(negative) checks — the harness shape of the reference's unit tests
(SURVEY.md §3.5/§4: build -> prove -> verify, with #[should_panic]
negatives mapped to VerificationError here)."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify, VerificationError

P = (1 << 64) - (1 << 32) + 1

TEST_CONFIG = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12))


def _build_mul_add_circuit():
    """out = x*y + x + 7 with out public."""
    b = CircuitBuilder(TEST_CONFIG)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    xy = b.mul(x, y)
    s = b.add(xy, x)
    out = b.add_const(s, 7)
    b.register_public_input(out)
    return b, x, y, out


class TestProveVerify:
    def test_roundtrip(self):
        b, x, y, out = _build_mul_add_circuit()
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(x, 5)
        w.set(y, 11)
        w.generate()
        assert w.get(out) == 5 * 11 + 5 + 7
        proof = pr.prove(pd, w)
        assert int(proof.public_inputs[0]) == 67
        verify(data, vk, proof)  # must not raise

    def test_wrong_public_input_rejected(self):
        b, x, y, out = _build_mul_add_circuit()
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(x, 5)
        w.set(y, 11)
        w.generate()
        proof = pr.prove(pd, w)
        proof.public_inputs = np.array([68], dtype=np.uint64)
        with pytest.raises(VerificationError):
            verify(data, vk, proof)

    def test_unsatisfied_gate_detected_at_generation(self):
        """Violating a boolean constraint is caught while generating the
        witness (the reference's #[should_panic]-on-prove contract:
        an inconsistent witness cannot produce a proof)."""
        b = CircuitBuilder(TEST_CONFIG)
        t = b.add_virtual_target()
        b.assert_bool(t)
        o = b.mul_const(3, t)
        b.register_public_input(o)
        data = b.build()
        w = data.new_witness()
        w.set(t, 2)  # not boolean
        with pytest.raises(ValueError):
            w.generate()

    def test_unsatisfied_gate_rejected_by_verifier(self):
        """A forged witness matrix that violates a gate constraint (but is
        internally copy-consistent) must be rejected at verification."""
        b = CircuitBuilder(TEST_CONFIG)
        t = b.add_virtual_target()
        b.assert_bool(t)
        o = b.mul_const(3, t)
        b.register_public_input(o)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(t, 1)
        w.generate()
        # forge: flip t's value to 2 in the raw store AFTER generation so
        # all copies stay consistent but b*b - b != 0
        sid = int(data.rep[t.row * data.config.num_wires + t.col])
        w.values[sid] = 2

        proof = pr.prove(pd, w)
        with pytest.raises(VerificationError):
            verify(data, vk, proof)

    def test_copy_constraint_violation_rejected(self):
        """Tampering a committed wire after generation breaks the
        permutation argument."""
        b, x, y, out = _build_mul_add_circuit()
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(x, 5)
        w.set(y, 11)
        w.generate()
        # Tamper the raw value store at a non-representative slot: find a
        # slot whose rep differs, break the aliasing by writing the matrix
        # entry directly via a custom full_matrix.
        mat = w.full_matrix()
        tampered = mat.copy()
        # out wire: bump its local copy only
        r, c = data.public_input_targets[0]
        tampered[c, r] = (int(tampered[c, r]) + 1) % P

        class FakeWitness:
            def full_matrix(self_inner):
                return tampered

            def get(self_inner, t):
                return w.get(t)

        proof = pr.prove(pd, FakeWitness())
        with pytest.raises(VerificationError):
            verify(data, vk, proof)

    def test_split_le_and_select(self):
        b = CircuitBuilder(TEST_CONFIG)
        v = b.add_virtual_target()
        bits = b.split_le(v, 32)
        back = b.le_sum(bits)
        b.assert_equal(back, v)
        flag = b.add_virtual_bool_target()
        alt = b.constant(999)
        sel = b.select(flag, v, alt)
        b.register_public_input(sel)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(v, 0xDEADBEEF)
        w.set(flag, 1)
        w.generate()
        proof = pr.prove(pd, w)
        assert int(proof.public_inputs[0]) == 0xDEADBEEF
        verify(data, vk, proof)

    def test_is_equal(self):
        b = CircuitBuilder(TEST_CONFIG)
        u = b.add_virtual_target()
        v = b.add_virtual_target()
        eq = b.is_equal(u, v)
        b.register_public_input(eq)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(u, 42)
        w.set(v, 42)
        w.generate()
        proof = pr.prove(pd, w)
        assert int(proof.public_inputs[0]) == 1
        verify(data, vk, proof)


class TestFriTampering:
    """The verifier's FRI checks must bite: tamper a query path digest,
    a fold-layer leaf, and a final-poly coefficient (VERDICT round-1
    weak #6)."""

    def _proved(self):
        # enough rows that FRI actually folds (n_lde > stop_size)
        b = CircuitBuilder(TEST_CONFIG)
        x = b.add_virtual_target()
        acc = x
        while len(b.rows) < 120:
            acc = b.mul_add(acc, x, x)
        b.register_public_input(acc)
        data = b.build()
        assert data.log_n >= 7  # at least 2 fold layers
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(x, 3)
        w.generate()
        proof = pr.prove(pd, w)
        assert len(proof.fri_proof.layer_caps) >= 2
        return data, vk, proof

    def test_tampered_batch_path_rejected(self):
        data, vk, proof = self._proved()
        qp = proof.fri_proof.query_proofs[0]
        qp.batch_paths["W"][0] = (qp.batch_paths["W"][0] + np.uint64(1)) % np.uint64(P)
        with pytest.raises(VerificationError, match="merkle path"):
            verify(data, vk, proof)

    def test_tampered_layer_leaf_rejected(self):
        data, vk, proof = self._proved()
        qp = proof.fri_proof.query_proofs[0]
        qp.layer_leaves[0] = (qp.layer_leaves[0] + np.uint64(1)) % np.uint64(P)
        with pytest.raises(VerificationError, match="FRI layer"):
            verify(data, vk, proof)

    def test_tampered_layer_path_rejected(self):
        data, vk, proof = self._proved()
        qp = proof.fri_proof.query_proofs[0]
        qp.layer_paths[0][0] = (qp.layer_paths[0][0] + np.uint64(1)) % np.uint64(P)
        with pytest.raises(VerificationError, match="merkle path"):
            verify(data, vk, proof)

    def test_tampered_final_poly_rejected(self):
        data, vk, proof = self._proved()
        fp = proof.fri_proof
        fp.final_poly = fp.final_poly.copy()
        fp.final_poly[0, 0] = (int(fp.final_poly[0, 0]) + 1) % P
        # the final poly is observed by the transcript, so tampering it
        # desynchronizes the query indices AND breaks the evaluation
        # check; either way the verifier must reject
        with pytest.raises(VerificationError):
            verify(data, vk, proof)

    def test_tampered_pow_witness_rejected(self):
        data, vk, proof = self._proved()
        proof.fri_proof.pow_witness += 1
        with pytest.raises(VerificationError):
            verify(data, vk, proof)


class TestWitnessOnly:
    def test_generator_order_and_values(self):
        b = CircuitBuilder(TEST_CONFIG)
        x = b.add_virtual_target()
        y = b.mul(x, x)
        z = b.add(y, x)
        data = b.build()
        w = data.new_witness()
        w.set(x, 3)
        w.generate()
        assert w.get(y) == 9
        assert w.get(z) == 12

    def test_conflicting_set_raises(self):
        b = CircuitBuilder(TEST_CONFIG)
        x = b.add_virtual_target()
        y = b.add_virtual_target()
        b.connect(x, y)
        data = b.build()
        w = data.new_witness()
        w.set(x, 1)
        with pytest.raises(ValueError):
            w.set(y, 2)
