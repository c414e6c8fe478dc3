"""In-circuit Poseidon permutation gate + sponge gadgets (the recursion
layer's hash primitive; parity target: plonky2's PoseidonGate used by
the reference's recursive verifier, targets.rs:468-470)."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gates_poseidon as gp
from eth_lc_plonky2_tpu.ops import poseidon as pos
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify, VerificationError

CFG = CircuitConfig(
    num_wires=184, fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12)
)


class TestTrace:
    def test_trace_matches_host_permute(self):
        rng = np.random.default_rng(0)
        states = rng.integers(0, pos.P, size=(5, 12), dtype=np.uint64)
        adv, out = pos.permute_trace_np(states)
        assert adv.shape == (5, gp.NUM_ADVICE)
        for k in range(5):
            want = pos.permute_host([int(v) for v in states[k]])
            assert [int(v) for v in out[k]] == want


class TestPoseidonGate:
    def _prove(self, forge=None):
        b = CircuitBuilder(CFG)
        state_in = b.add_virtual_targets(12)
        out = gp.add_poseidon_permutations(b, [state_in])[0]
        # chain a second permutation to exercise routing between rows
        out2 = gp.add_poseidon_permutations(b, [out])[0]
        b.register_public_inputs(out2[:4])
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        vals = list(range(1, 13))
        for t, v in zip(state_in, vals):
            w.set(t, v)
        w.generate()
        if forge:
            forge(data, w)
        proof = pr.prove(pd, w)
        return data, vk, proof, vals

    def test_prove_verify_matches_host(self):
        data, vk, proof, vals = self._prove()
        want = pos.permute_host(pos.permute_host(vals))[:4]
        assert [int(v) for v in proof.public_inputs] == want
        verify(data, vk, proof)

    def test_forged_advice_rejected(self):
        def forge(data, w):
            # tamper one s-box output in the raw store
            row = next(r for r, g in enumerate(data.selectors[data.gate_names.index("poseidon")]) if g)
            sid = int(data.rep[row * data.config.num_wires + gp.W_ADV + 3])
            w.values[sid] = (int(w.values[sid]) + 1) % pos.P

        data, vk, proof, _ = self._prove(forge=forge)
        with pytest.raises(VerificationError):
            verify(data, vk, proof)


class TestSponge:
    def test_hash_no_pad_circuit(self):
        b = CircuitBuilder(CFG)
        inputs = b.add_virtual_targets(11)  # two chunks: 8 + 3
        digest = gp.hash_no_pad_circuit(b, inputs)
        b.register_public_inputs(digest)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        vals = [int(v) for v in range(21, 32)]
        for t, v in zip(inputs, vals):
            w.set(t, v)
        w.generate()
        proof = pr.prove(pd, w)
        assert [int(v) for v in proof.public_inputs] == pos.hash_no_pad_host(vals)
        verify(data, vk, proof)

    def test_compress_circuit(self):
        b = CircuitBuilder(CFG)
        left = b.add_virtual_targets(4)
        right = b.add_virtual_targets(4)
        digest = gp.compress_circuit(b, left, right)
        b.register_public_inputs(digest)
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        for t, v in zip(left, [1, 2, 3, 4]):
            w.set(t, v)
        for t, v in zip(right, [5, 6, 7, 8]):
            w.set(t, v)
        w.generate()
        proof = pr.prove(pd, w)
        assert [int(v) for v in proof.public_inputs] == pos.compress_host(
            [1, 2, 3, 4], [5, 6, 7, 8]
        )
        verify(data, vk, proof)
