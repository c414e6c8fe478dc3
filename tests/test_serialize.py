"""Circuit/proof serialization + preprocess caching round trips
(SURVEY.md §5 checkpoint/resume; the reference declares
plonky2-circuit-serializer at eth-lc-plonky2/Cargo.toml:18)."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover import serialize as ser
from eth_lc_plonky2_tpu.prover.verify import verify, VerificationError

CFG = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12))


def _circuit():
    b = CircuitBuilder(CFG)
    x = b.add_virtual_target()
    acc = x
    for _ in range(50):
        acc = b.mul_add(acc, x, x)
    b.split_le(acc, 32)
    b.register_public_input(acc)
    return b, x


class TestSerialize:
    def test_circuit_cache_roundtrip(self, tmp_path):
        b, x = _circuit()
        data = b.build()
        pd, vk = pr.preprocess(data)
        d = str(tmp_path / "c")
        ser.save_circuit(d, data, pd, extras={"x": x})

        extras, data2, pd2, vk2 = ser.load_circuit(d)
        assert extras["x"] == x
        assert np.array_equal(vk2.pre_cap, vk.pre_cap)
        # prove with the LOADED circuit (generators survived pickling)
        w = data2.new_witness()
        w.set(extras["x"], 1)
        w.generate()
        proof = pr.prove(pd2, w)
        verify(data2, vk2, proof)
        # cross-check: the original verifier key accepts it too
        verify(data, vk, proof)

    def test_cache_key_distinguishes_configs(self):
        k1 = ser.cache_key("lc", 8, None, CFG)
        k2 = ser.cache_key("lc", 16, None, CFG)
        k3 = ser.cache_key(
            "lc", 8, None,
            CircuitConfig(fri=FriConfig(proof_of_work_bits=9, num_query_rounds=12)),
        )
        assert len({k1, k2, k3}) == 3

    def test_proof_roundtrip(self, tmp_path):
        b, x = _circuit()
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(x, 1)
        w.generate()
        proof = pr.prove(pd, w)
        path = str(tmp_path / "proof.pkl")
        ser.save_proof(path, proof)
        proof2 = ser.load_proof(path)
        verify(data, vk, proof2)
        # tampering the stored proof must still be caught after reload
        proof2.public_inputs = proof2.public_inputs.copy()
        proof2.public_inputs[0] += 1
        with pytest.raises(VerificationError):
            verify(data, vk, proof2)

    def test_proof_json_dict_roundtrip(self, tmp_path):
        """proof_to_dict/proof_from_dict (the non-executable encoding
        used by BLS artifacts and the portable bundle) preserve the
        proof exactly."""
        b, x = _circuit()
        data = b.build()
        pd, vk = pr.preprocess(data)
        w = data.new_witness()
        w.set(x, 1)
        w.generate()
        proof = pr.prove(pd, w)
        import json

        d = json.loads(json.dumps(ser.proof_to_dict(proof, include_indices=True)))
        proof2 = ser.proof_from_dict(d)
        verify(data, vk, proof2)
        assert np.array_equal(proof2.public_inputs, proof.public_inputs)
        assert proof2.fri_proof.query_indices == list(proof.fri_proof.query_indices)


def test_bls_artifact_roundtrip(tmp_path):
    """save/load_bls_artifacts: all three files are plain JSON
    (non-executable); the reloaded triple verifies + proves absorbable."""
    from eth_lc_plonky2_tpu.models import bls

    inner = bls.build_dummy_bls_circuit(2, fri=FriConfig(proof_of_work_bits=4, num_query_rounds=4))
    proof, vk = bls.prove_dummy_bls(
        inner, bytes(range(32)), bytes(range(96)),
        [bytes(range(48)), bytes(range(48, 96))], [1, 0],
    )
    d = str(tmp_path / "bls")
    bls.save_bls_artifacts(d, inner, proof, vk)
    import os

    assert sorted(os.listdir(d)) == ["circuit.json", "proof.json", "vk.json"]
    data2, proof2, vk2 = bls.load_bls_artifacts(d)
    assert np.array_equal(vk2.pre_cap, vk.pre_cap)
    assert np.array_equal(proof2.public_inputs, proof.public_inputs)
    from eth_lc_plonky2_tpu.prover.verify import verify as vfy

    vfy(data2, vk2, proof2)
