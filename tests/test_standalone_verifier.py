"""The portable proof bundle (docs/proof_format.md) verifies under the
standalone second-implementation verifier (tools/verify_standalone.py
— pure stdlib, zero imports from this package), and tampered bundles
are rejected.  This is what backs the 'own proof system, own verifier'
compatibility scope with more than a self-check (VERDICT r3 item 8)."""

import copy
import importlib.util
import json
import os

import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit.gates_poseidon import add_poseidon_permutations
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover import serialize as ser
from eth_lc_plonky2_tpu.prover.verify import verify

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_standalone():
    spec = importlib.util.spec_from_file_location(
        "verify_standalone", os.path.join(_REPO, "tools", "verify_standalone.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    # a circuit touching several gate families incl. the Poseidon gate
    # (exercises large constraint DAG export)
    cfg = CircuitConfig(
        num_wires=142, fri=FriConfig(proof_of_work_bits=4, num_query_rounds=4)
    )
    b = CircuitBuilder(cfg)
    x = b.add_virtual_target()
    acc = x
    for _ in range(40):
        acc = b.mul_add(acc, x, x)
    bits = b.split_le(x, 32)  # x is small; acc is full-width
    state = [acc] + bits[:3] + [b.zero()] * 8
    out = add_poseidon_permutations(b, [state])[0]
    b.register_public_input(acc)
    b.register_public_input(out[0])
    data = b.build()
    pd, vk = pr.preprocess(data)
    w = data.new_witness()
    w.set(x, 5)
    w.generate()
    proof = pr.prove(pd, w)
    verify(data, vk, proof)

    path = str(tmp_path_factory.mktemp("bundle") / "proof_bundle.json")
    ser.export_proof_bundle(path, data, vk, proof)
    with open(path) as f:
        return json.load(f)


def test_standalone_accepts(bundle):
    vs = _load_standalone()
    assert vs.verify_bundle(bundle) is True


def test_standalone_rejects_tampered_public_input(bundle):
    vs = _load_standalone()
    bad = copy.deepcopy(bundle)
    v = int(bad["proof"]["public_inputs"][0], 16)
    bad["proof"]["public_inputs"][0] = hex((v + 1) % vs.P)
    with pytest.raises(vs.VerificationError):
        vs.verify_bundle(bad)


def test_standalone_rejects_tampered_cap(bundle):
    vs = _load_standalone()
    bad = copy.deepcopy(bundle)
    v = int(bad["proof"]["wires_cap"][0][0], 16)
    bad["proof"]["wires_cap"][0][0] = hex(v ^ 1)
    with pytest.raises(vs.VerificationError):
        vs.verify_bundle(bad)


def test_standalone_rejects_tampered_opening(bundle):
    vs = _load_standalone()
    bad = copy.deepcopy(bundle)
    key = sorted(bad["proof"]["openings"])[0]
    v = int(bad["proof"]["openings"][key][0][0], 16)
    bad["proof"]["openings"][key][0][0] = hex((v + 1) % vs.P)
    with pytest.raises(vs.VerificationError):
        vs.verify_bundle(bad)


def test_standalone_rejects_tampered_final_poly(bundle):
    vs = _load_standalone()
    bad = copy.deepcopy(bundle)
    v = int(bad["proof"]["fri"]["final_poly"][0][0], 16)
    bad["proof"]["fri"]["final_poly"][0][0] = hex((v + 1) % vs.P)
    with pytest.raises(vs.VerificationError):
        vs.verify_bundle(bad)
