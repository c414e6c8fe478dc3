"""Constraint-debugger sanity: pinpoints violated constraints on H."""

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover.debug import check_constraints

CFG = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=8))


def test_clean_circuit_no_violations():
    b = CircuitBuilder(CFG)
    x = b.add_virtual_target()
    y = b.mul(x, x)
    b.split_le(y, 32)
    b.register_public_input(y)
    data = b.build()
    w = data.new_witness()
    w.set(x, 7)
    w.generate()
    v = check_constraints(data, w.full_matrix(), [w.get(t) for t in data.public_input_targets])
    assert v == []


def test_unsatisfiable_range_check_detected():
    """split_le of an out-of-range value is reported with gate+rows."""
    b = CircuitBuilder(CFG)
    x = b.add_virtual_target()
    y = b.mul(x, x)
    b.split_le(y, 32)
    data = b.build()
    w = data.new_witness()
    w.set(x, 1 << 40)  # y = 2^80 mod p, not a u32
    w.generate()
    v = check_constraints(data, w.full_matrix())
    assert any(kind == "gate:basesum2" for kind, _, _ in v)
