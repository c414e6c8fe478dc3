"""BLS12-381 G1 gadgets vs the host reference implementation
(the ec-aggregate beachhead of the reference's starky_bls12_381
capability, main.rs:172)."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gadgets_bls12_381 as g1
from eth_lc_plonky2_tpu.circuit import gadgets_biguint as bu
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover.debug import check_constraints

CFG = CircuitConfig(fri=FriConfig(proof_of_work_bits=4, num_query_rounds=2))

G = g1.G1_GEN


def test_host_reference_sanity():
    # the generator is on the curve; add/double stay on it
    for p in (G, g1.host_g1_double(G), g1.host_g1_add(G, g1.host_g1_double(G))):
        x, y = p
        assert (y * y - (x * x * x + 4)) % g1.Q == 0


def test_fq_mul_sub_add():
    b = CircuitBuilder(CFG)
    x = g1.add_virtual_fq(b)
    y = g1.add_virtual_fq(b)
    s = g1.fq_add(b, x, y)
    d = g1.fq_sub(b, x, y)
    m = g1.fq_mul(b, x, y)
    data = b.build()
    w = data.new_witness()
    xv = G[0]
    yv = G[1]
    g1.set_fq(w, x, xv)
    g1.set_fq(w, y, yv)
    w.generate()
    assert g1.fq_value(w, s) == (xv + yv) % g1.Q
    assert g1.fq_value(w, d) == (xv - yv) % g1.Q
    assert g1.fq_value(w, m) == (xv * yv) % g1.Q
    assert check_constraints(data, w.full_matrix()) == []


def test_g1_double_matches_host():
    b = CircuitBuilder(CFG)
    p = g1.add_virtual_g1(b)
    g1.assert_on_curve_g1(b, p)
    out = g1.g1_double(b, p)
    data = b.build()
    w = data.new_witness()
    g1.set_g1(w, p, G)
    w.generate()
    want = g1.host_g1_double(G)
    assert (g1.fq_value(w, out.x), g1.fq_value(w, out.y)) == want
    assert check_constraints(data, w.full_matrix()) == []


def test_g1_add_matches_host():
    b = CircuitBuilder(CFG)
    p1 = g1.add_virtual_g1(b)
    p2 = g1.add_virtual_g1(b)
    out = g1.g1_add_unequal(b, p1, p2)
    data = b.build()
    w = data.new_witness()
    twoG = g1.host_g1_double(G)
    g1.set_g1(w, p1, G)
    g1.set_g1(w, p2, twoG)
    w.generate()
    want = g1.host_g1_add(G, twoG)  # 3G
    assert (g1.fq_value(w, out.x), g1.fq_value(w, out.y)) == want
    assert check_constraints(data, w.full_matrix()) == []


def test_g1_add_wrong_result_rejected():
    b = CircuitBuilder(CFG)
    p1 = g1.add_virtual_g1(b)
    p2 = g1.add_virtual_g1(b)
    out = g1.g1_add_unequal(b, p1, p2)
    claimed = g1.add_virtual_g1(b)
    g1.fq_assert_equal(b, out.x, claimed.x)
    g1.fq_assert_equal(b, out.y, claimed.y)
    data = b.build()
    w = data.new_witness()
    twoG = g1.host_g1_double(G)
    g1.set_g1(w, p1, G)
    g1.set_g1(w, p2, twoG)
    wrong = g1.host_g1_add(G, twoG)
    g1.set_g1(w, claimed, (wrong[0], (wrong[1] + 1) % g1.Q))
    with pytest.raises(ValueError):  # witness copy-constraint conflict
        w.generate()
