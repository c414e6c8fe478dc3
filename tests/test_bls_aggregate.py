"""In-circuit BLS12-381 aggregate-pubkey (models/bls_aggregate): the
`ec_aggregate_pk` half of the reference's BLS sub-prover
(starky_bls12_381, main.rs:172-176) rebuilt as an inner circuit.

Checks: host decompression against known vectors, the circuit's
aggregate against the host reference, compressed-byte/sign binding,
negative cases (off-curve y, flipped sign, wrong aggregate), and (in
ci_heavy) a full prove+verify and absorption into the app circuit.
"""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit import gadgets_bls12_381 as bls381
from eth_lc_plonky2_tpu.eth.synthetic import make_valid_pubkey
from eth_lc_plonky2_tpu.models import bls_aggregate as agg
from eth_lc_plonky2_tpu.prover.config import FriConfig
from eth_lc_plonky2_tpu.prover.debug import check_constraints

TEST_FRI = FriConfig(proof_of_work_bits=4, num_query_rounds=4)
SIZE = 2

RNG = np.random.default_rng(42)
PUBKEYS = [make_valid_pubkey(RNG) for _ in range(SIZE)]
SIGNING_ROOT = bytes(range(32))
SIGNATURE = bytes(range(96))


def test_decompress_roundtrip():
    for pk in PUBKEYS:
        x, y = agg.decompress_g1(pk)
        assert (y * y) % agg.Q == (x * x * x + 4) % agg.Q
        assert agg.compress_g1((x, y)) == pk


def test_decompress_generator():
    """The standard G1 generator's compressed form decompresses to the
    known affine coordinates."""
    comp = agg.compress_g1(bls381.G1_GEN)
    assert agg.decompress_g1(comp) == bls381.G1_GEN


def test_host_aggregate_matches_manual():
    got = agg.host_aggregate(PUBKEYS, [1, 1])
    p0 = agg.decompress_g1(PUBKEYS[0])
    p1 = agg.decompress_g1(PUBKEYS[1])
    assert got == bls381.host_g1_add(p0, p1)
    assert agg.host_aggregate(PUBKEYS, [1, 0]) == p0
    assert agg.host_aggregate(PUBKEYS, [0, 0]) is None


def _witness(bits, tamper=None):
    data = agg.build_aggregate_bls_circuit(SIZE, fri=TEST_FRI)
    w = data.new_witness()
    agg.set_aggregate_witness(data, w, SIGNING_ROOT, SIGNATURE, PUBKEYS, bits)
    if tamper:
        tamper(data, w)
    w.generate()
    return data, w


def test_aggregate_circuit_satisfied():
    data, w = _witness([1, 1])
    assert check_constraints(data, w.full_matrix()) == []
    # the constrained aggregate equals the host reference
    _, _, _, _, agg_t, _ = data._agg_inputs
    assert (
        bls381.fq_value(w, agg_t.x),
        bls381.fq_value(w, agg_t.y),
    ) == agg.host_aggregate(PUBKEYS, [1, 1])


def test_aggregate_circuit_partial_participation():
    data, w = _witness([0, 1])
    assert check_constraints(data, w.full_matrix()) == []
    _, _, _, _, agg_t, _ = data._agg_inputs
    assert (
        bls381.fq_value(w, agg_t.x),
        bls381.fq_value(w, agg_t.y),
    ) == agg.decompress_g1(PUBKEYS[1])


def test_wrong_aggregate_rejected():
    """Setting a different aggregate point conflicts: the unbinding
    constraint agg + T == acc pins the true sum."""
    wrong = agg.decompress_g1(PUBKEYS[0])  # != PK_0 + PK_1

    data = agg.build_aggregate_bls_circuit(SIZE, fri=TEST_FRI)
    w = data.new_witness()
    sr_t, sig_t, members, points, agg_t, _ = data._agg_inputs
    for t, byte in zip(sr_t, SIGNING_ROOT):
        w.set(t, byte)
    for t, byte in zip(sig_t, SIGNATURE):
        w.set(t, byte)
    for (pk_t, bit_t), pk, bit in zip(members, PUBKEYS, [1, 1]):
        for t, byte in zip(pk_t, pk):
            w.set(t, byte)
        w.set(bit_t, int(bit))
    for p_t, pk in zip(points, PUBKEYS):
        bls381.set_g1(w, p_t, agg.decompress_g1(bytes(pk)))
    bls381.set_g1(w, agg_t, wrong)
    with pytest.raises((ValueError, AssertionError)):
        w.generate()
        assert check_constraints(data, w.full_matrix()) == []


def test_flipped_sign_rejected():
    """Negating y (wrong sign flag vs y parity) must conflict."""

    def tamper(data, w):
        _, _, _, points, _, _ = data._agg_inputs
        x, y = agg.decompress_g1(PUBKEYS[0])
        # overwrite point 0 with the OTHER root -q-y — conflicts with
        # the sign constraint during generation or constraint check
        for t, limb in zip(
            points[0].y,
            [((agg.Q - y) >> (32 * i)) & 0xFFFFFFFF for i in range(12)],
        ):
            sid = w._sid(t)
            w.values[sid] = limb
            w.known[sid] = True

    data = agg.build_aggregate_bls_circuit(SIZE, fri=TEST_FRI)
    w = data.new_witness()
    sr_t, sig_t, members, points, agg_t, _ = data._agg_inputs
    for t, byte in zip(sr_t, SIGNING_ROOT):
        w.set(t, byte)
    for t, byte in zip(sig_t, SIGNATURE):
        w.set(t, byte)
    for (pk_t, bit_t), pk, bit in zip(members, PUBKEYS, [1, 1]):
        for t, byte in zip(pk_t, pk):
            w.set(t, byte)
        w.set(bit_t, int(bit))
    tamper(data, w)
    bls381.set_g1(w, points[1], agg.decompress_g1(PUBKEYS[1]))
    bls381.set_g1(w, agg_t, agg.host_aggregate(PUBKEYS, [1, 1]))
    try:
        w.generate()
    except ValueError:
        return  # conflict during generation — rejected
    assert len(check_constraints(data, w.full_matrix())) > 0


@pytest.mark.ci_heavy
def test_aggregate_circuit_proves_and_absorbs():
    """End-to-end: prove the aggregate inner circuit, then absorb it
    into the app circuit exactly like the dummy path (same digest
    convention) and satisfy the absorbing circuit."""
    from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
    from eth_lc_plonky2_tpu.eth.synthetic import make_synthetic_update_pair
    from eth_lc_plonky2_tpu.models import bls, lc_circuit as lc
    from eth_lc_plonky2_tpu.prover import prove as pr
    from eth_lc_plonky2_tpu.prover.config import CircuitConfig
    from eth_lc_plonky2_tpu.prover.verify import verify

    size = 4
    syn = make_synthetic_update_pair(size, seed=9, valid_pubkeys=True)
    kw = syn.witness_kwargs
    inner = agg.build_aggregate_bls_circuit(size, fri=TEST_FRI)
    proof, vk, _ = agg.prove_aggregate_bls(
        inner, kw["signing_root"], kw["signature"],
        kw["sync_committee_pubkeys"], kw["sync_committee_bits"],
    )

    b = CircuitBuilder(CircuitConfig(num_wires=184, fri=TEST_FRI))
    t = lc.add_virtual_proof_target(b, committee_size=size, threshold=syn.threshold)
    pt, vd = bls.absorb_bls_proof(b, t, inner, pin_vk=vk)
    data = b.build()
    w = data.new_witness()
    lc.set_proof_target(w, t, **kw)
    bls.set_bls_proof_target(w, pt, vd, proof, vk)
    w.generate()
    assert check_constraints(data, w.full_matrix()) == []
    pd, avk = pr.preprocess(data)
    p2 = pr.prove(pd, w)
    verify(data, avk, p2)
