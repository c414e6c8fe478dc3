"""Bit-exact tests for the u32-limb Goldilocks field vs Python ints.

Mirrors the role of plonky2_field's own test suite for the reference
([dep] layer L0, SURVEY.md §1): the device kernels must agree with
ground-truth big-int arithmetic on random and adversarial edge values.
"""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.ops import host_field as hf

P = gl.P

# Adversarial values around every carry/borrow/reduction boundary.
EDGE = [
    0,
    1,
    2,
    0xFFFF_FFFF,  # EPSILON
    0x1_0000_0000,  # 2^32
    0xFFFF_FFFE,
    0x1_0000_0001,
    P - 1,
    P - 2,
    P >> 1,
    (1 << 63),
    (1 << 63) - 1,
    0xFFFF_FFFF_0000_0000,  # p - 1
    0x7FFF_FFFF_8000_0000,
    0xFFFF_FFFE_FFFF_FFFF,
]
EDGE = [x % P for x in EDGE]


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 1 << 63, size=n, dtype=np.uint64) * 2 + rng.integers(0, 2, size=n, dtype=np.uint64)) % np.uint64(P)


def _pairs():
    """All edge x edge pairs plus random pairs."""
    e = np.array(EDGE, dtype=np.uint64)
    a = np.repeat(e, len(e))
    b = np.tile(e, len(e))
    ra = _rand(512, 1)
    rb = _rand(512, 2)
    return np.concatenate([a, ra]), np.concatenate([b, rb])


A_NP, B_NP = _pairs()
A_INT = [int(x) for x in A_NP]
B_INT = [int(x) for x in B_NP]


def _check(dev_out, expect_ints):
    got = gl.to_u64(dev_out)
    exp = np.array(expect_ints, dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)


class TestDeviceField:
    def test_roundtrip(self):
        f = gl.from_u64(A_NP)
        np.testing.assert_array_equal(gl.to_u64(f), A_NP)

    def test_add(self):
        _check(gl.add(gl.from_u64(A_NP), gl.from_u64(B_NP)), [(a + b) % P for a, b in zip(A_INT, B_INT)])

    def test_sub(self):
        _check(gl.sub(gl.from_u64(A_NP), gl.from_u64(B_NP)), [(a - b) % P for a, b in zip(A_INT, B_INT)])

    def test_neg(self):
        _check(gl.neg(gl.from_u64(A_NP)), [(-a) % P for a in A_INT])

    def test_mul(self):
        _check(gl.mul(gl.from_u64(A_NP), gl.from_u64(B_NP)), [(a * b) % P for a, b in zip(A_INT, B_INT)])

    def test_square(self):
        _check(gl.square(gl.from_u64(A_NP)), [(a * a) % P for a in A_INT])

    def test_pow_const(self):
        e = 0xDEADBEEF12345
        a = gl.from_u64(A_NP[:64])
        _check(gl.pow_const(a, e), [pow(a_, e, P) for a_ in A_INT[:64]])

    def test_inv(self):
        nz = A_NP[A_NP != 0][:128]
        got = gl.to_u64(gl.inv(gl.from_u64(nz)))
        exp = np.array([pow(int(x), P - 2, P) for x in nz], dtype=np.uint64)
        np.testing.assert_array_equal(got, exp)

    def test_select_eq(self):
        a = gl.from_u64(A_NP[:16])
        b = gl.from_u64(B_NP[:16])
        assert bool(np.all(np.asarray(gl.eq(a, a))))
        sel = gl.select(np.asarray(gl.eq(a, b)), a, b)
        np.testing.assert_array_equal(gl.to_u64(sel), gl.to_u64(b))


class TestHostField:
    def test_add_sub_mul(self):
        np.testing.assert_array_equal(hf.add(A_NP, B_NP), np.array([(a + b) % P for a, b in zip(A_INT, B_INT)], dtype=np.uint64))
        np.testing.assert_array_equal(hf.sub(A_NP, B_NP), np.array([(a - b) % P for a, b in zip(A_INT, B_INT)], dtype=np.uint64))
        np.testing.assert_array_equal(hf.mul(A_NP, B_NP), np.array([(a * b) % P for a, b in zip(A_INT, B_INT)], dtype=np.uint64))

    def test_inv_batch_inv(self):
        nz = A_NP[A_NP != 0][:200]
        exp = np.array([pow(int(x), P - 2, P) for x in nz], dtype=np.uint64)
        np.testing.assert_array_equal(hf.inv(nz), exp)
        np.testing.assert_array_equal(hf.batch_inv(nz), exp)

    def test_powers(self):
        g = 7
        out = hf.powers(g, 100)
        exp = np.array([pow(g, i, P) for i in range(100)], dtype=np.uint64)
        np.testing.assert_array_equal(out, exp)


class TestRootsOfUnity:
    def test_primitive_roots(self):
        for k in [0, 1, 2, 5, 16, 32]:
            w = gl.primitive_root_of_unity(k)
            assert pow(w, 1 << k, P) == 1
            if k > 0:
                assert pow(w, 1 << (k - 1), P) != 1

    def test_two_adic_generator_consistency(self):
        # squaring the 2^k generator gives the 2^(k-1) generator
        for k in [32, 10, 3]:
            w = gl.primitive_root_of_unity(k)
            assert (w * w) % P == gl.primitive_root_of_unity(k - 1)
