"""NTT/LDE correctness vs naive host-side DFT ground truth."""

import numpy as np

from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.ops import host_field as hf
from eth_lc_plonky2_tpu.ops import ntt as nttm

P = gl.P


def naive_dft(coeffs, w, shift=1):
    """out[j] = sum_i c_i * (shift*w^j)^i — O(n^2) python ints."""
    n = len(coeffs)
    out = []
    for j in range(n):
        x = (shift * pow(w, j, P)) % P
        acc = 0
        xp = 1
        for c in coeffs:
            acc = (acc + c * xp) % P
            xp = (xp * x) % P
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def rand_poly(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, size=n, dtype=np.uint64)


class TestNTT:
    def test_forward_matches_naive(self):
        for log_n in [0, 1, 2, 4, 6]:
            n = 1 << log_n
            c = rand_poly(n, seed=log_n)
            w = gl.primitive_root_of_unity(log_n)
            expect = naive_dft([int(x) for x in c], w)
            got = gl.to_u64(nttm.ntt(gl.from_u64(c)))
            np.testing.assert_array_equal(got, expect)

    def test_roundtrip(self):
        for log_n in [1, 3, 8, 10]:
            n = 1 << log_n
            c = rand_poly(n, seed=100 + log_n)
            f = gl.from_u64(c)
            back = gl.to_u64(nttm.intt(nttm.ntt(f)))
            np.testing.assert_array_equal(back, c)

    def test_batched(self):
        n = 64
        batch = 5
        cs = np.stack([rand_poly(n, seed=i) for i in range(batch)])
        got = gl.to_u64(nttm.ntt(gl.from_u64(cs)))
        w = gl.primitive_root_of_unity(6)
        for i in range(batch):
            np.testing.assert_array_equal(got[i], naive_dft([int(x) for x in cs[i]], w))

    def test_coset_lde(self):
        log_n, rate = 4, 3
        n = 1 << log_n
        c = rand_poly(n, seed=7)
        big_w = gl.primitive_root_of_unity(log_n + rate)
        shift = gl.MULTIPLICATIVE_GENERATOR
        # naive: evaluate padded poly on shifted big domain
        expect = naive_dft([int(x) for x in c] + [0] * (n * 7), big_w, shift=shift)
        got = gl.to_u64(nttm.coset_lde(gl.from_u64(c), rate))
        np.testing.assert_array_equal(got, expect)

    def test_coset_intt_roundtrip(self):
        log_n = 6
        c = rand_poly(1 << log_n, seed=9)
        f = gl.from_u64(c)
        evals = nttm.coset_lde(f, 0)  # coset eval at rate 1
        back = gl.to_u64(nttm.coset_intt(evals, 0))
        np.testing.assert_array_equal(back, c)

    def test_eval_poly(self):
        n = 32
        c = rand_poly(n, seed=11)
        x = 0x1234_5678_9ABC_DEF0 % P
        expect = 0
        for i, ci in enumerate(reversed([int(v) for v in c])):
            expect = (expect * x + ci) % P
        got = gl.to_u64(nttm.eval_poly(gl.from_u64(c), gl.from_u64(np.uint64(x))))
        assert int(got) == expect

    def test_sum_field(self):
        v = rand_poly(33, seed=13)
        got = gl.to_u64(nttm.sum_field(gl.from_u64(v)))
        assert int(got) == sum(int(x) for x in v) % P


class TestExt:
    def test_mul_inv(self):
        from eth_lc_plonky2_tpu.ops import goldilocks_ext as ge

        rng = np.random.default_rng(3)
        a = (rng.integers(0, P, 16, dtype=np.uint64), rng.integers(0, P, 16, dtype=np.uint64))
        b = (rng.integers(0, P, 16, dtype=np.uint64), rng.integers(0, P, 16, dtype=np.uint64))
        x = ge.from_u64_pair(*a)
        y = ge.from_u64_pair(*b)
        got = ge.to_u64_pair(ge.mul(x, y))
        for i in range(16):
            exp = ge.h_mul((int(a[0][i]), int(a[1][i])), (int(b[0][i]), int(b[1][i])))
            assert (int(got[0][i]), int(got[1][i])) == exp
        # inverse
        xi = ge.inv(x)
        prod = ge.to_u64_pair(ge.mul(x, xi))
        assert np.all(prod[0] == 1) and np.all(prod[1] == 0)

    def test_pow_matches_host(self):
        from eth_lc_plonky2_tpu.ops import goldilocks_ext as ge

        a = ((123456789, 987654321),)
        x = ge.from_u64_pair(np.uint64(a[0][0]), np.uint64(a[0][1]))
        e = 0xBEEF
        got = ge.to_u64_pair(ge.pow_const(x, e))
        exp = ge.h_pow(a[0], e)
        assert (int(got[0]), int(got[1])) == exp
