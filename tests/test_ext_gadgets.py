"""In-circuit GF(p^2) gadgets vs the host extension arithmetic."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gadgets_ext as gx
from eth_lc_plonky2_tpu.ops import goldilocks_ext as ge
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify

CFG = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12))

X = (123456789123456789, 987654321987654321)
Y = (111111111111111, 22222222222222222)


def _run(build):
    b = CircuitBuilder(CFG)
    outs = build(b)
    b.register_public_inputs(outs)
    data = b.build()
    pd, vk = pr.preprocess(data)
    w = data.new_witness()
    w.generate()
    proof = pr.prove(pd, w)
    verify(data, vk, proof)
    return [int(v) for v in proof.public_inputs]


class TestExtGadgets:
    def test_mul_add_sub_div(self):
        def build(b):
            x = gx.ext_constant(b, X)
            y = gx.ext_constant(b, Y)
            m = gx.ext_mul(b, x, y)
            s = gx.ext_add(b, x, y)
            d = gx.ext_sub(b, x, y)
            q = gx.ext_div(b, x, y)
            return [m.re, m.im, s.re, s.im, d.re, d.im, q.re, q.im]

        got = _run(build)
        m = ge.h_mul(X, Y)
        s = ge.h_add(X, Y)
        d = ge.h_sub(X, Y)
        q = ge.h_mul(X, ge.h_inv(Y))
        assert got == [m[0], m[1], s[0], s[1], d[0], d[1], q[0], q[1]]

    def test_mul_const_and_exp_bits(self):
        def build(b):
            x = gx.ext_constant(b, X)
            mc = gx.ext_mul_const(b, x, Y)
            pows = gx.ext_pow2_chain(b, x, 3)  # x, x^2, x^4, x^8
            bits = [b.constant(1), b.constant(0), b.constant(1)]  # exponent 5
            e = gx.ext_exp_bits(b, pows[:3], bits)
            return [mc.re, mc.im, e.re, e.im]

        got = _run(build)
        mc = ge.h_mul(X, Y)
        e = ge.h_pow(X, 5)
        assert got == [mc[0], mc[1], e[0], e[1]]

    def test_random_access(self):
        def build(b):
            items = [b.constant(100 + i) for i in range(8)]
            bits = [b.constant(1), b.constant(0), b.constant(1)]  # index 5
            return [gx.random_access(b, bits, items)]

        assert _run(build) == [105]

    def test_split_64(self):
        v = 0xDEADBEEF12345678

        def build(b):
            x = b.constant(v)
            bits = gx.split_64(b, x)
            assert len(bits) == 64
            # recompose the low 16 bits as a sanity output
            acc = b.zero()
            for bit in reversed(bits[:16]):
                acc = b.arithmetic(2, 1, acc, b.one(), bit)
            return [acc]

        assert _run(build) == [v & 0xFFFF]
