"""BigUint gadget tests (witness-level + prove/verify), mirroring the
reference's utils.rs tests (is_equal, hash256 bridge — SURVEY.md §4)."""

import numpy as np
import pytest

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.circuit import gadgets_biguint as gb
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify

CFG = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=12))


def _run(b, data, w):
    w.generate()
    pd, vk = pr.preprocess(data)
    proof = pr.prove(pd, w)
    verify(data, vk, proof)
    return proof


class TestBigUint:
    def test_add(self):
        b = CircuitBuilder(CFG)
        x = gb.add_virtual_biguint_target(b, 2)
        y = gb.add_virtual_biguint_target(b, 2)
        s = gb.add_biguint(b, x, y)
        data = b.build()
        w = data.new_witness()
        xv, yv = 0xFFFF_FFFF_FFFF_FFFF, 0x1_0000_0001
        gb.set_biguint_target(w, x, xv)
        gb.set_biguint_target(w, y, yv)
        w.generate()
        assert gb.biguint_value(w, s) == xv + yv

    def test_mul(self):
        b = CircuitBuilder(CFG)
        x = gb.add_virtual_biguint_target(b, 2)
        y = gb.add_virtual_biguint_target(b, 2)
        p = gb.mul_biguint(b, x, y)
        data = b.build()
        w = data.new_witness()
        xv, yv = 0xDEADBEEF_CAFEBABE, 0x12345678_9ABCDEF0
        gb.set_biguint_target(w, x, xv)
        gb.set_biguint_target(w, y, yv)
        w.generate()
        assert gb.biguint_value(w, p) == xv * yv

    def test_cmp(self):
        b = CircuitBuilder(CFG)
        x = gb.add_virtual_biguint_target(b, 2)
        y = gb.add_virtual_biguint_target(b, 2)
        le = gb.cmp_biguint(b, x, y)
        b.register_public_input(le)
        data = b.build()
        for xv, yv, expect in [(5, 9, 1), (9, 5, 0), (7, 7, 1), (1 << 40, (1 << 40) - 1, 0)]:
            w = data.new_witness()
            gb.set_biguint_target(w, x, xv)
            gb.set_biguint_target(w, y, yv)
            w.generate()
            assert w.get(le) == expect, (xv, yv)

    def test_div_rem_by_period_proved(self):
        """slot / 8192 — the FindSyncCommittee arithmetic (targets.rs:184-235)."""
        b = CircuitBuilder(CFG)
        slot = gb.add_virtual_biguint_target(b, 2)
        period_const = gb.constant_biguint(b, 8192, 1)
        q, r = gb.div_rem_biguint(b, slot, period_const)
        b.register_public_input(q[0])
        b.register_public_input(r[0])
        data = b.build()
        w = data.new_witness()
        slot_v = 5188822  # attested slot from the period-633 fixture
        gb.set_biguint_target(w, slot, slot_v)
        proof = _run(b, data, w)
        assert int(proof.public_inputs[0]) == slot_v // 8192 == 633
        assert int(proof.public_inputs[1]) == slot_v % 8192

    def test_div_rem_forged_quotient_rejected(self):
        from eth_lc_plonky2_tpu.prover.verify import VerificationError

        b = CircuitBuilder(CFG)
        slot = gb.add_virtual_biguint_target(b, 2)
        period_const = gb.constant_biguint(b, 8192, 1)
        q, r = gb.div_rem_biguint(b, slot, period_const)
        data = b.build()
        w = data.new_witness()
        gb.set_biguint_target(w, slot, 5188822)
        w.generate()
        # forge the remainder upward by 8192 and quotient down by 1: this
        # keeps x = q*d + r true but violates r < d
        sid_q = int(data.rep[q[0].row * data.config.num_wires + q[0].col])
        sid_r = int(data.rep[r[0].row * data.config.num_wires + r[0].col])
        w.values[sid_q] = int(w.values[sid_q]) - 1
        w.values[sid_r] = int(w.values[sid_r]) + 8192
        pd, vk = pr.preprocess(data)
        proof = pr.prove(pd, w)
        with pytest.raises(VerificationError):
            verify(data, vk, proof)

    def test_is_equal(self):
        b = CircuitBuilder(CFG)
        x = gb.add_virtual_biguint_target(b, 8)
        y = gb.add_virtual_biguint_target(b, 8)
        eq = gb.is_equal_biguint(b, x, y)
        data = b.build()
        for xv, yv, expect in [(123, 123, 1), (123, 124, 0), (1 << 200, 1 << 200, 1), (1 << 200, (1 << 200) + (1 << 64), 0)]:
            w = data.new_witness()
            gb.set_biguint_target(w, x, xv)
            gb.set_biguint_target(w, y, yv)
            w.generate()
            assert w.get(eq) == expect

    def test_hash256_bridge(self):
        """slot=25000 vector from utils.rs test_biguint_hash256_connect_target."""
        from eth_lc_plonky2_tpu.circuit import gadgets_sha256 as gs

        b = CircuitBuilder(CFG)
        v = gb.add_virtual_biguint_target(b, 8)
        h = gs.add_virtual_hash256(b)
        gb.biguint_hash256_connect(b, v, h)
        data = b.build()
        w = data.new_witness()
        value = 25000
        gb.set_biguint_target(w, v, value)
        w.generate()
        # SSZ leaf: value as 32 LE bytes; hash words are BE u32 reads
        leaf = value.to_bytes(32, "little")
        words = np.frombuffer(leaf, dtype=">u4")
        got = [w.get(t) for t in h]
        assert got == [int(x) for x in words]
