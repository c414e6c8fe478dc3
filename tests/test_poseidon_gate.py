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


def test_scan_quotient_evaluator_matches_unrolled_eval():
    """absorb_poseidon_quotient (the jax path's scan-based constraint
    absorber — 30x smaller traced graph) is bit-identical to the
    generic unrolled eval() absorption, on random wires/selector/alpha
    inputs.  Runs the scan version in a jax-CPU subprocess (ELP_BACKEND
    is frozen at import); expected values come from this process's
    numpy backend."""
    import os
    import subprocess
    import sys
    import tempfile

    import numpy as np

    from eth_lc_plonky2_tpu.ops import goldilocks as gl
    from eth_lc_plonky2_tpu.circuit.gates_poseidon import PoseidonGate, NUM_WIRES_REQUIRED
    from eth_lc_plonky2_tpu.circuit.algebra import DeviceBaseAlgebra

    n_lde = 64
    rng = np.random.default_rng(1)
    wires_u = rng.integers(0, gl.P, size=(NUM_WIRES_REQUIRED, n_lde), dtype=np.uint64)
    wires = gl.from_u64(wires_u)
    sel_u = rng.integers(0, gl.P, size=(n_lde,), dtype=np.uint64)
    nch = 2
    ap_u = [rng.integers(0, gl.P, size=(130,), dtype=np.uint64) for _ in range(nch)]
    acc_u = [rng.integers(0, gl.P, size=(n_lde,), dtype=np.uint64) for _ in range(nch)]

    g = PoseidonGate()
    A = DeviceBaseAlgebra((n_lde,))
    sel = gl.from_u64(sel_u)
    cons = g.eval(A, lambda col, offset=0: (wires[0][col], wires[1][col]), lambda i: None)
    out = [gl.from_u64(a) for a in acc_u]
    for k, cval in enumerate(cons):
        sc = gl.mul(sel, cval)
        for j in range(nch):
            p = gl.from_u64(np.uint64(ap_u[j][k]))
            out[j] = gl.add(out[j], gl.mul(
                (np.broadcast_to(p[0], (n_lde,)), np.broadcast_to(p[1], (n_lde,))), sc))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "case.npz")
        np.savez(path, wires=wires_u, sel=sel_u, ap0=ap_u[0], ap1=ap_u[1],
                 acc0=acc_u[0], acc1=acc_u[1],
                 out0=np.asarray(gl.to_u64(out[0])), out1=np.asarray(gl.to_u64(out[1])))
        script = (
            "import numpy as np, jax, sys\n"
            "from eth_lc_plonky2_tpu.ops import goldilocks as gl\n"
            "from eth_lc_plonky2_tpu.circuit.gates_poseidon import absorb_poseidon_quotient\n"
            f"z = np.load({path!r})\n"
            "wires = gl.from_u64(z['wires']); sel = gl.from_u64(z['sel'])\n"
            "ap = [gl.from_u64(z['ap0']), gl.from_u64(z['ap1'])]\n"
            "accs = [gl.from_u64(z['acc0']), gl.from_u64(z['acc1'])]\n"
            "got = jax.jit(absorb_poseidon_quotient)(wires, sel, ap, accs)\n"
            "for j, key in enumerate(('out0', 'out1')):\n"
            "    assert np.array_equal(np.asarray(gl.to_u64(got[j])), z[key]), j\n"
            "print('SCAN_EQ_OK')\n"
        )
        env = dict(os.environ)
        env.update(ELP_BACKEND="jax", JAX_PLATFORMS="cpu", PYTHONPATH="",
                   PALLAS_AXON_POOL_IPS="")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        res = subprocess.run([sys.executable, "-c", script], cwd=repo, env=env,
                             capture_output=True, text=True, timeout=600)
        assert res.returncode == 0, f"{res.stdout}\n{res.stderr}"
        assert "SCAN_EQ_OK" in res.stdout
