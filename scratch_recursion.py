"""Scoping: build tiny inner proof, then the outer recursive verifier."""
import os, sys, time
os.environ.setdefault("ELP_BACKEND", "numpy")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify
from eth_lc_plonky2_tpu.circuit import recursion as rec

t0 = time.time()
# ---- inner circuit: tiny arithmetic chain ----
inner_cfg = CircuitConfig(fri=FriConfig(proof_of_work_bits=8, num_query_rounds=8))
b = CircuitBuilder(inner_cfg)
x = b.add_virtual_target()
acc = x
for _ in range(20):
    acc = b.mul_add(acc, x, x)
b.register_public_input(acc)
inner_data = b.build()
print("inner: log_n", inner_data.log_n, "gates", inner_data.gate_names)
pd, vk = pr.preprocess(inner_data)
w = inner_data.new_witness()
w.set(x, 3)
w.generate()
inner_proof = pr.prove(pd, w)
verify(inner_data, vk, inner_proof)
print(f"inner proof ok t={time.time()-t0:.1f}s")

# ---- outer circuit ----
t1 = time.time()
outer_cfg = CircuitConfig(
    num_wires=142, num_routed_wires=80,
    fri=FriConfig(proof_of_work_bits=8, num_query_rounds=8),
)
ob = CircuitBuilder(outer_cfg)
pt = rec.add_virtual_proof_with_pis(ob, inner_data)
vd = rec.add_virtual_verifier_data(ob, inner_data)
rec.verify_proof_circuit(ob, pt, vd, inner_data)
ob.register_public_inputs(pt.public_inputs)
print(f"outer rows: {len(ob.rows)} build-pre t={time.time()-t1:.1f}s")
outer_data = ob.build()
print("outer: log_n", outer_data.log_n, "gates", outer_data.gate_names,
      f"t={time.time()-t1:.1f}s")

t2 = time.time()
ow = outer_data.new_witness()
rec.set_proof_with_pis_target(ow, pt, inner_proof)
rec.set_verifier_data_target(ow, vd, vk)
ow.generate()
print(f"outer witness t={time.time()-t2:.1f}s")

t3 = time.time()
from eth_lc_plonky2_tpu.prover.debug import check_constraints
viol = check_constraints(outer_data, ow.full_matrix(),
                         [ow.get(t) for t in outer_data.public_input_targets])
print("violations:", viol[:3], f"t={time.time()-t3:.1f}s")

t4 = time.time()
opd, ovk = pr.preprocess(outer_data)
print(f"outer preprocess t={time.time()-t4:.1f}s")
t5 = time.time()
outer_proof = pr.prove(opd, ow)
print(f"outer prove t={time.time()-t5:.1f}s")
t6 = time.time()
verify(outer_data, ovk, outer_proof)
print(f"outer verify ok t={time.time()-t6:.1f}s")
assert [int(v) for v in outer_proof.public_inputs] == [int(v) for v in inner_proof.public_inputs]

# ---- tamper: flip a public input of the inner proof ----
import dataclasses as dc
bad = dc.replace(inner_proof, public_inputs=np.array(
    [(int(inner_proof.public_inputs[0]) + 1) % (2**64 - 2**32 + 1)], dtype=np.uint64))
ow2 = outer_data.new_witness()
rec.set_proof_with_pis_target(ow2, pt, bad)
rec.set_verifier_data_target(ow2, vd, vk)
ow2.generate()
viol2 = check_constraints(outer_data, ow2.full_matrix(),
                          [ow2.get(t) for t in outer_data.public_input_targets])
print("tampered violations:", len(viol2), viol2[:1])
