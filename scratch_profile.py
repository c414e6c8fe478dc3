"""Scratch: per-phase timing of prove() at BENCH_LOG_ROWS on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover import fri as frim
from eth_lc_plonky2_tpu.prover.verify import verify
from eth_lc_plonky2_tpu.ops import goldilocks as gl
from bench import build_toy_circuit

import eth_lc_plonky2_tpu.prover.transcript as tr

LOG = int(os.environ.get("BENCH_LOG_ROWS", "12"))

jax.device_get(jnp.arange(4))

t0 = time.time()
b, x, out = build_toy_circuit(LOG)
print(f"build_circuit: {time.time()-t0:.2f}s rows={len(b.rows)}")
t0 = time.time()
data = b.build()
print(f"build(): {time.time()-t0:.2f}s log_n={data.log_n}")
t0 = time.time()
pd, vk = pr.preprocess(data)
print(f"preprocess: {time.time()-t0:.2f}s")
t0 = time.time()
w = data.new_witness(); w.set(x, 1); w.generate()
print(f"witgen: {time.time()-t0:.2f}s")

# monkeypatch timers into prove phases
orig_commit = pr.commit_values
orig_commit_c = pr.commit_coeffs
orig_perm = pr.compute_permutation_polys
orig_eval = pr.eval_poly_ext
orig_fri = frim.fri_prove
orig_permute_host = None

times = {}
def timed(name, fn):
    def wrap(*a, **k):
        t = time.time()
        r = fn(*a, **k)
        jax.block_until_ready(jax.tree_util.tree_leaves(r.lde)[0]) if hasattr(r, 'lde') else None
        times[name] = times.get(name, 0.0) + (time.time() - t)
        return r
    return wrap
pr.commit_values = timed("commit_values", orig_commit)
pr.commit_coeffs = timed("commit_coeffs", orig_commit_c)
pr.compute_permutation_polys = timed("perm_polys", orig_perm)
pr.eval_poly_ext = timed("openings_eval", orig_eval)
frim.fri_prove = timed("fri_prove", orig_fri)

# count host poseidon permutations
import eth_lc_plonky2_tpu.ops.poseidon as pos
n_perm = [0]
orig_ph = pos.permute_host
def counting_ph(s):
    n_perm[0] += 1
    return orig_ph(s)
pos.permute_host = counting_ph
tr.pos.permute_host = counting_ph

for it in range(2):
    times.clear(); n_perm[0] = 0
    t0 = time.time()
    proof = pr.prove(pd, w)
    total = time.time() - t0
    print(f"--- prove iter {it}: total {total:.2f}s, host_permutes={n_perm[0]}")
    acc = 0
    for k, v in times.items():
        print(f"  {k}: {v:.3f}s")
        acc += v
    print(f"  (untimed remainder: {total-acc:.3f}s)")
t0 = time.time()
verify(data, vk, proof)
print(f"verify: {time.time()-t0:.2f}s")
