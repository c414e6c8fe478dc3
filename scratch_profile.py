"""Scratch: phase profile of the SHA-heavy prove on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["ELP_PROFILE"] = "1"
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from bench import build_sha_circuit
from eth_lc_plonky2_tpu.circuit import gadgets_sha256 as gs
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify

t0 = time.time()
jax.device_get(jnp.arange(4))
print("warmup", round(time.time() - t0, 1), flush=True)

# tunnel latency probe: tiny jit dispatch + sync, steady state
f = jax.jit(lambda x: x + 1)
x = jnp.arange(8)
jax.block_until_ready(f(x))
t0 = time.time()
for _ in range(20):
    jax.block_until_ready(f(x))
print("per dispatch+sync ms:", round((time.time() - t0) / 20 * 1000, 1), flush=True)

LOG = int(os.environ.get("BENCH_LOG_ROWS", "16"))
b, pairs = build_sha_circuit(LOG)
t0 = time.time()
data = b.build()
print("build", round(time.time() - t0, 1), "log_n", data.log_n, flush=True)
t0 = time.time()
pd, vk = pr.preprocess(data)
print("preprocess", round(time.time() - t0, 1), flush=True)
w = data.new_witness()
t0 = time.time()
for i, (l, r) in enumerate(pairs):
    gs.set_hash256(w, l, bytes([(i + j) % 256 for j in range(32)]))
    gs.set_hash256(w, r, bytes([(i * 2 + j) % 256 for j in range(32)]))
w.generate()
print("witgen", round(time.time() - t0, 1), flush=True)

for it in range(2):
    t0 = time.time()
    proof = pr.prove(pd, w)
    print(f"prove iter {it}: {round(time.time()-t0,2)}s", flush=True)
verify(data, vk, proof)
print("verified", flush=True)
