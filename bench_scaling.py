"""Scaling-efficiency report: the sharded prover + distributed kernels
at 1/2/4/8 devices (BASELINE.md's 1-chip / N-device ask).

Runs on a virtual CPU mesh by default (the environment has one real
TPU chip; multi-chip runs use the same code over a real mesh).  Each
configuration is timed in its own subprocess so XLA sees exactly
N devices.  Emits a markdown table to stdout (redirect into
reports/scaling_rN.md) plus one JSON line per row to stderr.

Usage:
  python bench_scaling.py            # 1,2,4,8 virtual CPU devices
  SCALING_DEVICES=1,4 python bench_scaling.py
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import json, os, sys, time
import numpy as np
import jax

n_dev = int(os.environ["SCALING_N"])
assert len(jax.devices()) == n_dev, jax.devices()

from jax.sharding import NamedSharding, PartitionSpec as P
from eth_lc_plonky2_tpu.ops import goldilocks as gl, ntt as nttm
from eth_lc_plonky2_tpu.parallel import make_mesh
from eth_lc_plonky2_tpu.parallel.ntt import make_dist_ntt
from eth_lc_plonky2_tpu.parallel.prover import prove_sharded
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify
from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig

mesh = make_mesh(n_dev) if n_dev > 1 else None
rng = np.random.default_rng(7)
out = {"n_devices": n_dev}

# --- GSPMD sharded prove (the production path) ---
# NARROW 16-wire arithmetic-only config: the same shape family as the
# multichip-certification circuit (__graft_entry__), whose XLA:CPU
# compiles are known-fast on this 2-vCPU host.  The 96-wire
# basesum2-bearing toy hit a pathological multi-hour XLA:CPU compile
# (round-5; same compiler-pathology class as the round-4 runtime
# non-termination notes in prover/prove.py).
log_rows = int(os.environ.get("SCALING_LOG_ROWS", "12"))
cfg = CircuitConfig(
    num_wires=16, num_routed_wires=16, num_constants=2,
    permutation_chunk_size=2,
    fri=FriConfig(cap_height=4, proof_of_work_bits=8, num_query_rounds=12),
)
b = CircuitBuilder(cfg)
x = b.add_virtual_target()
acc = x
target_rows = (1 << log_rows) - 8
while len(b.rows) < target_rows:
    acc = b.mul_add(acc, x, x)
b.register_public_input(acc)
data = b.build()
pd, vk = pr.preprocess(data)
w = data.new_witness(); w.set(x, 1); w.generate()
print(f"[child n={n_dev}] built+preprocessed", file=sys.stderr, flush=True)

def timed_prove():
    if mesh is None:
        proof = pr.prove(pd, w)
    else:
        proof = prove_sharded(pd, w, mesh)
    return proof

proof = timed_prove()  # compile + warmup
print(f"[child n={n_dev}] warmup prove done", file=sys.stderr, flush=True)
t0 = time.time()
proof = timed_prove()
out["prove_s"] = round(time.time() - t0, 3)
verify(data, vk, proof)

print(f"[child n={n_dev}] prove={out['prove_s']}s", file=sys.stderr, flush=True)
# --- explicit distributed NTT (all_to_all stage exchange) ---
log_n = int(os.environ.get("SCALING_LOG_N", "16"))
n = 1 << log_n
vals = rng.integers(0, gl.P, size=(n,), dtype=np.uint64)
f = gl.from_u64(vals)
reps = 5
if mesh is None:
    ntt_fn = lambda a: nttm.ntt(a)
    f_in = f
else:
    ntt_fn = make_dist_ntt(mesh, n, False)
    f_in = tuple(jax.device_put(a, NamedSharding(mesh, P("x"))) for a in f)
r = ntt_fn(f_in); jax.block_until_ready(r)
t0 = time.time()
for _ in range(reps):
    r = ntt_fn(f_in)
jax.block_until_ready(r)
out["dist_ntt_ms"] = round((time.time() - t0) / reps * 1e3, 2)

print("SCALING_JSON " + json.dumps(out))
"""


def run_one(n: int) -> dict:
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
        SCALING_N=str(n),
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n}",
    )
    res = subprocess.run(
        [sys.executable, "-c", _CHILD], cwd=_REPO, env=env,
        text=True, timeout=3600, stdout=subprocess.PIPE,
    )
    if res.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{res.stdout}\n{res.stderr}")
    for line in res.stdout.splitlines():
        if line.startswith("SCALING_JSON "):
            return json.loads(line[len("SCALING_JSON "):])
    raise RuntimeError(f"no SCALING_JSON in output:\n{res.stdout}")


def main():
    devices = [int(d) for d in os.environ.get("SCALING_DEVICES", "1,2,4,8").split(",")]
    rows = []
    for n in devices:
        row = run_one(n)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    base = rows[0]
    log_n = int(os.environ.get("SCALING_LOG_N", "16"))
    print(f"| devices | prove (s) | prove speedup | efficiency | dist NTT 2^{log_n} (ms) | NTT speedup |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        sp = base["prove_s"] / r["prove_s"] if r["prove_s"] else float("nan")
        nsp = base["dist_ntt_ms"] / r["dist_ntt_ms"] if r["dist_ntt_ms"] else float("nan")
        eff = sp / (r["n_devices"] / base["n_devices"])
        print(f"| {r['n_devices']} | {r['prove_s']} | {sp:.2f}x | {eff:.0%} | {r['dist_ntt_ms']} | {nsp:.2f}x |")


if __name__ == "__main__":
    main()
