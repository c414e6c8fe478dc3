"""Benchmark: end-to-end prove of a toy circuit on one TPU chip.

BASELINE.json config 3: "Goldilocks NTT/LDE + Poseidon FRI commit for a
2^N-row toy circuit, single chip".  Prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline normalizes by constraint-row throughput against the
reference's published number: ~2.98M constraints proven in ~300 s on a
32-vCPU host (BASELINE.md) => 9,933 rows/s.  vs_baseline > 1 means this
prover's rows/s on one chip beats the reference CPU prover's rows/s.

Environment knobs: BENCH_LOG_ROWS (default 12).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover.verify import verify

REFERENCE_ROWS_PER_S = 2_980_000 / 300.0  # BASELINE.md: 2.98M constraints / 300 s


def build_toy_circuit(log_rows: int):
    """Arithmetic + range-check mix that fills ~2^log_rows rows."""
    cfg = CircuitConfig(fri=FriConfig(proof_of_work_bits=12, num_query_rounds=28))
    b = CircuitBuilder(cfg)
    target_rows = (1 << log_rows) - 8
    x = b.add_virtual_target()
    one = b.one()
    acc = x
    # each arithmetic row = 20 ops; each basesum row = 2 range checks.
    # acc grows additively (acc += x with x=1 at witness time) so the
    # range checks stay satisfiable for any circuit size.
    while len(b.rows) < target_rows:
        for _ in range(40):
            acc = b.mul_add(acc, one, x)
        b.split_le(acc, 32)
    out = acc
    b.register_public_input(out)
    return b, x, out


def main():
    log_rows = int(os.environ.get("BENCH_LOG_ROWS", "12"))
    # warm up the device<->host channel (first transfer pays one-time
    # tunnel setup; see .claude/skills/verify/SKILL.md)
    jax.device_get(jnp.arange(4))

    b, x, out = build_toy_circuit(log_rows)
    data = b.build()
    pd, vk = pr.preprocess(data)
    w = data.new_witness()
    w.set(x, 1)
    w.generate()

    # first prove: compiles every kernel; second: steady state
    proof = pr.prove(pd, w)
    verify(data, vk, proof)
    t0 = time.time()
    proof = pr.prove(pd, w)
    dt = time.time() - t0
    verify(data, vk, proof)

    rows_per_s = data.n / dt
    print(
        json.dumps(
            {
                "metric": f"toy2^{data.log_n}_prove_wall_s",
                "value": round(dt, 3),
                "unit": "s",
                "vs_baseline": round(rows_per_s / REFERENCE_ROWS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
