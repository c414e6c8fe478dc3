"""Benchmark: end-to-end proves + kernel ops/s on one TPU chip.

Prints incremental JSON lines to stdout (one object per line, each a
superset of the previous); the LAST line is the complete record:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}

Primary metric: wall-clock of a steady-state prove of a SHA-256-heavy
circuit (the light-client workload shape: batched 68-row SHA segments,
184 wires) at 2^BENCH_LOG_ROWS rows.  vs_baseline normalizes by
constraint-row throughput against the reference's published number:
~2.98M constraints proven in ~300 s on a 32-vCPU host (BASELINE.md)
=> 9,933 rows/s.  vs_baseline > 1 means this prover's rows/s on one
chip beats the reference CPU prover's rows/s.

The primary JSON line is emitted the moment the prove is timed; kernel
counters (extra) stream in afterwards, so a timeout still captures the
headline number.  Phase timings go to stderr.

extra carries the BASELINE.md §north-star kernel counters:
  ntt_mpts_s            forward-NTT points/s (millions), 64x2^16 batch
  ntt_sol_frac          fraction of the VPU speed-of-light model
  poseidon_mhashes_s    Poseidon rate-8 hashes/s (millions), 2^19 batch
  poseidon_sol_frac     fraction of speed-of-light

Speed-of-light model (documented, not measured): one v5e core VPU
issues ~8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 u32
lane-ops/s.  A Goldilocks mul in u32 limbs costs ~60 lane-ops, an add
~12; an NTT butterfly ~84 (mul+add+sub); a Poseidon permutation
~68,000 (30 rounds of MDS-as-u16-parts + x^7 s-boxes + reduction).

Environment knobs:
  BENCH_LOG_ROWS     circuit size exponent (default 16)
  BENCH_SKIP_PROVES  =1: kernel counters only (no circuit build/prove)
  BENCH_FULL         =1: also run the round-1 arith toy prove
  BENCH_NO_CACHE     =1: ignore the on-disk built-circuit cache
  BENCH_BUDGET_S     total wall-clock budget (default 1500); phases
                     that cannot fit in the remaining budget are
                     skipped with a log line, so the record always
                     ends with the metrics that DID fit

Phase order is most-valuable-first so an external timeout still leaves
a maximal record: kernel counters (~30 s) -> cached full-512 flagship
prove -> SHA-proxy prove (cold build can cost 25+ min) -> toy.

The built bench circuit (tables + preprocess + witness) is cached in
.cache/bench/ via prover.serialize, so steady-state proving is reached
in minutes on a warm tree.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()


def log(msg: str):
    print(f"[bench +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


RESULT = {"metric": "pending", "value": None, "unit": "s", "vs_baseline": None, "extra": {}}


def emit():
    print(json.dumps(RESULT), flush=True)


import numpy as np
import jax
import jax.numpy as jnp

# Persistent-cache setup is owned by ops.backend (imported below): it
# enables the on-disk XLA cache on TPU and skips it on the CPU platform
# (where AOT entries from another machine load pathologically slowly).

from eth_lc_plonky2_tpu.circuit.builder import CircuitBuilder, Witness
from eth_lc_plonky2_tpu.circuit import gadgets_sha256 as gs
from eth_lc_plonky2_tpu.prover.config import CircuitConfig, FriConfig
from eth_lc_plonky2_tpu.prover import prove as pr
from eth_lc_plonky2_tpu.prover import serialize as ser
from eth_lc_plonky2_tpu.prover.verify import verify
from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.ops import ntt as nttm
from eth_lc_plonky2_tpu.ops import poseidon as pos

REFERENCE_ROWS_PER_S = 2_980_000 / 300.0  # BASELINE.md: 2.98M constraints / 300 s

# speed-of-light model constants (see module docstring)
VPU_U32_OPS_PER_S = 3.85e12
BUTTERFLY_U32_OPS = 84.0
POSEIDON_PERMUTE_U32_OPS = 68_000.0

CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "bench")


def build_sha_circuit(log_rows: int):
    """K two-to-one SHA-256 hashes (the LC workload shape), ~2^log_rows rows."""
    cfg = CircuitConfig(num_wires=184, fri=FriConfig(proof_of_work_bits=12, num_query_rounds=28))
    b = CircuitBuilder(cfg)
    # each pair costs 2 compressions x 68 rows + feed-forward adds
    k = max(1, ((1 << log_rows) - 64) * 10 // (2 * 68 * 11))
    pairs = [(gs.add_virtual_hash256(b), gs.add_virtual_hash256(b)) for _ in range(k)]
    digests = gs.two_to_one_sha256_batch(b, pairs)
    b.register_public_inputs(digests[0])
    return b, pairs


def build_toy_circuit(log_rows: int):
    """Arithmetic + range-check mix that fills ~2^log_rows rows (round-1 shape)."""
    cfg = CircuitConfig(fri=FriConfig(proof_of_work_bits=12, num_query_rounds=28))
    b = CircuitBuilder(cfg)
    target_rows = (1 << log_rows) - 8
    x = b.add_virtual_target()
    one = b.one()
    acc = x
    while len(b.rows) < target_rows:
        for _ in range(40):
            acc = b.mul_add(acc, one, x)
        b.split_le(acc, 32)
    b.register_public_input(acc)
    return b, x


def sha_prover_state(log_rows: int, use_cache: bool):
    """(data, pd, vk, witness) for the bench circuit, via the on-disk
    cache (tables + preprocess + generated witness) when possible."""
    key = ser.cache_key("bench_sha", log_rows)
    cdir = ser.cache_dir_for(CACHE_ROOT, key)
    wpath = os.path.join(cdir, "witness.npz")
    if use_cache and ser.has_cached_circuit(CACHE_ROOT, key) and os.path.exists(wpath):
        t0 = time.time()
        _, data, pd, vk = ser.load_circuit(cdir)
        z = np.load(wpath)
        w = Witness(data)
        w.values = z["values"]
        w.known = z["known"]
        log(f"sha circuit cache hit ({time.time() - t0:.1f}s)")
        return data, pd, vk, w

    t0 = time.time()
    b, pairs = build_sha_circuit(log_rows)
    data = b.build()
    log(f"sha circuit built ({time.time() - t0:.1f}s, 2^{data.log_n} rows)")
    t0 = time.time()
    w = data.new_witness()
    for i, (l, r) in enumerate(pairs):
        gs.set_hash256(w, l, bytes([(i + j) % 256 for j in range(32)]))
        gs.set_hash256(w, r, bytes([(i * 2 + j) % 256 for j in range(32)]))
    w.generate()
    log(f"witness generated ({time.time() - t0:.1f}s)")
    t0 = time.time()
    pd, vk = pr.preprocess(data)
    log(f"preprocess done ({time.time() - t0:.1f}s)")
    if use_cache:
        t0 = time.time()
        ser.save_circuit(cdir, data, pd, extras=None)
        np.savez_compressed(wpath, values=w.values, known=w.known)
        log(f"circuit cached ({time.time() - t0:.1f}s)")
    return data, pd, vk, w


def bench_sha_prove(log_rows: int, use_cache: bool):
    data, pd, vk, w = sha_prover_state(log_rows, use_cache)
    t0 = time.time()
    proof = pr.prove(pd, w)  # compile + warmup
    verify(data, vk, proof)
    warm = time.time() - t0
    log(f"warmup prove+verify ({warm:.1f}s)")
    RESULT["extra"]["sha_warm_prove_s"] = round(warm, 1)
    t0 = time.time()
    proof = pr.prove(pd, w)
    dt = time.time() - t0
    log(f"steady-state prove: {dt:.3f}s")
    verify(data, vk, proof)
    return data, dt


def bench_full512():
    """Steady-state prove of the cached full 512-committee circuit.

    Uses the circuit + preprocess + generated witness that a CLI run
    with --cache-dir .cache/cli left behind (the flagship workload —
    VERDICT r3 item 7: make the headline number driver-captured).
    Skipped silently when no cached flagship circuit exists.
    """
    import glob

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "cli")
    best = None
    for d in sorted(glob.glob(os.path.join(root, "circuit_*"))):
        if os.path.exists(os.path.join(d, "witness.npz")) and os.path.exists(
            os.path.join(d, "pre.npz")
        ):
            sz = os.path.getsize(os.path.join(d, "pre.npz"))
            if best is None or sz > best[1]:
                best = (d, sz)
    if best is None:
        log("full512: no cached flagship circuit with witness (.cache/cli) — skipping")
        return None
    t0 = time.time()
    _, data, pd, vk = ser.load_circuit(best[0])
    z = np.load(os.path.join(best[0], "witness.npz"))
    w = Witness(data)
    w.values = z["values"]
    w.known = z["known"]
    log(f"full512 cache load ({time.time() - t0:.1f}s): 2^{data.log_n} rows, "
        f"{data.num_rows_used} used")
    t0 = time.time()
    proof = pr.prove(pd, w)
    warm = time.time() - t0
    log(f"full512 warm-process prove ({warm:.1f}s; trace+lower+cached-compile tax)")
    extra = RESULT["extra"]
    extra["full512_warm_prove_s"] = round(warm, 1)
    t0 = time.time()
    verify(data, vk, proof)
    extra["full512_verify_s"] = round(time.time() - t0, 1)
    log(f"full512 verify ({extra['full512_verify_s']}s)")
    t0 = time.time()
    proof = pr.prove(pd, w)
    dt = time.time() - t0
    log(f"full512 steady-state prove: {dt:.3f}s")
    verify(data, vk, proof)
    extra["full512_prove_wall_s"] = round(dt, 3)
    extra["full512_rows_used"] = data.num_rows_used
    extra["full512_vs_baseline"] = round(300.0 / dt, 3)  # ref: ~300 s e2e (README.md:71)
    # the flagship IS the headline: same workload the reference's 300 s covers
    RESULT.update(metric="full512_prove_wall_s", value=extra["full512_prove_wall_s"],
                  unit="s", vs_baseline=extra["full512_vs_baseline"])
    return dt


def _sync(x):
    """Force device completion: block_until_ready does not reliably
    block under the axon async dispatch, so reduce + fetch one scalar."""
    return jax.device_get(jnp.sum(x.astype(jnp.uint64)))


def bench_ntt():
    batch, log_n = 64, 16
    n = 1 << log_n
    rng = np.random.default_rng(0)
    v = gl.from_u64(rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64))
    v = jax.tree_util.tree_map(jnp.asarray, v)  # device-resident input
    out = nttm.ntt(v)
    _sync(out[0])
    best = None
    for _ in range(3):
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = nttm.ntt(v)
        _sync(out[0])
        dt = (time.time() - t0) / reps
        best = dt if best is None else min(best, dt)
    pts_per_s = batch * n / best
    sol = VPU_U32_OPS_PER_S / (BUTTERFLY_U32_OPS * log_n / 2)  # pts/s at light speed
    return pts_per_s, pts_per_s / sol


def bench_poseidon():
    rows = 1 << 19
    rng = np.random.default_rng(1)
    v = gl.from_u64(rng.integers(0, gl.P, size=(rows, 8), dtype=np.uint64))
    v = jax.tree_util.tree_map(jnp.asarray, v)
    out = pos.hash_no_pad(v)
    _sync(out[0])
    best = None
    for _ in range(3):
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = pos.hash_no_pad(v)
        _sync(out[0])
        dt = (time.time() - t0) / reps
        best = dt if best is None else min(best, dt)
    hashes_per_s = rows / best  # one permutation per rate-8 hash
    sol = VPU_U32_OPS_PER_S / POSEIDON_PERMUTE_U32_OPS
    return hashes_per_s, hashes_per_s / sol


def main():
    log_rows = int(os.environ.get("BENCH_LOG_ROWS", "16"))
    skip_proves = os.environ.get("BENCH_SKIP_PROVES", "0") == "1"
    use_cache = os.environ.get("BENCH_NO_CACHE", "0") != "1"
    budget = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    log(f"start platform={jax.default_backend()} log_rows={log_rows} "
        f"skip_proves={skip_proves} cache={use_cache} budget={budget:.0f}s")

    def remaining():
        return budget - (time.time() - T0)

    # warm up the device<->host channel (first transfer pays one-time
    # tunnel setup, 250-570s worst case; see .claude/skills/verify/SKILL.md)
    t0 = time.time()
    jax.device_get(jnp.arange(4))
    log(f"first device->host transfer ({time.time() - t0:.1f}s)")

    extra = RESULT["extra"]

    # kernel counters FIRST (cheap: ~30-60 s incl. compiles) so the
    # driver captures a parsed record even if its budget expires during
    # the prove warmup (the tunnel stall alone can eat 5+ minutes)
    ntt_ps, ntt_frac = bench_ntt()
    extra["ntt_mpts_s"] = round(ntt_ps / 1e6, 1)
    extra["ntt_sol_frac"] = round(ntt_frac, 4)
    log(f"ntt: {extra['ntt_mpts_s']} Mpts/s ({100 * ntt_frac:.1f}% of SoL)")
    RESULT.update(metric="ntt_mpts_s", value=extra["ntt_mpts_s"],
                  unit="Mpts/s", vs_baseline=None)
    emit()
    pos_ps, pos_frac = bench_poseidon()
    extra["poseidon_mhashes_s"] = round(pos_ps / 1e6, 2)
    extra["poseidon_sol_frac"] = round(pos_frac, 4)
    log(f"poseidon: {extra['poseidon_mhashes_s']} Mhashes/s ({100 * pos_frac:.1f}% of SoL)")
    emit()

    full_dt = None
    if not skip_proves and os.environ.get("BENCH_FULL512", "1") != "0":
        # flagship FIRST: the cached full 512-committee circuit (skips
        # itself when no CLI run has populated .cache/cli yet).  This is
        # the number that answers the reference's 300 s headline, so it
        # must land before any cold build can eat the budget.
        full_dt = bench_full512()
        if full_dt is not None:
            emit()

    if not skip_proves:
        # SHA-proxy prove (LC workload shape).  A cold build+preprocess
        # costs 25+ min; only attempt it with enough budget left.
        cached = ser.has_cached_circuit(CACHE_ROOT, ser.cache_key("bench_sha", log_rows))
        # even with circuit+XLA caches warm, the warmup prove costs
        # ~100 s of cache loads; cold XLA compiles cost 25+ min
        need = 600 if cached else 1500
        if remaining() < need:
            log(f"sha proxy: skipped ({remaining():.0f}s left < {need}s needed, "
                f"cached={cached})")
        else:
            data, sha_dt = bench_sha_prove(log_rows, use_cache)
            rows_per_s = data.n / sha_dt
            extra = RESULT["extra"]
            extra[f"sha2^{data.log_n}_prove_wall_s"] = round(sha_dt, 3)
            extra[f"sha2^{data.log_n}_vs_baseline"] = round(
                rows_per_s / REFERENCE_ROWS_PER_S, 3)
            if full_dt is None:
                RESULT.update(
                    metric=f"sha2^{data.log_n}_prove_wall_s",
                    value=round(sha_dt, 3),
                    unit="s",
                    vs_baseline=round(rows_per_s / REFERENCE_ROWS_PER_S, 3),
                )
            emit()

    if os.environ.get("BENCH_FULL", "0") == "1" and not skip_proves:
        # secondary: round-1 arith toy shape (continuity with BENCH_r01)
        b2, x = build_toy_circuit(min(log_rows, 13))
        data2 = b2.build()
        pd2, vk2 = pr.preprocess(data2)
        w2 = data2.new_witness()
        w2.set(x, 1)
        w2.generate()
        proof2 = pr.prove(pd2, w2)
        verify(data2, vk2, proof2)
        t0 = time.time()
        proof2 = pr.prove(pd2, w2)
        extra["toy_prove_wall_s"] = round(time.time() - t0, 3)
        verify(data2, vk2, proof2)
        log(f"toy prove: {extra['toy_prove_wall_s']}s")
        emit()

    log(f"done (total {time.time() - T0:.1f}s)")


if __name__ == "__main__":
    main()
