"""Distributed NTT: evaluation-domain points sharded across the mesh.

SURVEY.md §2c item 3 — "shard the evaluation domain across devices;
NTT butterfly stages exchanged all-to-all".  Uses the transpose
(four-step) formulation, the standard way to express a distributed
FFT's butterfly-stage exchange as dense collectives:

    view x (n,) as M[i2, i1] (n2 x n1 row-major);  X = NTT_n(x) is
      A[k2, i1] = NTT_{n2 over i2}(M)          local after a2a #1
      B[k2, i1] = A * w^(i1*k2)                local twiddle
      C[k2, k1] = NTT_{n1 over i1}(B)          local after a2a #2
      X[k1*n2 + k2] = C[k2, k1]                natural order via a2a #3

Each of the three exchanges is ONE jax.lax.all_to_all over the mesh
axis; every arithmetic op runs on the local shard with the
single-device kernels (ops/ntt.py), so results are bit-identical to
the unsharded NTT — asserted by tests/test_parallel.py.

The per-device work is n/D log n butterflies and the per-device
communication is 3 (n/D)-sized exchanges — the same compute/comm
ratio as the reference would get from a hand-written butterfly
exchange, but riding XLA's ICI collectives.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import goldilocks as gl
from ..ops import host_field as hf
from ..ops import ntt as nttm
from .mesh import AXIS


def _split_dims(n: int, d: int) -> tuple[int, int]:
    """n = n1 * n2 with n1, n2 powers of two, both divisible by d."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, (
        f"distributed NTT needs n >= D^2 (n={n}, D={d})"
    )
    return n1, n2


@functools.lru_cache(maxsize=None)
def _twiddle_u64(n: int, n1: int, n2: int, inverse: bool) -> np.ndarray:
    """T[i1, k2] = w^(i1*k2) as (n1, n2) u64 (w the primitive n-th root)."""
    w = gl.primitive_root_of_unity(n.bit_length() - 1)
    if inverse:
        w = gl.h_inv(w)
    rows = hf.powers(w, n1)  # w^i1
    out = np.empty((n1, n2), dtype=np.uint64)
    for i1 in range(n1):
        out[i1] = hf.powers(int(rows[i1]), n2)
    return out


def _a2a(x, split_axis, concat_axis):
    return jax.lax.all_to_all(x, AXIS, split_axis=split_axis, concat_axis=concat_axis, tiled=True)


def make_dist_ntt(mesh, n: int, inverse: bool = False):
    """Build a jitted distributed NTT over `mesh` for length-n inputs.

    Returns fn((lo, hi) block-sharded (n,)) -> (lo, hi) block-sharded
    (n,), equal to ops.ntt.ntt(f, inverse=inverse) in natural order.
    """
    d = mesh.devices.size
    n1, n2 = _split_dims(n, d)
    tw = gl.from_u64(_twiddle_u64(n, n1, n2, inverse))

    def local_fn(lo, hi, tw_lo, tw_hi):
        # local rows of M: (n2/D, n1)
        m = (lo.reshape(n2 // d, n1), hi.reshape(n2 // d, n1))
        # a2a #1: rows -> columns: (n2, n1/D)
        cols = (_a2a(m[0], 1, 0), _a2a(m[1], 1, 0))
        # inner NTT over i2: operate with i2 on the last axis
        at = (cols[0].T, cols[1].T)  # (n1/D, n2)
        a = nttm.ntt(at, inverse=inverse)  # A[i1_local, k2]
        # twiddle (local slice of T arrives as (n1/D, n2))
        b = gl.mul(a, (tw_lo, tw_hi))
        # a2a #2: columns -> rows of B^T layout: (n1, n2/D)
        rows = (_a2a(b[0], 1, 0), _a2a(b[1], 1, 0))
        # outer NTT over i1
        bt = (rows[0].T, rows[1].T)  # (n2/D, n1)
        c = nttm.ntt(bt, inverse=inverse)  # C[k2_local, k1]
        # a2a #3: natural order: device d gets X rows k1 in its block
        xcols = (_a2a(c[0], 1, 0), _a2a(c[1], 1, 0))  # (n2, n1/D) = C cols
        return (xcols[0].T.reshape(-1), xcols[1].T.reshape(-1))

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS), P(AXIS)),
        check_rep=False,
    )
    tw_sharded = (
        jax.device_put(tw[0], NamedSharding(mesh, P(AXIS, None))),
        jax.device_put(tw[1], NamedSharding(mesh, P(AXIS, None))),
    )

    @jax.jit
    def fn(f):
        return sharded(f[0], f[1], tw_sharded[0], tw_sharded[1])

    return fn


def make_dist_coset_lde(mesh, n: int, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GENERATOR):
    """Distributed coset LDE: coeffs (n,) block-sharded -> evals (n*2^rate,)
    block-sharded on the coset shift*H' (natural order), matching
    ops.ntt.coset_lde."""
    big_n = n << rate_bits
    ntt_big = make_dist_ntt(mesh, big_n, inverse=False)
    block = NamedSharding(mesh, P(AXIS))
    sh_dev = tuple(jax.device_put(a, block) for a in gl.from_u64(hf.powers(shift, n)))
    pad = block

    @jax.jit
    def fn(coeffs):
        scaled = gl.mul(coeffs, sh_dev)
        z = jax.numpy.zeros((big_n - n,), dtype=jax.numpy.uint32)
        padded = (
            jax.numpy.concatenate([scaled[0], z]),
            jax.numpy.concatenate([scaled[1], z]),
        )
        padded = jax.lax.with_sharding_constraint(padded, pad)
        return ntt_big(padded)

    return fn
