"""Pallas TPU kernel: fused Poseidon sponge over column batches.

The XLA path pays one HBM round trip of the full (12, N) state per
scan step (~690 kernel launches for a wide leaf hash); this kernel
keeps the whole sponge — every absorb chunk and all 30 unrolled
rounds — in VMEM, so a batch of hashes costs ONE read of the input
matrix and ONE write of the digests.  This is the prover's
hottest kernel (Poseidon Merkle leaf/level hashing, SURVEY.md §3.4;
BASELINE.md asks for hashes/s/chip vs speed-of-light).

Layout: channel-first (L, N) input — exactly how committed LDEs are
stored, so leaf hashing needs no transpose at all.  Grid over N/TILE
column tiles; each program hashes TILE independent sponges.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import goldilocks as gl
from .. import poseidon as pos

TILE = 512


def _roll_rows(x, shift: int):
    """Roll along axis 0 (the 12-channel axis) by a static shift."""
    shift %= x.shape[0]
    if shift == 0:
        return x
    return jnp.concatenate([x[-shift:], x[:-shift]], axis=0)


def _mds_cf(state):
    """MDS on a channel-first (12, T) state via 16-bit part accumulation."""
    lo, hi = state
    m16 = np.uint32(0xFFFF)
    parts = (lo & m16, lo >> np.uint32(16), hi & m16, hi >> np.uint32(16))
    accs = [None] * 4
    for i, c in enumerate(pos.MDS_CIRC):
        cu = np.uint32(c)
        for j in range(4):
            term = _roll_rows(parts[j], -i) * cu
            accs[j] = term if accs[j] is None else accs[j] + term
    d8 = np.uint32(pos.MDS_DIAG[0])
    for j in range(4):
        # diag: only channel 0 gets + 8 * state[0] (avoid captured consts)
        row0 = accs[j][0:1] + parts[j][0:1] * d8
        accs[j] = jnp.concatenate([row0, accs[j][1:]], axis=0)
    s0, s1, s2, s3 = accs
    t_big = (s1 & m16) << np.uint32(16)
    new_lo = s0 + t_big
    c0 = (new_lo < t_big).astype(jnp.uint32)
    h1 = (s1 >> np.uint32(16)) + s2 + c0
    t_big2 = (s3 & m16) << np.uint32(16)
    new_hi = h1 + t_big2
    c1 = (new_hi < t_big2).astype(jnp.uint32)
    ovf = (s3 >> np.uint32(16)) + c1
    return gl._reduce128(new_lo, new_hi, ovf, jnp.zeros_like(ovf))


def _sbox(x):
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    return gl.mul(gl.square(x3), x)


def _permute_unrolled(state, rc_lo_ref, rc_hi_ref):
    """Full permutation on (12, T), all 30 rounds unrolled in-register."""
    half = pos.N_FULL_ROUNDS // 2

    def add_rc(s, r):
        rl = rc_lo_ref[r, :].reshape(12, 1)
        rh = rc_hi_ref[r, :].reshape(12, 1)
        return gl.add(s, (jnp.broadcast_to(rl, s[0].shape), jnp.broadcast_to(rh, s[1].shape)))

    r = 0
    for _ in range(half):
        state = _mds_cf(_sbox(add_rc(state, r)))
        r += 1
    for _ in range(pos.N_PARTIAL_ROUNDS):
        s = add_rc(state, r)
        s0 = _sbox((s[0][0:1], s[1][0:1]))
        s = (jnp.concatenate([s0[0], s[0][1:]], axis=0),
             jnp.concatenate([s0[1], s[1][1:]], axis=0))
        state = _mds_cf(s)
        r += 1
    for _ in range(half):
        state = _mds_cf(_sbox(add_rc(state, r)))
        r += 1
    return state


def _sponge_kernel(l_static: int, rc_lo_ref, rc_hi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    t = lo_ref.shape[1]
    state = (jnp.zeros((12, t), jnp.uint32), jnp.zeros((12, t), jnp.uint32))
    for start in range(0, l_static, pos.SPONGE_RATE):
        c = min(pos.SPONGE_RATE, l_static - start)
        slo = jnp.concatenate([lo_ref[start : start + c, :], state[0][c:]], axis=0)
        shi = jnp.concatenate([hi_ref[start : start + c, :], state[1][c:]], axis=0)
        state = _permute_unrolled((slo, shi), rc_lo_ref, rc_hi_ref)
    out_lo_ref[:, :] = state[0][:4]
    out_hi_ref[:, :] = state[1][:4]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sponge_columns(lo, hi, interpret: bool = False):
    """hash_no_pad of every COLUMN of an (L, N) matrix -> (4, N) digests.

    N must be a multiple of TILE (the caller guarantees this; prover
    domains are powers of two >= 2^9).
    """
    l, n = lo.shape
    assert n % TILE == 0, (l, n)
    grid = (n // TILE,)
    rc_lo, rc_hi = pos._device_constants()  # (30, 12) host numpy
    nr = rc_lo.shape[0]
    return pl.pallas_call(
        functools.partial(_sponge_kernel, l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nr, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nr, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((l, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, n), jnp.uint32),
            jax.ShapeDtypeStruct((4, n), jnp.uint32),
        ],
        interpret=interpret,
    )(jnp.asarray(rc_lo), jnp.asarray(rc_hi), lo, hi)


def hash_columns(matrix_cf, interpret: bool = False):
    """Field-pair (L, N) channel-first matrix -> (N, 4) digest rows."""
    dlo, dhi = sponge_columns(matrix_cf[0], matrix_cf[1], interpret=interpret)
    return (dlo.T, dhi.T)


def usable(n: int) -> bool:
    """Pallas path available for this batch size on this backend?"""
    import os

    if os.environ.get("ELP_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu" and n % TILE == 0
    except Exception:
        return False
