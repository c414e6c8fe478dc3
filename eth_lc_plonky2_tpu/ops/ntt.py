"""Radix-2 NTT / inverse NTT / coset LDE over Goldilocks, vectorized.

TPU-first design: decimation-in-time with a single precomputed
bit-reversal gather followed by log2(n) fully-vectorized butterfly
stages expressed as reshapes + elementwise u32-limb field ops — no
data-dependent control flow, static shapes, everything fusible by XLA
(and later replaceable by a Pallas kernel stage-fuser).

Capability parity: the reference's [dep] plonky2_field FFT/IFFT/LDE
(rate 2^3 coset LDE driven from CircuitData::prove at
/root/reference/eth-lc-plonky2/src/main.rs:230; SURVEY.md §3.4).

Layout: polynomials live on the LAST axis; leading axes are batch
(e.g. wire columns).  All functions accept field arrays (lo, hi).
"""

from __future__ import annotations

import functools

import numpy as np

from .backend import xp as jnp, jit

from . import goldilocks as gl
from . import host_field as hf

P = gl.P


def _bit_reverse_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _plan(log_n: int, inverse: bool):
    """Precompute bit-reversal indices and per-stage twiddles.

    Returns host numpy arrays (never jnp): jit traces may call this, and
    caching device arrays created inside a trace would leak tracers.
    """
    bitrev = _bit_reverse_indices(log_n)
    stage_tw = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = gl.primitive_root_of_unity(s)
        if inverse:
            w_m = gl.h_inv(w_m)
        tw = hf.powers(w_m, m // 2)
        stage_tw.append(((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                         (tw >> np.uint64(32)).astype(np.uint32)))
    return bitrev, stage_tw


def _take_last(f, idx):
    return (jnp.take(f[0], idx, axis=-1), jnp.take(f[1], idx, axis=-1))


@jit(static_argnames=("inverse",))
def ntt(f, inverse: bool = False):
    """Forward (or inverse) NTT along the last axis; natural order in/out.

    Forward: out[j] = sum_i f[i] * w^(i*j),  w = primitive n-th root.
    Inverse additionally multiplies by n^{-1}.
    """
    n = f[0].shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT length must be a power of two"
    if n == 1:
        return f
    bitrev, stage_tw = _plan(log_n, inverse)
    a = _take_last(f, bitrev)
    batch_shape = a[0].shape[:-1]
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw = stage_tw[s - 1]
        # view as (..., n/m, 2, half)
        def rs(x):
            return x.reshape(batch_shape + (n // m, 2, half))
        al = rs(a[0]); ah = rs(a[1])
        u = (al[..., 0, :], ah[..., 0, :])
        v = (al[..., 1, :], ah[..., 1, :])
        tv = gl.mul(v, (jnp.broadcast_to(tw[0], u[0].shape), jnp.broadcast_to(tw[1], u[1].shape)))
        top = gl.add(u, tv)
        bot = gl.sub(u, tv)
        a = (jnp.stack([top[0], bot[0]], axis=-2).reshape(batch_shape + (n,)),
             jnp.stack([top[1], bot[1]], axis=-2).reshape(batch_shape + (n,)))
    if inverse:
        n_inv = gl.h_inv(n)
        a = gl.mul(a, gl.full(a[0].shape, n_inv))
    return a


def intt(f):
    return ntt(f, inverse=True)


@jit(static_argnames=("rate_bits", "shift"))
def coset_lde(coeffs, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GENERATOR):
    """Evaluate a degree-<n polynomial on the coset shift*H' of size n*2^rate_bits.

    Returns evaluations in natural order: out[j] = f(shift * W^j), W the
    primitive (n*2^rate_bits)-th root of unity.
    """
    n = coeffs[0].shape[-1]
    big_n = n << rate_bits
    # scale coefficients by shift^i
    sh = hf.powers(shift, n)
    sh_f = (jnp.asarray((sh & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((sh >> np.uint64(32)).astype(np.uint32)))
    scaled = gl.mul(coeffs, (jnp.broadcast_to(sh_f[0], coeffs[0].shape),
                             jnp.broadcast_to(sh_f[1], coeffs[1].shape)))
    pad = [(0, 0)] * (coeffs[0].ndim - 1) + [(0, big_n - n)]
    padded = (jnp.pad(scaled[0], pad), jnp.pad(scaled[1], pad))
    return ntt(padded)


@jit(static_argnames=("rate_bits", "shift"))
def coset_intt(evals, rate_bits: int, shift: int = gl.MULTIPLICATIVE_GENERATOR):
    """Inverse of coset_lde restricted to the first n coefficients.

    Given evaluations on shift*H (|H| = len evals), returns the unique
    polynomial of degree < |H| interpolating them (coefficient form).
    """
    n = evals[0].shape[-1]
    coeffs = ntt(evals, inverse=True)
    inv_sh = hf.powers(gl.h_inv(shift), n)
    ish = (jnp.asarray((inv_sh & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
           jnp.asarray((inv_sh >> np.uint64(32)).astype(np.uint32)))
    return gl.mul(coeffs, (jnp.broadcast_to(ish[0], coeffs[0].shape),
                           jnp.broadcast_to(ish[1], coeffs[1].shape)))


# ---------------------------------------------------------------------------
# Polynomial evaluation (verifier-side / opening helper)
# ---------------------------------------------------------------------------


def powers_device(x, n: int):
    """[1, x, ..., x^(n-1)] for a traced scalar field element x ((lo,hi) of shape ())."""
    one = gl.ones(())
    out = (jnp.stack([one[0], x[0]]), jnp.stack([one[1], x[1]]))
    if n == 1:
        return (out[0][:1], out[1][:1])
    while out[0].shape[0] < n:
        k = out[0].shape[0]
        take = min(k, n - k)
        last = (out[0][k - 1], out[1][k - 1])
        x1 = (out[0][1], out[1][1])
        factor = gl.mul(last, x1)  # x^k
        nxt = gl.mul((out[0][:take], out[1][:take]),
                     (jnp.broadcast_to(factor[0], (take,)), jnp.broadcast_to(factor[1], (take,))))
        out = (jnp.concatenate([out[0], nxt[0]]), jnp.concatenate([out[1], nxt[1]]))
    return (out[0][:n], out[1][:n])


def sum_field(f, axis: int = -1):
    """Field-sum reduction along an axis via pairwise tree reduction."""
    lo = jnp.moveaxis(f[0], axis, -1)
    hi = jnp.moveaxis(f[1], axis, -1)
    n = lo.shape[-1]
    while n > 1:
        if n % 2 == 1:
            pad = [(0, 0)] * (lo.ndim - 1) + [(0, 1)]
            lo = jnp.pad(lo, pad)
            hi = jnp.pad(hi, pad)
            n += 1
        a = (lo[..., 0::2], hi[..., 0::2])
        b = (lo[..., 1::2], hi[..., 1::2])
        lo, hi = gl.add(a, b)
        n = lo.shape[-1]
    return (lo[..., 0], hi[..., 0])


def prod_field(f, axis: int = -1):
    """Field-product reduction along an axis via pairwise tree reduction.

    Axis length must be a power of two (true for permutation chunks).
    """
    lo = jnp.moveaxis(f[0], axis, -1)
    hi = jnp.moveaxis(f[1], axis, -1)
    n = lo.shape[-1]
    assert n & (n - 1) == 0
    while n > 1:
        a = (lo[..., 0::2], hi[..., 0::2])
        b = (lo[..., 1::2], hi[..., 1::2])
        lo, hi = gl.mul(a, b)
        n = lo.shape[-1]
    return (lo[..., 0], hi[..., 0])


@jit
def eval_poly(coeffs, x):
    """Evaluate polynomial (coeffs on last axis) at scalar x, vectorized.

    Uses O(log n) vector ops: powers of x by log-doubling, then a
    field dot product.
    """
    n = coeffs[0].shape[-1]
    xp = powers_device(x, n)
    prod = gl.mul(coeffs, (jnp.broadcast_to(xp[0], coeffs[0].shape),
                           jnp.broadcast_to(xp[1], coeffs[1].shape)))
    return sum_field(prod, axis=-1)
