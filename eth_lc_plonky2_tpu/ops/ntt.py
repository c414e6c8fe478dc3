"""Radix-2 NTT / inverse NTT / coset LDE over Goldilocks, vectorized.

TPU-first design: a CONSTANT-GEOMETRY (Pease) decimation-in-frequency
formulation under lax.scan — every stage is the identical
static-shape program (split halves -> butterfly -> perfect-shuffle
interleave), so the traced graph is O(1) in log2(n) instead of O(log n)
Python-unrolled stages.  This matters twice on TPU: (a) jit
trace+lower+compile time stays flat as the domain grows to the 2^19
LDE of the full light-client circuit, and (b) XLA compiles ONE stage
body it can schedule well.  One bit-reversal gather at the end
restores natural order (scan path only — the TPU MXU path composes
natural-order base transforms through a Bailey four-step with
transposes, no gathers; see _ntt_nat_tpu).

Stage derivation: with subproblems kept interleaved, the stage-s
butterfly always pairs (x[i], x[i+n/2]) with twiddle
w^((i>>s)<<s) = w^(i & ~(2^s-1)); the output lands bit-reversed.
The per-stage twiddle is gathered on device from one length-n/2
power table with a mask that depends on the scan counter — the only
embedded constant is that table.

Capability parity: the reference's [dep] plonky2_field FFT/IFFT/LDE
(rate 2^3 coset LDE driven from CircuitData::prove at
/root/reference/eth-lc-plonky2/src/main.rs:230; SURVEY.md §3.4).

Layout: polynomials live on the LAST axis; leading axes are batch
(e.g. wire columns).  All functions accept field arrays (lo, hi).
"""

from __future__ import annotations

import functools

import numpy as np

from .backend import xp as jnp, jit, scan, USE_NUMPY

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
    """Precompute bit-reversal indices and the half-length power table.

    Returns host numpy arrays (never jnp): jit traces may call this, and
    caching device arrays created inside a trace would leak tracers.
    """
    bitrev = _bit_reverse_indices(log_n)
    w = gl.primitive_root_of_unity(log_n)
    if inverse:
        w = gl.h_inv(w)
    wp = hf.powers(w, max(1, 1 << (log_n - 1)))
    return bitrev, ((wp & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    (wp >> np.uint64(32)).astype(np.uint32))


def _take_last(f, idx):
    return (jnp.take(f[0], idx, axis=-1), jnp.take(f[1], idx, axis=-1))


def _mxu_mod():
    from .pallas import ntt_mxu

    return ntt_mxu


def _scale_inverse(a, n: int):
    return gl.mul(a, gl.full(a[0].shape, gl.h_inv(n)))


@functools.lru_cache(maxsize=None)
def _level_twiddles(log_n: int, log1: int, inverse: bool):
    """(n2, n1) four-step twiddle table T[i2, j1] = w^(i2 * j1),
    natural order on both axes (the sub-transforms emit natural)."""
    n1 = 1 << log1
    n2 = 1 << (log_n - log1)
    w = gl.primitive_root_of_unity(log_n)
    if inverse:
        w = gl.h_inv(w)
    wp = hf.powers(w, 1 << log_n)
    i2 = np.arange(n2, dtype=np.int64)[:, None]
    j1 = np.arange(n1, dtype=np.int64)[None, :]
    tw = wp[(i2 * j1) % (1 << log_n)]
    return ((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (tw >> np.uint64(32)).astype(np.uint32))


def _ntt_nat_tpu(f, log_k: int, inverse: bool):
    """(rows, 2^log_k) NTT along the last axis, NATURAL output order.

    Recursive Bailey four-step over the MXU matmul base kernel.  With
    i = i2 + n2*i1 and j = j1 + n1*j2:

      X[j1 + n1*j2] = sum_{i2} w^(i2*j1) [sum_{i1} x[i2 + n2*i1] w1^(i1*j1)]
                      * w2^(i2*j2)

    i.e. transform columns (length n1), twiddle by w^(i2*j1), transform
    rows (length n2), transpose.  Everything between base-kernel calls
    is transposes and one elementwise twiddle mul — no gathers, unlike
    the former self-sorting bitrev composition whose top-level
    natural-order gather dominated the whole transform's wall-clock.
    """
    mxu = _mxu_mod()
    b = f[0].shape[0]
    if log_k <= 8:
        pad = (-b) % mxu.TILE_B
        lo, hi = f
        if pad:
            lo = jnp.pad(lo, ((0, pad), (0, 0)))
            hi = jnp.pad(hi, ((0, pad), (0, 0)))
        olo, ohi = mxu.ntt_base(lo, hi, inverse)
        return (olo[:b], ohi[:b])
    log1 = (log_k + 1) // 2 if log_k <= 16 else 8
    log2 = log_k - log1
    n1, n2 = 1 << log1, 1 << log2
    tw_lo, tw_hi = _level_twiddles(log_k, log1, inverse)

    def cols(x):  # (b, n) -> (b*n2, n1): column view [i2, i1]
        return x.reshape(b, n1, n2).transpose(0, 2, 1).reshape(b * n2, n1)

    lo, hi = _ntt_nat_tpu((cols(f[0]), cols(f[1])), log1, inverse)  # [i2, j1]
    lo = lo.reshape(b, n2, n1)
    hi = hi.reshape(b, n2, n1)
    twl = jnp.broadcast_to(jnp.asarray(tw_lo)[None], (b, n2, n1))
    twh = jnp.broadcast_to(jnp.asarray(tw_hi)[None], (b, n2, n1))
    lo, hi = gl.mul((lo, hi), (twl, twh))
    lo = lo.transpose(0, 2, 1).reshape(b * n1, n2)  # rows [j1, i2]
    hi = hi.transpose(0, 2, 1).reshape(b * n1, n2)
    lo, hi = _ntt_nat_tpu((lo, hi), log2, inverse)  # [j1, j2]
    lo = lo.reshape(b, n1, n2).transpose(0, 2, 1).reshape(b, 1 << log_k)
    hi = hi.reshape(b, n1, n2).transpose(0, 2, 1).reshape(b, 1 << log_k)
    return (lo, hi)  # flat [j2, j1] = j1 + n1*j2 = natural j


@jit(static_argnames=("inverse",))
def ntt(f, inverse: bool = False):
    """Forward (or inverse) NTT along the last axis; natural order in/out.

    Forward: out[j] = sum_i f[i] * w^(i*j),  w = primitive n-th root.
    Inverse additionally multiplies by n^{-1}.

    On TPU, 2-D batches route to the MXU matmul kernel (directly for
    n <= 256, via the self-sorting four-step recursion above that);
    elsewhere the constant-geometry lax.scan path runs.
    """
    n = f[0].shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT length must be a power of two"
    if n == 1:
        return f
    if not USE_NUMPY and f[0].ndim == 2 and log_n >= 4 and _mxu_mod().tpu_ok():
        out = _ntt_nat_tpu(f, log_n, inverse)
        return _scale_inverse(out, n) if inverse else out
    bitrev, (wp_lo, wp_hi) = _plan(log_n, inverse)
    h = n // 2
    batch_shape = f[0].shape[:-1]
    iota = jnp.arange(h, dtype=jnp.uint32)
    wp_lo = jnp.asarray(wp_lo)
    wp_hi = jnp.asarray(wp_hi)

    def body(x, s):
        xl, xh = x
        u = (xl[..., :h], xh[..., :h])
        v = (xl[..., h:], xh[..., h:])
        # stage-s twiddle: w^(i & ~(2^s-1)), gathered from the power table
        mask = ~((jnp.uint32(1) << s) - jnp.uint32(1))
        idx = (iota & mask).astype(jnp.int32)
        tshape = u[0].shape
        tw = (jnp.broadcast_to(wp_lo[idx], tshape), jnp.broadcast_to(wp_hi[idx], tshape))
        a = gl.add(u, v)
        b = gl.mul(gl.sub(u, v), tw)
        # perfect shuffle: out[2i] = a[i], out[2i+1] = b[i]
        lo = jnp.stack([a[0], b[0]], axis=-1).reshape(batch_shape + (n,))
        hi = jnp.stack([a[1], b[1]], axis=-1).reshape(batch_shape + (n,))
        return (lo, hi), None

    stages = jnp.arange(log_n, dtype=jnp.uint32)
    a, _ = scan(body, f, stages)
    a = _take_last(a, bitrev)
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


def roll_lde(arr, offset: int, rate_bits: int):
    """Wire value at row r+offset over the LDE domain (natural order).

    THE shared next-row helper: the prover's quotient kernel, the
    gate-provided scan absorbers (gates_sha256/gates_poseidon), and
    their equivalence tests must all use this one definition — a
    sign-convention drift between private copies would silently
    diverge the jax backend from numpy (ADVICE r4)."""
    if offset == 0:
        return arr
    shift = offset << rate_bits
    return (jnp.roll(arr[0], -shift, axis=-1), jnp.roll(arr[1], -shift, axis=-1))


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
