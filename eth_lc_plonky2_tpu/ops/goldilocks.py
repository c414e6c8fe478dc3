"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as vectorized u32-limb ops.

TPU-native design: TPUs have no 64-bit integer vector units, so a field
element is a pair of uint32 limbs ``(lo, hi)`` (value = hi * 2^32 + lo),
and every operation is branchless u32 arithmetic that XLA vectorizes on
the VPU identically on CPU and TPU.  Multiplication decomposes the
32-bit limbs into 16-bit halves (16x16->32 products fit u32 exactly)
and reduces the 128-bit product with the Goldilocks identities

    2^64 ≡ 2^32 - 1   (mod p)
    2^96 ≡ -1          (mod p)

Elements are kept **canonical** (< p) at all times so that equality,
hashing, and serialization are plain limb comparisons.

Capability parity: replaces the reference's [dep] `plonky2_field`
Goldilocks arithmetic (used via `GenericConfig<D>::F` at
/root/reference/eth-lc-plonky2/src/main.rs:74-76); see SURVEY.md §2b.

A field array is the tuple ``(lo, hi)`` of equal-shaped jnp.uint32
arrays — a simple pytree that passes through jit/shard_map/pallas
unchanged.
"""

from __future__ import annotations

import numpy as np

from .backend import xp as jnp, jit, scan

# ----------------------------------------------------------------------------
# Constants
# ----------------------------------------------------------------------------

P = 0xFFFF_FFFF_0000_0001  # Goldilocks prime
P_LO = np.uint32(P & 0xFFFFFFFF)  # 0x00000001
P_HI = np.uint32(P >> 32)  # 0xFFFFFFFF
EPSILON = 0xFFFF_FFFF  # 2^64 mod p = 2^32 - 1
MULTIPLICATIVE_GENERATOR = 7  # generator of GF(p)^*
TWO_ADICITY = 32
# Quadratic extension GF(p^2) = GF(p)[X]/(X^2 - W)
EXT_W = 7

U32 = jnp.uint32
_ONE = np.uint32(1)
_ZERO = np.uint32(0)
_MASK16 = np.uint32(0xFFFF)
_UMAX = np.uint32(0xFFFFFFFF)

# ----------------------------------------------------------------------------
# Construction / conversion
# ----------------------------------------------------------------------------


def from_u64(x) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build a field array from a numpy uint64 array / int / list of ints."""
    a = np.asarray(x, dtype=np.uint64)
    lo = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (a >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi)


def to_u64(f) -> np.ndarray:
    """Convert a field array back to numpy uint64 (host)."""
    lo, hi = f
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def zeros(shape) -> tuple[jnp.ndarray, jnp.ndarray]:
    z = jnp.zeros(shape, dtype=U32)
    return z, z


def ones(shape) -> tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.ones(shape, dtype=U32), jnp.zeros(shape, dtype=U32)


def full(shape, value: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    value %= P
    lo = jnp.full(shape, np.uint32(value & 0xFFFFFFFF), dtype=U32)
    hi = jnp.full(shape, np.uint32(value >> 32), dtype=U32)
    return lo, hi


# ----------------------------------------------------------------------------
# 64-bit primitive ops on (lo, hi) u32 pairs (wrapping, branchless)
# ----------------------------------------------------------------------------


def _add64(al, ah, bl, bh):
    """(a + b) mod 2^64 with carry-out bit (as u32 0/1)."""
    lo = al + bl
    c0 = (lo < al).astype(U32)
    s1 = ah + bh
    c1 = (s1 < ah).astype(U32)
    hi = s1 + c0
    c2 = (hi < s1).astype(U32)
    return lo, hi, c1 | c2


def _sub64(al, ah, bl, bh):
    """(a - b) mod 2^64 with borrow-out bit (as u32 0/1)."""
    lo = al - bl
    b0 = (al < bl).astype(U32)
    d1 = ah - bh
    b1 = (ah < bh).astype(U32)
    hi = d1 - b0
    b2 = (d1 < b0).astype(U32)
    return lo, hi, b1 | b2


def _geq_p(lo, hi):
    """value >= p (boolean array). p = 0xFFFFFFFF_00000001."""
    return (hi == _UMAX) & (lo >= _ONE)


def _mul32(x, y):
    """Full 32x32 -> 64 product of u32 arrays, as (lo, hi) u32."""
    x0 = x & _MASK16
    x1 = x >> np.uint32(16)
    y0 = y & _MASK16
    y1 = y >> np.uint32(16)
    p00 = x0 * y0
    p01 = x0 * y1
    p10 = x1 * y0
    p11 = x1 * y1
    mid = p01 + p10
    mid_c = (mid < p01).astype(U32)
    lo = p00 + (mid << np.uint32(16))
    lo_c = (lo < p00).astype(U32)
    hi = p11 + (mid >> np.uint32(16)) + (mid_c << np.uint32(16)) + lo_c
    return lo, hi


# ----------------------------------------------------------------------------
# Field ops (inputs/outputs canonical, i.e. < p)
# ----------------------------------------------------------------------------


@jit
def add(a, b):
    """a + b mod p, canonical."""
    al, ah = a
    bl, bh = b
    lo, hi, c = _add64(al, ah, bl, bh)
    # If carry-out OR result >= p, subtract p once (sufficient since a+b < 2p).
    need = (c == _ONE) | _geq_p(lo, hi)
    sl, sh, _ = _sub64(lo, hi, jnp.broadcast_to(P_LO, lo.shape), jnp.broadcast_to(P_HI, hi.shape))
    return jnp.where(need, sl, lo), jnp.where(need, sh, hi)


@jit
def sub(a, b):
    """a - b mod p, canonical."""
    al, ah = a
    bl, bh = b
    lo, hi, brw = _sub64(al, ah, bl, bh)
    # On borrow, conceptual value is a-b+2^64; a-b+p = (a-b+2^64) - EPSILON.
    el = jnp.broadcast_to(np.uint32(EPSILON), lo.shape)
    sl, sh, _ = _sub64(lo, hi, el, jnp.zeros_like(hi))
    need = brw == _ONE
    return jnp.where(need, sl, lo), jnp.where(need, sh, hi)


@jit
def neg(a):
    """-a mod p, canonical."""
    al, ah = a
    pl = jnp.broadcast_to(P_LO, al.shape)
    ph = jnp.broadcast_to(P_HI, ah.shape)
    lo, hi, _ = _sub64(pl, ph, al, ah)
    is_zero = (al == _ZERO) & (ah == _ZERO)
    return jnp.where(is_zero, al, lo), jnp.where(is_zero, ah, hi)


def _reduce128(r0, r1, r2, r3):
    """Reduce a 128-bit value (four u32 limbs, little-endian) mod p, canonical.

    x = r3*2^96 + r2*2^64 + (r1:r0)
      ≡ (r1:r0) - r3 + r2*(2^32 - 1)      (mod p)
    """
    # t = lo64 - r3  (if borrow: t -= EPSILON; cannot double-borrow since
    # after wrapping, t >= 2^64 - 2^32 > EPSILON)
    tl, th, brw = _sub64(r0, r1, r3, jnp.zeros_like(r1))
    el = jnp.broadcast_to(np.uint32(EPSILON), tl.shape)
    t2l, t2h, _ = _sub64(tl, th, el, jnp.zeros_like(th))
    need = brw == _ONE
    tl = jnp.where(need, t2l, tl)
    th = jnp.where(need, t2h, th)
    # u = r2 * (2^32 - 1) = (r2 << 32) - r2  -> limbs (0 - r2 borrow, r2 - borrow)
    ul = _ZERO - r2
    uh = r2 - (r2 != _ZERO).astype(U32)
    # t + u, fold carry as +EPSILON, then canonicalize.
    lo, hi, c = _add64(tl, th, ul, uh)
    # carry means +2^64 ≡ +EPSILON: add EPSILON (cannot carry again because
    # a carry implies lo64 wrapped, so result < 2^64 - EPSILON... handle anyway)
    al2, ah2, c2 = _add64(lo, hi, el, jnp.zeros_like(hi))
    need_c = c == _ONE
    lo = jnp.where(need_c, al2, lo)
    hi = jnp.where(need_c, ah2, hi)
    # (second carry c2 is impossible for canonical inputs; asserted in tests)
    need_p = _geq_p(lo, hi)
    sl, sh, _ = _sub64(lo, hi, jnp.broadcast_to(P_LO, lo.shape), jnp.broadcast_to(P_HI, hi.shape))
    return jnp.where(need_p, sl, lo), jnp.where(need_p, sh, hi)


@jit
def mul(a, b):
    """a * b mod p, canonical."""
    al, ah = a
    bl, bh = b
    # 64x64 -> 128 via four 32x32 products.
    l00, h00 = _mul32(al, bl)
    l01, h01 = _mul32(al, bh)
    l10, h10 = _mul32(ah, bl)
    l11, h11 = _mul32(ah, bh)
    r0 = l00
    # r1 = h00 + l01 + l10 (collect carries into c_r1)
    s = h00 + l01
    c_a = (s < h00).astype(U32)
    r1 = s + l10
    c_b = (r1 < s).astype(U32)
    c_r1 = c_a + c_b
    # r2 = h01 + h10 + l11 + c_r1
    s2 = h01 + h10
    c_c = (s2 < h01).astype(U32)
    s3 = s2 + l11
    c_d = (s3 < s2).astype(U32)
    r2 = s3 + c_r1
    c_e = (r2 < s3).astype(U32)
    # r3 = h11 + carries
    r3 = h11 + c_c + c_d + c_e
    return _reduce128(r0, r1, r2, r3)


@jit
def square(a):
    return mul(a, a)


def mul_small(a, k: int):
    """a * k for a small constant k < 2^16 — ~3x cheaper than full mul.

    16-bit limb products keep every partial < 2^48; composed into a
    96-bit value (r0, r1, r2) and reduced once.
    """
    assert 0 <= k < (1 << 16)
    if k == 0:
        return zeros(a[0].shape)
    if k == 1:
        return a
    al, ah = a
    ku = np.uint32(k)
    m16 = _MASK16
    p0 = (al & m16) * ku  # < 2^32
    p1 = (al >> np.uint32(16)) * ku
    p2 = (ah & m16) * ku
    p3 = (ah >> np.uint32(16)) * ku
    # r0 = p0 + (p1 << 16); carry c0
    t = p1 << np.uint32(16)
    r0 = p0 + t
    c0 = (r0 < t).astype(U32)
    # r1 = (p1 >> 16) + p2 + (p3 << 16) + c0; collect carries
    t2 = p3 << np.uint32(16)
    s = (p1 >> np.uint32(16)) + p2  # < 2^33? p1>>16 < 2^16, p2 < 2^32 -> < 2^32+2^16 may wrap
    cs = (s < p2).astype(U32)
    r1 = s + t2
    c1 = (r1 < t2).astype(U32)
    r1 = r1 + c0
    c2 = (r1 < c0).astype(U32)
    r2 = (p3 >> np.uint32(16)) + cs + c1 + c2
    return _reduce128(r0, r1, r2, jnp.zeros_like(r2))


def _pow_bits(a, bits_lsb_first):
    """Square-and-multiply via lax.scan (small trace regardless of exponent)."""

    def body(carry, bit):
        result, base = carry
        with_mul = mul(result, base)
        result = select(bit == _ONE, with_mul, result)
        base = square(base)
        return (result, base), None

    init = (ones(a[0].shape), a)
    (result, _), _ = scan(body, init, bits_lsb_first)
    return result


def pow_const(a, e: int):
    """a ** e for a fixed Python-int exponent."""
    if e == 0:
        return ones(a[0].shape)
    bits = jnp.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=U32)
    return _pow_bits(a, bits)


@jit
def inv(a):
    """Multiplicative inverse via Fermat: a^(p-2). a must be nonzero."""
    e = P - 2
    bits = jnp.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=U32)
    return _pow_bits(a, bits)


def eq(a, b):
    """Elementwise equality (boolean array) — valid because canonical."""
    return (a[0] == b[0]) & (a[1] == b[1])


def select(cond, a, b):
    """Elementwise where(cond, a, b) for field arrays."""
    return jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])


# ----------------------------------------------------------------------------
# Host-side scalar helpers (Python ints; used for twiddles/params, not traced)
# ----------------------------------------------------------------------------


def h_mul(a: int, b: int) -> int:
    return (a * b) % P


def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_pow(a: int, e: int) -> int:
    return pow(a, e, P)


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


def primitive_root_of_unity(n_log: int) -> int:
    """Generator of the order-2^n_log subgroup of GF(p)^*."""
    assert 0 <= n_log <= TWO_ADICITY
    base = pow(MULTIPLICATIVE_GENERATOR, (P - 1) >> TWO_ADICITY, P)
    for _ in range(TWO_ADICITY - n_log):
        base = (base * base) % P
    return base
