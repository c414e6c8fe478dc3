"""Quadratic extension GF(p^2) = GF(p)[X]/(X^2 - 7) over Goldilocks.

Soundness of Fiat-Shamir challenges needs ~100+ bits, so the opening
point zeta and the FRI folding challenges live in the degree-2
extension (capability parity with the reference's D=2 `GenericConfig`,
/root/reference/eth-lc-plonky2/src/main.rs:74-76).  The prover's hot
loops stay in the base field; extension ops only run on openings and
FRI layers.

An extension array is a pair ``(a, b)`` of base-field arrays (each a
(lo, hi) u32 tuple), representing a + b*phi with phi^2 = W = 7.
"""

from __future__ import annotations

from . import goldilocks as gl

W = gl.EXT_W  # 7


def from_base(a):
    """Embed a base-field array into the extension."""
    z = gl.zeros(a[0].shape)
    return (a, z)


def zeros(shape):
    return (gl.zeros(shape), gl.zeros(shape))


def ones(shape):
    return (gl.ones(shape), gl.zeros(shape))


def from_u64_pair(a0, a1):
    return (gl.from_u64(a0), gl.from_u64(a1))


def to_u64_pair(x):
    return gl.to_u64(x[0]), gl.to_u64(x[1])


def add(x, y):
    return (gl.add(x[0], y[0]), gl.add(x[1], y[1]))


def sub(x, y):
    return (gl.sub(x[0], y[0]), gl.sub(x[1], y[1]))


def neg(x):
    return (gl.neg(x[0]), gl.neg(x[1]))


def mul(x, y):
    """(a + b phi)(c + d phi) = (ac + W bd) + (ad + bc) phi."""
    a, b = x
    c, d = y
    ac = gl.mul(a, c)
    bd = gl.mul(b, d)
    ad = gl.mul(a, d)
    bc = gl.mul(b, c)
    w = gl.full(ac[0].shape, W)
    return (gl.add(ac, gl.mul(w, bd)), gl.add(ad, bc))


def mul_base(x, s):
    """Extension times base-field array."""
    return (gl.mul(x[0], s), gl.mul(x[1], s))


def square(x):
    return mul(x, x)


def inv(x):
    """1/(a + b phi) = (a - b phi) / (a^2 - W b^2)."""
    a, b = x
    w = gl.full(a[0].shape, W)
    norm = gl.sub(gl.square(a), gl.mul(w, gl.square(b)))
    ninv = gl.inv(norm)
    return (gl.mul(a, ninv), gl.mul(gl.neg(b), ninv))


def pow_const(x, e: int):
    result = ones(x[0][0].shape)
    base = x
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = square(base)
        e >>= 1
    return result


def eq(x, y):
    return gl.eq(x[0], y[0]) & gl.eq(x[1], y[1])


def powers_device(z, n: int):
    """[1, z, ..., z^(n-1)] for a traced ext scalar z = ((lo,hi),(lo,hi)) of shape ().

    Log-doubling (O(log n) vector ops) so openings at a traced zeta run
    fully on device — replaces the prover's former O(n) host loop of
    ext muls (round-1 hot spot).
    """
    from .backend import xp as jnp

    one_re, one_im = (gl.ones(()), gl.zeros(()))
    out = (
        (jnp.stack([one_re[0], z[0][0]]), jnp.stack([one_re[1], z[0][1]])),
        (jnp.stack([one_im[0], z[1][0]]), jnp.stack([one_im[1], z[1][1]])),
    )
    if n == 1:
        return ((out[0][0][:1], out[0][1][:1]), (out[1][0][:1], out[1][1][:1]))
    while out[0][0].shape[0] < n:
        k = out[0][0].shape[0]
        take = min(k, n - k)
        last = ((out[0][0][k - 1], out[0][1][k - 1]), (out[1][0][k - 1], out[1][1][k - 1]))
        z1 = ((out[0][0][1], out[0][1][1]), (out[1][0][1], out[1][1][1]))
        factor = mul(last, z1)  # z^k
        fac_b = (
            (jnp.broadcast_to(factor[0][0], (take,)), jnp.broadcast_to(factor[0][1], (take,))),
            (jnp.broadcast_to(factor[1][0], (take,)), jnp.broadcast_to(factor[1][1], (take,))),
        )
        blk = ((out[0][0][:take], out[0][1][:take]), (out[1][0][:take], out[1][1][:take]))
        nxt = mul(blk, fac_b)
        out = (
            (jnp.concatenate([out[0][0], nxt[0][0]]), jnp.concatenate([out[0][1], nxt[0][1]])),
            (jnp.concatenate([out[1][0], nxt[1][0]]), jnp.concatenate([out[1][1], nxt[1][1]])),
        )
    return (
        (out[0][0][:n], out[0][1][:n]),
        (out[1][0][:n], out[1][1][:n]),
    )


def select(cond, x, y):
    return (gl.select(cond, x[0], y[0]), gl.select(cond, x[1], y[1]))


# ---------------------------------------------------------------------------
# Host-side scalar helpers (pairs of python ints)
# ---------------------------------------------------------------------------

P = gl.P


def h_mul(x, y):
    a, b = x
    c, d = y
    return ((a * c + W * b * d) % P, (a * d + b * c) % P)


def h_add(x, y):
    return ((x[0] + y[0]) % P, (x[1] + y[1]) % P)


def h_sub(x, y):
    return ((x[0] - y[0]) % P, (x[1] - y[1]) % P)


def h_inv(x):
    a, b = x
    norm = (a * a - W * b * b) % P
    ninv = pow(norm, P - 2, P)
    return ((a * ninv) % P, (-b * ninv) % P)


def h_pow(x, e: int):
    result = (1, 0)
    base = x
    while e > 0:
        if e & 1:
            result = h_mul(result, base)
        base = h_mul(base, base)
        e >>= 1
    return result
