"""Pallas TPU kernel: base-case NTT as an MXU matmul.

A length-k NTT (k <= 256) is a multiplication by the k x k DFT matrix
W[i,j] = w^(i*j) — on TPU that belongs on the MXU, not the VPU, and a
matmul formulation needs NO lane shuffles (Mosaic rejects the
perfect-shuffle reshapes a butterfly kernel needs — see ntt_pallas.py).

Exact 64-bit modular arithmetic on a bf16 systolic array, per tile in
VMEM:

  1. split x into 8 byte planes x_a (values 0..255 — exact in bf16),
     and W into 8 byte planes W_b, grouped as lo32 (b=0..3) and
     hi32 (b=4..7);
  2. ONE (8*tb, k) @ (k, 8k) bf16 dot with f32 accumulation:
     every partial sum <= 255*255*256 < 2^24, so f32 is EXACT;
  3. diagonal sums S_d = sum_{a+b=d} P[a,b] in int32 (exact, < 2^28);
  4. recombine  V = sum_d S_d * 2^(8d)  into 4 u32 limbs with carry
     chains (V < 2^110), reduce mod p with the shared _reduce128;
  5. result = V_lo + 2^32 * V_hi (mod p).

The DFT matrix is baked in NATURAL output order, so larger transforms
compose through the Bailey four-step recursion in ops/ntt.py with
transposes only — no bit-reversal gather anywhere on the TPU path.

Capability parity: the reference's [dep] plonky2_field FFT
(SURVEY.md §2b, §7 step 2); the MXU mapping is this framework's own.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import goldilocks as gl
from .. import host_field as hf

TILE_B = 32  # batch rows per grid program (VMEM: ~7 MB at k=256)
MAX_BASE = 1 << 8  # f32 exactness bound: 255*255*256 < 2^24
MIN_LOG = 2


@functools.lru_cache(maxsize=None)
def _dft_planes(log_k: int, inverse: bool):
    """bf16 byte-plane DFT matrix, natural output order.

    k >= 128: planes along COLUMNS, (k, 8k) — the kernel runs ONE dot
    and slices output at lane-tile-aligned k multiples.  k < 128:
    planes along ROWS, (8k, k) — per-plane dots with sublane-granular
    slicing only (lane slices below 128 are not Mosaic-safe)."""
    k = 1 << log_k
    w = gl.primitive_root_of_unity(log_k)
    if inverse:
        w = gl.h_inv(w)
    wp = hf.powers(w, k)
    ij = np.arange(k, dtype=np.int64)
    W = wp[(ij[:, None] * ij[None, :]) % k]  # (k, k) u64
    planes = [((W >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.float32) for b in range(8)]
    # host numpy only: jit traces call this and caching device arrays
    # created inside a trace would leak tracers (values <= 255 are
    # exact under the f32 -> bf16 conversion at the call site)
    axis = 1 if k >= 128 else 0
    return np.concatenate(planes, axis=axis)  # (k, 8k) or (8k, k) f32


def _add_at(r, q: int, val, top: int):
    """r[q] += val with carry propagation through limb `top` (u32 limbs)."""
    if q > top:
        return r
    s = r[q] + val
    carry = (s < val).astype(jnp.uint32)
    r = r[:q] + [s] + r[q + 1 :]
    nq = q + 1
    while nq <= top:
        s = r[nq] + carry
        carry = (s < carry).astype(jnp.uint32)
        r = r[:nq] + [s] + r[nq + 1 :]
        nq += 1
    return r


def _recombine(S):
    """[(tb,k) u32 S_d for d=0..10] -> value sum S_d 2^(8d) as 4 u32 limbs."""
    zero = jnp.zeros_like(S[0])
    r = [zero, zero, zero, zero]
    for d, sd in enumerate(S):
        sh = 8 * d
        q, rb = divmod(sh, 32)
        if rb == 0:
            r = _add_at(r, q, sd, 3)
        else:
            r = _add_at(r, q, sd << np.uint32(rb), 3)
            r = _add_at(r, q + 1, sd >> np.uint32(32 - rb), 3)
    return r


def _ntt_kernel(log_k: int, rhs_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    k = 1 << log_k
    lo = lo_ref[:, :]
    hi = hi_ref[:, :]
    tb = lo.shape[0]
    mask = np.uint32(0xFF)
    planes = [(lo >> np.uint32(8 * a)) & mask for a in range(4)] + [
        (hi >> np.uint32(8 * a)) & mask for a in range(4)
    ]
    # Mosaic has no direct u32 -> bf16 cast; hop through i32/f32 (exact:
    # plane values are <= 255)
    lhs = (
        jnp.concatenate(planes, axis=0)
        .astype(jnp.int32)
        .astype(jnp.float32)
        .astype(jnp.bfloat16)
    )  # (8tb, k)
    P = [[None] * 8 for _ in range(8)]
    if k >= 128:
        # one (8tb, k) @ (k, 8k) dot; output col slices are k-aligned
        acc = jax.lax.dot_general(
            lhs,
            rhs_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8tb, 8k), every entry an exact integer < 2^24
        acci = acc.astype(jnp.int32).astype(jnp.uint32)
        for a in range(8):
            for b in range(8):
                P[a][b] = acci[a * tb : (a + 1) * tb, b * k : (b + 1) * k]
    else:
        # one dot per W byte plane: slices stay sublane-granular
        for b in range(8):
            acc = jax.lax.dot_general(
                lhs,
                rhs_ref[b * k : (b + 1) * k, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8tb, k)
            for a in range(8):
                P[a][b] = acc[a * tb : (a + 1) * tb, :].astype(jnp.int32).astype(jnp.uint32)

    def diags(b_lo: int):
        S = []
        for d in range(11):
            acc_d = None
            for b in range(b_lo, b_lo + 4):
                a = d - (b - b_lo)
                if 0 <= a < 8:
                    acc_d = P[a][b] if acc_d is None else acc_d + P[a][b]
            S.append(acc_d if acc_d is not None else jnp.zeros((tb, k), jnp.uint32))
        return S

    v_lo = gl._reduce128(*_recombine(diags(0)))
    v_hi = gl._reduce128(*_recombine(diags(4)))
    # result = v_lo + 2^32 * v_hi (mod p)
    two32 = (jnp.zeros((tb, k), jnp.uint32), jnp.ones((tb, k), jnp.uint32))
    res = gl.add(v_lo, gl.mul(v_hi, two32))
    out_lo_ref[:, :] = res[0]
    out_hi_ref[:, :] = res[1]


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def ntt_base(lo, hi, inverse: bool = False, interpret: bool = False):
    """(B, k) u32 limb arrays -> NTT along the last axis, natural
    output order, via one MXU matmul per tile.  B must be a multiple
    of TILE_B; k a power of two in [2^MIN_LOG, MAX_BASE].  No inverse
    1/n scaling (callers compose it)."""
    b, k = lo.shape
    log_k = k.bit_length() - 1
    assert 1 << log_k == k and MIN_LOG <= log_k and k <= MAX_BASE, k
    assert b % TILE_B == 0, b
    rhs = jnp.asarray(_dft_planes(log_k, inverse), dtype=jnp.bfloat16)
    grid = (b // TILE_B,)
    rhs_block = (k, 8 * k) if k >= 128 else (8 * k, k)
    return pl.pallas_call(
        functools.partial(_ntt_kernel, log_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec(rhs_block, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.uint32),
            jax.ShapeDtypeStruct((b, k), jnp.uint32),
        ],
        interpret=interpret,
    )(rhs, lo, hi)


def tpu_ok() -> bool:
    import os

    if os.environ.get("ELP_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
