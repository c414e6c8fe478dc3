"""The prover pipeline (layer L3): witness -> proof.

Mirrors the reference's `CircuitData::prove` hot loop (SURVEY.md §3.4,
/root/reference/eth-lc-plonky2/src/main.rs:230):

  witness matrix -> per-column IFFT -> coset LDE (rate 2^3) ->
  Poseidon Merkle-cap commit -> permutation Z + partial products ->
  quotient polynomial (vectorized constraint eval over the LDE
  domain) -> openings at zeta -> batched FRI.

Jit discipline (TPU-first): each prover stage is ONE jitted program
per circuit shape; all proof-dependent scalars (Fiat-Shamir
challenges, zeta, public inputs) enter as traced arguments so a
circuit compiles once and proves many times with zero retracing.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.backend import xp as jnp, jit, associative_scan

from ..ops import goldilocks as gl
from ..ops import goldilocks_ext as ge
from ..ops import host_field as hf
from ..ops import ntt as nttm
from ..ops import poseidon as pos
from ..circuit.algebra import DeviceBaseAlgebra
from ..circuit.builder import CircuitData, Witness
from . import fri as frim
from .merkle import MerkleTree
from .transcript import Challenger

P = gl.P
SHIFT = gl.MULTIPLICATIVE_GENERATOR  # LDE coset shift g = 7


def scalar_f(v: int):
    """Host int -> field scalar (shape-() limb pair)."""
    return gl.from_u64(np.uint64(int(v) % P))


def scalars_f(vs) -> tuple:
    """Host int list -> field array of shape (len,)."""
    return gl.from_u64(np.array([int(v) % P for v in vs], dtype=np.uint64))


def _bcast(scalar, shape):
    return (jnp.broadcast_to(scalar[0], shape), jnp.broadcast_to(scalar[1], shape))


# ---------------------------------------------------------------------------
# Commitment batches
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CommitmentBatch:
    """A batch of polynomials committed together: one leaf per LDE point."""

    coeffs: tuple  # device field arrays (num_polys, n)
    lde: tuple  # device field arrays (num_polys, 8n)
    tree: MerkleTree

    @property
    def cap(self) -> np.ndarray:
        return self.tree.cap


@jit(static_argnames=("rate_bits", "cap_height", "from_coeffs"))
def _commit_core(vals, rate_bits: int, cap_height: int, from_coeffs: bool = False):
    """IFFT -> coset LDE -> leaf hash -> Merkle levels, one program."""
    if from_coeffs:
        coeffs = vals
    else:
        coeffs = nttm.intt(vals)
    lde = nttm.coset_lde(coeffs, rate_bits, SHIFT)
    leaves = (lde[0].T, lde[1].T)  # (8n, num_polys)
    digests = pos.hash_no_pad(leaves)
    levels = [digests]
    while levels[-1][0].shape[0] > (1 << cap_height):
        cur = levels[-1]
        nxt = pos.compress((cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
        levels.append(nxt)
    return coeffs, lde, leaves, levels


def _to_tree(leaves, levels, cap_height: int) -> MerkleTree:
    leaves_u64 = np.asarray(gl.to_u64(leaves))
    levels_u64 = [np.asarray(gl.to_u64(l)) for l in levels]
    return MerkleTree(leaves=leaves_u64, levels=levels_u64, cap_height=cap_height)


def commit_values(values_u64: np.ndarray, rate_bits: int, cap_height: int) -> CommitmentBatch:
    """values: (num_polys, n) u64 on the subgroup H (row i <-> omega^i)."""
    coeffs, lde, leaves, levels = _commit_core(
        gl.from_u64(values_u64), rate_bits, cap_height, from_coeffs=False
    )
    return CommitmentBatch(coeffs=coeffs, lde=lde, tree=_to_tree(leaves, levels, cap_height))


def commit_coeffs(coeffs, rate_bits: int, cap_height: int) -> CommitmentBatch:
    """coeffs: device field arrays (num_polys, n) in coefficient form."""
    coeffs, lde, leaves, levels = _commit_core(coeffs, rate_bits, cap_height, from_coeffs=True)
    return CommitmentBatch(coeffs=coeffs, lde=lde, tree=_to_tree(leaves, levels, cap_height))


# ---------------------------------------------------------------------------
# Preprocessed data (proving/verification key halves)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ProverData:
    data: CircuitData
    pre_values: np.ndarray  # (num_pre, n) selectors ++ constants ++ sigmas
    pre_batch: CommitmentBatch
    kernels: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class VerifierKey:
    """What the verifier needs besides the circuit description."""

    pre_cap: np.ndarray  # (2^cap_height, 4) u64


def preprocess(data: CircuitData) -> tuple[ProverData, VerifierKey]:
    pre = np.concatenate([
        data.selectors.astype(np.uint64),
        data.constants.astype(np.uint64),
        data.sigma.astype(np.uint64),
    ])
    batch = commit_values(pre, data.config.rate_bits, data.config.cap_height)
    return ProverData(data=data, pre_values=pre, pre_batch=batch), VerifierKey(pre_cap=batch.cap)


# ---------------------------------------------------------------------------
# Proof container
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OpeningSet:
    """Opened values: {(batch_tag, row_offset): (num_polys, 2) u64 ext pairs}."""

    values: dict


@dataclasses.dataclass
class Proof:
    public_inputs: np.ndarray  # (num_pis,) u64
    wires_cap: np.ndarray
    zs_cap: np.ndarray
    quotient_cap: np.ndarray
    openings: OpeningSet
    fri_proof: "frim.FriProof"


# ---------------------------------------------------------------------------
# Domain helpers
# ---------------------------------------------------------------------------


def _lde_domain_u64(log_n: int, rate_bits: int) -> np.ndarray:
    """x values of the LDE coset: g * w^i, i < 2^(log_n+rate_bits)."""
    n_lde = 1 << (log_n + rate_bits)
    w = gl.primitive_root_of_unity(log_n + rate_bits)
    return hf.mul(np.uint64(SHIFT), hf.powers(w, n_lde))


def _zh_on_lde(log_n: int, rate_bits: int) -> np.ndarray:
    """Z_H(x) = x^n - 1 on the LDE coset (pattern of period 2^rate_bits)."""
    n = 1 << log_n
    n_lde = n << rate_bits
    gn = pow(SHIFT, n, P)
    wn = pow(gl.primitive_root_of_unity(log_n + rate_bits), n, P)  # order 2^rate
    pat = np.array([(gn * pow(wn, i, P) - 1) % P for i in range(1 << rate_bits)], dtype=np.uint64)
    return np.tile(pat, n_lde >> rate_bits)


def wire_offsets_used(data: CircuitData) -> list[int]:
    offs = {0}
    for g in data.gates:
        offs.update(g.wire_offsets)
    return sorted(offs)


def _roll_lde(arr, offset: int, rate_bits: int):
    """Wire value at row r+offset, over the LDE domain (natural order)."""
    if offset == 0:
        return arr
    shift = offset << rate_bits
    return (jnp.roll(arr[0], -shift, axis=-1), jnp.roll(arr[1], -shift, axis=-1))


# ---------------------------------------------------------------------------
# Permutation argument
# ---------------------------------------------------------------------------


def compute_permutation_polys(pd: ProverData, wires_u64: np.ndarray, beta: int, gamma: int):
    """Z and partial products for one challenge set.

    Output rows: [Z, p_0, ..., p_{m-2}] each length n (u64 host).
    Chunk m covers routed columns [8m, 8m+8).
    """
    data = pd.data
    cfg = data.config
    n = data.n
    nr = cfg.num_routed_wires
    cs = cfg.permutation_chunk_size
    m = cfg.num_permutation_chunks
    omega_pows = hf.powers(gl.primitive_root_of_unity(data.log_n), n)
    w = wires_u64[:nr]  # (nr, n)
    beta64 = np.uint64(beta)
    gamma64 = np.uint64(gamma)
    ks = data.k_shifts[:nr]
    id_enc = hf.mul(ks[:, None], omega_pows[None, :])  # (nr, n)
    num = hf.add(hf.add(w, hf.mul(beta64, id_enc)), gamma64)
    den = hf.add(hf.add(w, hf.mul(beta64, data.sigma[:nr])), gamma64)
    num_chunk = np.empty((m, n), dtype=np.uint64)
    den_chunk = np.empty((m, n), dtype=np.uint64)
    for k in range(m):
        acc_n = num[k * cs]
        acc_d = den[k * cs]
        for c in range(1, cs):
            acc_n = hf.mul(acc_n, num[k * cs + c])
            acc_d = hf.mul(acc_d, den[k * cs + c])
        num_chunk[k] = acc_n
        den_chunk[k] = acc_d
    den_inv = np.asarray(gl.to_u64(gl.inv(gl.from_u64(den_chunk))))
    ratio_chunk = hf.mul(num_chunk, den_inv)  # (m, n)
    row_ratio = ratio_chunk[0]
    for k in range(1, m):
        row_ratio = hf.mul(row_ratio, ratio_chunk[k])
    z = np.ones(n, dtype=np.uint64)
    pref = associative_scan(lambda a, b: gl.mul(a, b), gl.from_u64(row_ratio), axis=0)
    pref_u = np.asarray(gl.to_u64(pref))
    z[1:] = pref_u[:-1]
    out = np.empty((m, n), dtype=np.uint64)  # [Z, p_0..p_{m-2}]
    out[0] = z
    acc = z
    for k in range(m - 1):
        acc = hf.mul(acc, ratio_chunk[k])
        out[k + 1] = acc
    return out


# ---------------------------------------------------------------------------
# Quotient kernel (one jitted program per circuit)
# ---------------------------------------------------------------------------


def _alpha_combine(terms, alpha_scalar):
    """sum alpha^i * terms[i] (Horner) with a traced scalar alpha."""
    acc = None
    for t in reversed(terms):
        if acc is None:
            acc = t
        else:
            acc = gl.add(gl.mul(acc, _bcast(alpha_scalar, acc[0].shape)), t)
    return acc


def make_quotient_kernel(pd: ProverData):
    data = pd.data
    cfg = data.config
    n = data.n
    rate = cfg.rate_bits
    n_lde = n << rate
    num_sel = len(data.gate_names)
    num_con = cfg.num_constants
    cs = cfg.permutation_chunk_size
    m = cfg.num_permutation_chunks
    num_pi = len(data.public_input_targets)

    # static per-circuit domain constants (host precomputed)
    x_u64 = _lde_domain_u64(data.log_n, rate)
    zh_u64 = _zh_on_lde(data.log_n, rate)
    zh_inv_u64 = np.asarray(gl.to_u64(gl.inv(gl.from_u64(zh_u64))))
    n_inv = gl.h_inv(n)
    omega = gl.primitive_root_of_unity(data.log_n)
    # L_0 and PI-row Lagrange evals over the LDE coset
    denom0 = hf.sub(x_u64, np.uint64(1))
    l0_u64 = hf.mul(
        hf.mul(zh_u64, np.asarray(gl.to_u64(gl.inv(gl.from_u64(denom0))))), np.uint64(n_inv)
    )
    lr_rows = []
    for (r, c) in data.public_input_targets:
        wr = pow(omega, r, P)
        denom = hf.sub(x_u64, np.uint64(wr))
        lr = hf.mul(
            hf.mul(zh_u64, np.asarray(gl.to_u64(gl.inv(gl.from_u64(denom))))),
            np.uint64((wr * n_inv) % P),
        )
        lr_rows.append(lr)
    lr_u64 = np.stack(lr_rows) if lr_rows else np.zeros((0, n_lde), dtype=np.uint64)

    A = DeviceBaseAlgebra((n_lde,))

    def kernel(wires_lde, zs_lde, pre_lde, pi_f, betas_f, gammas_f, alphas_f):
        def wires(col, offset=0):
            return _roll_lde((wires_lde[0][col], wires_lde[1][col]), offset, rate)

        def consts(i):
            return (pre_lde[0][num_sel + i], pre_lde[1][num_sel + i])

        def sel(i):
            return (pre_lde[0][i], pre_lde[1][i])

        def sigma_c(c):
            return (pre_lde[0][num_sel + num_con + c], pre_lde[1][num_sel + num_con + c])

        max_con = max((g.num_constraints for g in data.gates), default=0)
        gate_slots = [None] * max_con
        for gi, g in enumerate(data.gates):
            if g.num_constraints == 0:
                continue
            cons = g.eval(A, wires, consts)
            s = sel(gi)
            for k, cval in enumerate(cons):
                term = gl.mul(s, cval)
                gate_slots[k] = term if gate_slots[k] is None else gl.add(gate_slots[k], term)
        gate_slots = [t if t is not None else gl.zeros((n_lde,)) for t in gate_slots]

        x_dev = gl.from_u64(x_u64)
        l0 = gl.from_u64(l0_u64)
        pi_terms = []
        for k in range(num_pi):
            lr = (gl.from_u64(lr_u64[k])[0], gl.from_u64(lr_u64[k])[1])
            piv = ((pi_f[0][k], pi_f[1][k]))
            c = data.public_input_targets[k].col
            diff = gl.sub(wires(c), _bcast(piv, (n_lde,)))
            pi_terms.append(gl.mul(lr, diff))

        out = []
        for j in range(cfg.num_challenges):
            beta = _bcast((betas_f[0][j], betas_f[1][j]), (n_lde,))
            gamma = _bcast((gammas_f[0][j], gammas_f[1][j]), (n_lde,))
            z = (zs_lde[0][j * m], zs_lde[1][j * m])
            z_next = _roll_lde(z, 1, rate)
            partials = [(zs_lde[0][j * m + 1 + k], zs_lde[1][j * m + 1 + k]) for k in range(m - 1)]
            chain = [z] + partials + [z_next]
            ones = gl.ones((n_lde,))
            terms = [gl.mul(l0, gl.sub(z, ones))]
            for k in range(m):
                acc_n = None
                acc_d = None
                for c in range(k * cs, (k + 1) * cs):
                    wv = wires(c)
                    idv = gl.mul(gl.full((n_lde,), int(data.k_shifts[c])), x_dev)
                    nterm = gl.add(gl.add(wv, gl.mul(beta, idv)), gamma)
                    dterm = gl.add(gl.add(wv, gl.mul(beta, sigma_c(c))), gamma)
                    acc_n = nterm if acc_n is None else gl.mul(acc_n, nterm)
                    acc_d = dterm if acc_d is None else gl.mul(acc_d, dterm)
                terms.append(gl.sub(gl.mul(chain[k + 1], acc_d), gl.mul(chain[k], acc_n)))
            terms.extend(pi_terms)
            terms.extend(gate_slots)
            combined = _alpha_combine(terms, (alphas_f[0][j], alphas_f[1][j]))
            quotient = gl.mul(combined, gl.from_u64(zh_inv_u64))
            # split into 2^rate chunks of degree < n, coefficient form
            qc = nttm.coset_intt(quotient, 0, SHIFT)  # (8n,) coeffs
            out.append((qc[0].reshape(1 << rate, n), qc[1].reshape(1 << rate, n)))
        lo = jnp.concatenate([o[0] for o in out], axis=0)
        hi = jnp.concatenate([o[1] for o in out], axis=0)
        return (lo, hi)

    return jit(kernel)


def _get_kernel(pd: ProverData, name: str, factory):
    k = pd.kernels.get(name)
    if k is None:
        k = factory()
        pd.kernels[name] = k
    return k


# ---------------------------------------------------------------------------
# Openings
# ---------------------------------------------------------------------------


@jit
def _open_core(coeffs, zp_re, zp_im):
    """Evaluate base-coeff polys (batch, n) at ext point given its powers."""
    re = nttm.sum_field(gl.mul(coeffs, _bcast(zp_re, coeffs[0].shape)), axis=-1)
    im = nttm.sum_field(gl.mul(coeffs, _bcast(zp_im, coeffs[0].shape)), axis=-1)
    return re, im


def ext_powers_host(z_ext, n: int):
    """[1, z, ..., z^(n-1)] in GF(p^2) as two u64 arrays (host)."""
    re = np.empty(n, dtype=np.uint64)
    im = np.empty(n, dtype=np.uint64)
    cur = (1, 0)
    for i in range(n):
        re[i] = cur[0]
        im[i] = cur[1]
        cur = ge.h_mul(cur, z_ext)
    return re, im


def eval_poly_ext(coeffs, z_ext):
    """Evaluate base-coeff polynomials (batch, n) at host ext point z_ext."""
    n = coeffs[0].shape[-1]
    zr, zi = ext_powers_host(z_ext, n)
    re, im = _open_core(coeffs, gl.from_u64(zr), gl.from_u64(zi))
    return re, im


# ---------------------------------------------------------------------------
# Main prove
# ---------------------------------------------------------------------------


def prove(pd: ProverData, witness: Witness) -> Proof:
    data = pd.data
    cfg = data.config
    n = data.n
    rate = cfg.rate_bits
    cap_h = cfg.cap_height
    m = cfg.num_permutation_chunks

    # 0. witness matrix + public input values
    wires_u64 = witness.full_matrix()  # (num_wires, n)
    pi_values = np.array(
        [witness.get(t) for t in data.public_input_targets], dtype=np.uint64
    ).reshape(-1)

    ch = Challenger()
    ch.observe_cap(pd.pre_batch.cap)
    ch.observe_many([int(v) for v in pi_values])

    # 1. commit wires
    wires_batch = commit_values(wires_u64, rate, cap_h)
    ch.observe_cap(wires_batch.cap)

    # 2. permutation challenges + Z/partials
    betas, gammas = [], []
    for _ in range(cfg.num_challenges):
        betas.append(ch.challenge())
        gammas.append(ch.challenge())
    z_rows = [compute_permutation_polys(pd, wires_u64, betas[j], gammas[j]) for j in range(cfg.num_challenges)]
    zs_u64 = np.concatenate(z_rows)
    zs_batch = commit_values(zs_u64, rate, cap_h)
    ch.observe_cap(zs_batch.cap)

    # 3. quotient (single jitted program; challenges are traced args)
    alphas = [ch.challenge() for _ in range(cfg.num_challenges)]
    qk = _get_kernel(pd, "quotient", lambda: make_quotient_kernel(pd))
    chunk_coeffs = qk(
        wires_batch.lde,
        zs_batch.lde,
        pd.pre_batch.lde,
        scalars_f(pi_values),
        scalars_f(betas),
        scalars_f(gammas),
        scalars_f(alphas),
    )
    quotient_batch = commit_coeffs(chunk_coeffs, rate, cap_h)
    ch.observe_cap(quotient_batch.cap)

    # 4. opening point + openings
    zeta = ch.challenge_ext()
    omega = gl.primitive_root_of_unity(data.log_n)

    def point_at(offset: int):
        wo = pow(omega, offset % (1 << data.log_n), P)
        return ge.h_mul(zeta, (wo, 0))

    openings = {}
    point_specs = opening_point_specs(data)
    batches = {"P": pd.pre_batch, "W": wires_batch, "Z": zs_batch, "Q": quotient_batch}
    for tag, offset in point_specs:
        z_ext = point_at(offset)
        re, im = eval_poly_ext(batches[tag].coeffs, z_ext)
        openings[(tag, offset)] = np.stack(
            [np.asarray(gl.to_u64(re)), np.asarray(gl.to_u64(im))], axis=1
        )

    for tag, offset in point_specs:
        for row in openings[(tag, offset)]:
            ch.observe(int(row[0]))
            ch.observe(int(row[1]))

    # 5. FRI on the combined opening polynomial
    fri_alpha = ch.challenge_ext()
    fri_proof = frim.fri_prove(pd, batches, openings, point_specs, zeta, fri_alpha, ch)

    return Proof(
        public_inputs=pi_values,
        wires_cap=wires_batch.cap,
        zs_cap=zs_batch.cap,
        quotient_cap=quotient_batch.cap,
        openings=OpeningSet(values=openings),
        fri_proof=fri_proof,
    )


def opening_point_specs(data: CircuitData) -> list[tuple[str, int]]:
    """Fixed order of (batch, row-offset) opening points."""
    specs = [("P", 0)]
    for off in wire_offsets_used(data):
        specs.append(("W", off))
    specs.append(("Z", 0))
    specs.append(("Z", 1))
    specs.append(("Q", 0))
    return specs
