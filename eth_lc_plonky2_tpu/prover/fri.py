"""Batched FRI: commit phase, proof-of-work grind, query proofs.

The low-degree argument of the stack (SURVEY.md §3.4: "FRI commit
phase (fold rounds, one Merkle commit per layer), PoW grind, 28 query
rounds").  Radix-2 folding over the extension field; the combined
opening polynomial

    G(x) = sum_j beta_j * (B_j(x) - y_j) / (x - z_j)

is evaluated on the whole LDE coset as ONE jitted program per circuit
(challenges enter as traced arguments; the per-point denominators are
inverted with a Montgomery pass across opening points so the whole
kernel pays ONE Fermat inversion), committed in pair-leaves
[G(j), G(j+N/2)], then folded with per-layer transcript challenges.

Device discipline: fold layers and their Merkle trees stay on device;
the host sees caps, the final polynomial, the PoW result, and one
batched gather of all query rows/paths.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.backend import xp as jnp, jit, device_get

from ..ops import goldilocks as gl
from ..ops import goldilocks_ext as ge
from ..ops import host_field as hf
from ..ops import ntt as nttm
from ..ops import poseidon as pos
from .merkle import MerkleTree, gather_rows_and_paths
from .transcript import Challenger

P = gl.P
SHIFT = gl.MULTIPLICATIVE_GENERATOR


@dataclasses.dataclass
class FriQueryProof:
    batch_leaves: dict  # tag -> (num_polys,) u64 leaf row
    batch_paths: dict  # tag -> list of (4,) digests
    layer_leaves: list  # per layer: (4,) u64 [re0, im0, re1, im1]
    layer_paths: list  # per layer: list of (4,) digests


@dataclasses.dataclass
class FriProof:
    layer_caps: list  # (2^cap,4) u64 per fold layer (incl. layer 0 = G itself)
    final_poly: np.ndarray  # (final_len, 2) u64 ext coefficients
    pow_witness: int
    query_indices: list
    query_proofs: list


def _bc(scalar, shape):
    return (jnp.broadcast_to(scalar[0], shape), jnp.broadcast_to(scalar[1], shape))


def _ext_mul(x, y):
    """Ext-array * ext-array (each a pair of (lo,hi) field arrays)."""
    ac = gl.mul(x[0], y[0])
    bd = gl.mul(x[1], y[1])
    ad = gl.mul(x[0], y[1])
    bc = gl.mul(x[1], y[0])
    w = gl.full(ac[0].shape, ge.W)
    return (gl.add(ac, gl.mul(w, bd)), gl.add(ad, bc))


def make_g_kernel(pd, counts: dict, num_specs: int, spec_tags: tuple):
    """G(x) over the LDE domain; all proof scalars are traced args."""
    data = pd.data
    cfg = data.config
    n_lde = data.n << cfg.rate_bits
    tags = ("P", "W", "Z", "Q")
    offsets_g = {}
    acc = 0
    for t in tags:
        offsets_g[t] = acc
        acc += counts[t]
    total = acc
    x_u64 = _lde_x(data.log_n, cfg.rate_bits)

    def _weighted_sum(lde, a):
        """sum_i a[i] * lde[i] over the poly axis, in row chunks so the
        full (num, n_lde) product (3 GB for the wires batch at 2^21)
        is never materialized."""
        num = lde[0].shape[0]
        chunk = max(c for c in range(1, 17) if num % c == 0)
        if num <= 16:
            prod = gl.mul((jnp.broadcast_to(a[0][:, None], lde[0].shape),
                           jnp.broadcast_to(a[1][:, None], lde[1].shape)), lde)
            return nttm.sum_field(prod, axis=0)
        from ..ops.backend import scan

        nl = lde[0].shape[1]
        xs = (lde[0].reshape(-1, chunk, nl), lde[1].reshape(-1, chunk, nl),
              a[0].reshape(-1, chunk), a[1].reshape(-1, chunk))

        def body(acc, x):
            ll, lh, al, ah = x
            prod = gl.mul((jnp.broadcast_to(al[:, None], ll.shape),
                           jnp.broadcast_to(ah[:, None], lh.shape)), (ll, lh))
            return gl.add(acc, nttm.sum_field(prod, axis=0)), None

        acc, _ = scan(body, gl.zeros((nl,)), xs)
        return acc

    def kernel(ldes, apow_f, y_f, z_f):
        # apow_f: field arrays (total + num_specs,) for re and im parts:
        #   ((re_lo, re_hi), (im_lo, im_hi))
        #
        # All per-spec work is BATCHED over a (num_specs, n_lde) axis:
        # an earlier version used per-spec Montgomery inversion chains,
        # a pattern XLA:CPU compiles into executables that never
        # terminate (see prove.py _perm_core — same root cause, same
        # fix; values are unchanged, exact modular arithmetic).
        apre, apim = apow_f
        b_tag = {}
        for ti, t in enumerate(tags):
            lde = ldes[ti]
            c0 = offsets_g[t]
            c1 = c0 + counts[t]
            re = _weighted_sum(lde, (apre[0][c0:c1], apre[1][c0:c1]))
            im = _weighted_sum(lde, (apim[0][c0:c1], apim[1][c0:c1]))
            b_tag[t] = (re, im)
        x_dev = gl.from_u64(x_u64)
        yre, yim = y_f
        zre, zim = z_f
        S = num_specs
        shape = (S, n_lde)

        def col(pair):  # (S,) field pair -> (S, n_lde) broadcast
            return (jnp.broadcast_to(pair[0][:, None], shape),
                    jnp.broadcast_to(pair[1][:, None], shape))

        def row(pair):  # (n_lde,) field pair -> (S, n_lde) broadcast
            return (jnp.broadcast_to(pair[0][None, :], shape),
                    jnp.broadcast_to(pair[1][None, :], shape))

        # denominators (x - z_j), batched; ONE Fermat inversion of the
        # (S, n_lde) norm matrix
        dre = gl.sub(row(x_dev), col(zre))
        dim = gl.neg(col(zim))
        w_arr = gl.full(shape, ge.W)
        norms = gl.sub(gl.square(dre), gl.mul(w_arr, gl.square(dim)))
        ninv = gl.inv(norms)
        inv_denom = (gl.mul(dre, ninv), gl.mul(gl.neg(dim), ninv))

        # B rows by spec tag (stack of references, no slice chains)
        b_re = (jnp.stack([b_tag[t][0][0] for t in spec_tags]),
                jnp.stack([b_tag[t][0][1] for t in spec_tags]))
        b_im = (jnp.stack([b_tag[t][1][0] for t in spec_tags]),
                jnp.stack([b_tag[t][1][1] for t in spec_tags]))
        numer = (gl.sub(b_re, col(yre)), gl.sub(b_im, col(yim)))
        term = _ext_mul(numer, inv_denom)
        beta = (col((apre[0][total:], apre[1][total:])),
                col((apim[0][total:], apim[1][total:])))
        term = _ext_mul(term, beta)
        g_re = nttm.sum_field(term[0], axis=0)
        g_im = nttm.sum_field(term[1], axis=0)
        return g_re, g_im

    return jit(kernel)


@jit
def _fold_core(re, im, hx, half, beta_f):
    """One radix-2 fold with traced beta: inputs length 2h -> outputs h."""
    h = re[0].shape[0] // 2
    re0 = (re[0][:h], re[1][:h])
    re1 = (re[0][h:], re[1][h:])
    im0 = (im[0][:h], im[1][:h])
    im1 = (im[0][h:], im[1][h:])
    s = (gl.add(re0, re1), gl.add(im0, im1))
    d = (gl.sub(re0, re1), gl.sub(im0, im1))
    term1 = (gl.mul(s[0], half), gl.mul(s[1], half))
    dd = (gl.mul(d[0], hx), gl.mul(d[1], hx))
    beta_b = (_bc(beta_f[0], (h,)), _bc(beta_f[1], (h,)))
    term2 = _ext_mul(dd, beta_b)
    return (gl.add(term1[0], term2[0]), gl.add(term1[1], term2[1]))


def _lde_x(log_n: int, rate_bits: int) -> np.ndarray:
    n_lde = 1 << (log_n + rate_bits)
    w = gl.primitive_root_of_unity(log_n + rate_bits)
    return hf.mul(np.uint64(SHIFT), hf.powers(w, n_lde))


@jit(static_argnames=("cap_height",))
def _layer_tree_core(g_re, g_im, cap_height: int):
    """Commit an ext layer with pair leaves [re_j, im_j, re_j', im_j']."""
    n = g_re[0].shape[0]
    h = n // 2
    leaves = (
        jnp.stack([g_re[0][:h], g_im[0][:h], g_re[0][h:], g_im[0][h:]], axis=1),
        jnp.stack([g_re[1][:h], g_im[1][:h], g_re[1][h:], g_im[1][h:]], axis=1),
    )  # (h, 4)
    digests = pos.hash_no_pad(leaves)
    levels = [digests]
    while levels[-1][0].shape[0] > (1 << cap_height):
        cur = levels[-1]
        nxt = pos.compress((cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
        levels.append(nxt)
    return leaves, levels


def _layer_tree(evals, cap_height: int) -> MerkleTree:
    leaves, levels = _layer_tree_core(evals[0], evals[1], cap_height)
    return MerkleTree(leaves=leaves, levels=levels, cap_height=cap_height, leaf_axis=0)


def layer_cap_height(num_leaves: int) -> int:
    return min(4, num_leaves.bit_length() - 1)


def fri_prove(pd, batches, openings, point_specs, zeta, fri_alpha, ch: Challenger, prof=None) -> FriProof:
    from .prove import scalars_f  # local import to avoid cycle
    from .profiler import Profiler

    if prof is None:
        prof = Profiler(enabled=False)
    prof.phase("fri_g_setup")

    data = pd.data
    cfg = data.config
    fri_cfg = cfg.fri
    n_lde = data.n << cfg.rate_bits

    # --- G evaluation (jitted kernel; proof scalars as args) ---
    tags = ("P", "W", "Z", "Q")
    counts = {t: batches[t].lde[0].shape[0] for t in tags}
    total = sum(counts.values())
    num_specs = len(point_specs)
    spec_tags = tuple(tag for tag, _ in point_specs)
    gk_name = "fri_g"
    from .prove import _get_kernel

    gk = _get_kernel(
        pd, gk_name, lambda: make_g_kernel(pd, counts, num_specs, spec_tags)
    )
    # alpha powers (host)
    apow = [(1, 0)]
    for _ in range(total + num_specs):
        apow.append(ge.h_mul(apow[-1], fri_alpha))
    apow = apow[: total + num_specs]
    # y_j, z_j per spec (host)
    omega = gl.primitive_root_of_unity(data.log_n)
    offsets_g = {}
    acc = 0
    for t in tags:
        offsets_g[t] = acc
        acc += counts[t]
    ys = []
    zs = []
    for tag, off in point_specs:
        z_j = ge.h_mul(zeta, (pow(omega, off % data.n, P), 0))
        y_j = (0, 0)
        vals = openings[(tag, off)]
        for i in range(counts[tag]):
            y_j = ge.h_add(y_j, ge.h_mul(apow[offsets_g[tag] + i], (int(vals[i, 0]), int(vals[i, 1]))))
        ys.append(y_j)
        zs.append(z_j)
    apow_f = (scalars_f([a[0] for a in apow]), scalars_f([a[1] for a in apow]))
    y_f = (scalars_f([y[0] for y in ys]), scalars_f([y[1] for y in ys]))
    z_f = (scalars_f([z[0] for z in zs]), scalars_f([z[1] for z in zs]))
    prof.phase("fri_g_kernel")
    ldes = tuple(batches[t].lde for t in tags)
    g = gk(ldes, apow_f, y_f, z_f)

    # --- commit phase (device-resident trees; host sees only caps) ---
    prof.phase("fri_folds", g)
    trees = []
    evals = g
    size = n_lde
    shift = SHIFT
    inv2 = gl.h_inv(2)
    stop_size = 1 << (fri_cfg.final_poly_bits + fri_cfg.rate_bits)
    while size > stop_size:
        tree = _layer_tree(evals, layer_cap_height(size // 2))
        trees.append(tree)
        ch.observe_cap(tree.cap)  # [device sync: cap transfer]
        beta = ch.challenge_ext()
        h = size // 2
        w = gl.primitive_root_of_unity(size.bit_length() - 1)
        half_xinv = hf.mul(
            np.uint64(inv2), hf.mul(np.uint64(gl.h_inv(shift)), hf.powers(gl.h_inv(w), h))
        )
        evals = _fold_core(
            evals[0], evals[1], gl.from_u64(half_xinv), gl.full((h,), inv2),
            (gl.from_u64(np.uint64(beta[0])), gl.from_u64(np.uint64(beta[1]))),
        )
        size = h
        shift = (shift * shift) % P
    # --- final polynomial ---
    prof.phase("fri_final_poly", evals)
    final_len = size >> fri_cfg.rate_bits
    c_re = nttm.coset_intt(evals[0], 0, shift)
    c_im = nttm.coset_intt(evals[1], 0, shift)
    c_re_u = np.asarray(device_get(gl.to_u64(c_re)))
    c_im_u = np.asarray(device_get(gl.to_u64(c_im)))
    assert np.all(c_re_u[final_len:] == 0) and np.all(c_im_u[final_len:] == 0), (
        "FRI final polynomial exceeds expected degree — constraint system bug"
    )
    final_poly = np.stack([c_re_u[:final_len], c_im_u[:final_len]], axis=1)
    for coeff in final_poly:
        ch.observe(int(coeff[0]))
        ch.observe(int(coeff[1]))

    # --- proof of work ---
    prof.phase("fri_pow")
    pow_witness = grind(ch, fri_cfg.proof_of_work_bits)
    ch.observe(pow_witness)

    # --- queries: batched device gathers, ONE transfer for everything ---
    prof.phase("fri_queries")
    num_q = fri_cfg.num_query_rounds
    indices = [ch.challenge() % n_lde for _ in range(num_q)]
    idx_arr = np.array(indices, dtype=np.int32)
    dev_batch = {}
    for tag in tags:
        dev_batch[tag] = gather_rows_and_paths(batches[tag].tree, idx_arr)
    dev_layers = []
    cur = idx_arr
    sz = n_lde
    for tree in trees:
        h = sz // 2
        j = cur % h
        dev_layers.append(gather_rows_and_paths(tree, j))
        cur = j
        sz = h
    host = device_get((dev_batch, dev_layers))  # the one big transfer
    host_batch = {t: (np.asarray(gl.to_u64(v[0])), np.asarray(gl.to_u64(v[1])))
                  for t, v in host[0].items()}
    host_layers = [(np.asarray(gl.to_u64(v[0])), np.asarray(gl.to_u64(v[1])))
                   for v in host[1]]

    query_proofs = []
    for qi in range(num_q):
        b_leaves = {t: host_batch[t][0][qi] for t in tags}
        b_paths = {
            t: [host_batch[t][1][qi][d] for d in range(host_batch[t][1].shape[1])]
            for t in tags
        }
        l_leaves = [host_layers[l][0][qi] for l in range(len(trees))]
        l_paths = [
            [host_layers[l][1][qi][d] for d in range(host_layers[l][1].shape[1])]
            for l in range(len(trees))
        ]
        query_proofs.append(
            FriQueryProof(batch_leaves=b_leaves, batch_paths=b_paths, layer_leaves=l_leaves, layer_paths=l_paths)
        )
    return FriProof(
        layer_caps=[t.cap for t in trees],
        final_poly=final_poly,
        pow_witness=pow_witness,
        query_indices=indices,
        query_proofs=query_proofs,
    )


@jit
def _grind_core(c_f, ws_lo, thr_hi):
    """Batched PoW attempt: hash [c, w] for all w; return (found, index).

    The digest's first element d satisfies d < 2^(64-pow_bits) iff its
    high limb < thr_hi (threshold is a multiple of 2^32 for pow_bits
    <= 32).
    """
    batch = ws_lo.shape[0]
    lo = jnp.stack([jnp.broadcast_to(c_f[0], (batch,)), ws_lo], axis=1)
    hi = jnp.stack([jnp.broadcast_to(c_f[1], (batch,)), jnp.zeros_like(ws_lo)], axis=1)
    digests = pos.hash_no_pad((lo, hi))
    ok = digests[1][:, 0] < thr_hi
    idx = jnp.argmax(ok)
    return ok[idx], idx


def grind(ch: Challenger, pow_bits: int) -> int:
    """Find w with hash([c, w])[0] < 2^(64 - pow_bits), batched on device."""
    assert pow_bits <= 32
    c = ch.challenge()
    from .prove import scalar_f

    c_f = scalar_f(c)
    thr_hi = np.uint32((1 << (64 - pow_bits)) >> 32)
    batch = 1 << min(20, pow_bits + 3)
    start = 0
    while True:
        # witnesses fit 32 bits in practice (expected tries ~2^pow_bits)
        ws_lo = jnp.asarray(np.arange(start, start + batch, dtype=np.uint32))
        found, idx = _grind_core(c_f, ws_lo, thr_hi)
        if bool(found):
            return start + int(idx)
        start += batch
        assert start < (1 << 32), "PoW witness exceeded 32 bits"


def verify_pow(c: int, witness: int, pow_bits: int) -> bool:
    digest = pos.hash_no_pad_host([c, witness])
    return digest[0] < (1 << (64 - pow_bits))
