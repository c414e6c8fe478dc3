"""Circuit / proving-key / proof serialization and preprocess caching.

Capability parity with the reference ecosystem's
`plonky2-circuit-serializer` (declared at
/root/reference/eth-lc-plonky2/eth-lc-plonky2/Cargo.toml:18; SURVEY.md
§5 checkpoint/resume row): persist built `CircuitData` (incl. witness
generators, via cloudpickle), the preprocessed commitment (coeffs +
Merkle levels, so a cache hit skips the IFFT *and* every Poseidon
hash of the preprocess), and proofs.

Format: one directory per cached circuit —
  circuit.pkl   cloudpickle of (extras, CircuitData)
  pre.npz       pre_values / pre coefficient / Merkle-level u64 arrays

Proofs are single .pkl files (numpy + ints only; plain pickle).

Cache keys must capture everything that shapes the circuit; the cache
is also salted with FORMAT_VERSION so stale formats self-invalidate.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import numpy as np

import cloudpickle

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from .merkle import MerkleTree
from .prove import CommitmentBatch, Proof, ProverData, VerifierKey, SHIFT
from ..circuit.builder import CircuitData

FORMAT_VERSION = 2


def cache_key(*parts) -> str:
    h = hashlib.sha256()
    h.update(f"v{FORMAT_VERSION}".encode())
    for p in parts:
        h.update(repr(p).encode())
    return h.hexdigest()[:16]


# ---------------------------------------------------------------------------
# Circuit + preprocess cache
# ---------------------------------------------------------------------------


def save_circuit(dirpath: str, data: CircuitData, pd: ProverData, extras=None):
    """Persist built circuit tables + witness generators + preprocess."""
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "circuit.pkl"), "wb") as f:
        cloudpickle.dump((extras, data), f)
    levels = [np.asarray(gl.to_u64(l), dtype=np.uint64) for l in pd.pre_batch.tree.levels]
    np.savez_compressed(
        os.path.join(dirpath, "pre.npz"),
        pre_values=pd.pre_values,
        pre_coeffs=np.asarray(gl.to_u64(pd.pre_batch.coeffs), dtype=np.uint64),
        num_levels=np.array([len(levels)]),
        **{f"level_{i}": l for i, l in enumerate(levels)},
    )


def load_circuit(dirpath: str):
    """Load a cached circuit: returns (extras, CircuitData, ProverData,
    VerifierKey) with the preprocess reconstructed WITHOUT re-hashing
    (only the coefficient->LDE NTT is recomputed)."""
    with open(os.path.join(dirpath, "circuit.pkl"), "rb") as f:
        extras, data = cloudpickle.load(f)
    z = np.load(os.path.join(dirpath, "pre.npz"))
    pre_values = z["pre_values"]
    coeffs = gl.from_u64(z["pre_coeffs"])
    lde = nttm.coset_lde(coeffs, data.config.rate_bits, SHIFT)
    levels = [gl.from_u64(z[f"level_{i}"]) for i in range(int(z["num_levels"][0]))]
    tree = MerkleTree(
        leaves=lde, levels=levels, cap_height=data.config.cap_height, leaf_axis=1
    )
    batch = CommitmentBatch(coeffs=coeffs, lde=lde, tree=tree)
    pd = ProverData(data=data, pre_values=pre_values, pre_batch=batch)
    from ..ops import host_field as hf

    nr = data.config.num_routed_wires
    pd.dev["sigma"] = gl.from_u64(data.sigma[:nr])
    pd.dev["omega_pows"] = gl.from_u64(
        hf.powers(gl.primitive_root_of_unity(data.log_n), data.n)
    )
    pd.dev["k_shifts"] = gl.from_u64(data.k_shifts[:nr])
    return extras, data, pd, VerifierKey(pre_cap=batch.cap)


def cache_dir_for(root: str, key: str) -> str:
    return os.path.join(root, f"circuit_{key}")


def has_cached_circuit(root: str, key: str) -> bool:
    d = cache_dir_for(root, key)
    return os.path.exists(os.path.join(d, "circuit.pkl")) and os.path.exists(
        os.path.join(d, "pre.npz")
    )


# ---------------------------------------------------------------------------
# Proofs
# ---------------------------------------------------------------------------


def save_proof(path: str, proof: Proof):
    with open(path, "wb") as f:
        pickle.dump(proof, f)


def load_proof(path: str) -> Proof:
    with open(path, "rb") as f:
        return pickle.load(f)
