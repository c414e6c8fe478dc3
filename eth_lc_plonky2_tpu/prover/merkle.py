"""Poseidon Merkle trees with caps — batched commitment kernel.

The commitment engine of the prover (SURVEY.md §3.4 "Poseidon
Merkle-cap commit", cap_height=4 like the reference's [dep] config).
Leaf hashing and every tree level are single batched Poseidon calls on
device; levels are kept host-side for query-path extraction.

Leaf layout: leaf i is the i-th row of a (N, L) u64 matrix (all
committed polynomial values at evaluation-domain index i).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import goldilocks as gl
from ..ops import poseidon as pos


@dataclasses.dataclass
class MerkleTree:
    leaves: np.ndarray  # (N, L) u64
    levels: list  # digest arrays (N,4), (N/2,4), ... down to cap (2^cap,4); u64
    cap_height: int

    @property
    def cap(self) -> np.ndarray:
        return self.levels[-1]


def build_merkle(leaves: np.ndarray, cap_height: int) -> MerkleTree:
    """leaves: (N, L) u64 host matrix; N a power of two >= 2^cap_height."""
    leaves = np.asarray(leaves, dtype=np.uint64)
    n = leaves.shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height)
    digests = np.asarray(gl.to_u64(pos.hash_no_pad(gl.from_u64(leaves))), dtype=np.uint64)
    levels = [digests]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        nxt = np.asarray(
            gl.to_u64(pos.compress(gl.from_u64(cur[0::2]), gl.from_u64(cur[1::2]))),
            dtype=np.uint64,
        )
        levels.append(nxt)
    return MerkleTree(leaves=leaves, levels=levels, cap_height=cap_height)


def merkle_path(tree: MerkleTree, index: int) -> list[np.ndarray]:
    """Sibling digests from leaf level up to (but excluding) the cap."""
    path = []
    idx = index
    for level in tree.levels[:-1]:
        path.append(level[idx ^ 1].copy())
        idx >>= 1
    return path


def verify_merkle(leaf_values, index: int, path, cap) -> bool:
    """Host-side path check: leaf_values is the full leaf row (list of ints)."""
    digest = pos.hash_no_pad_host([int(v) for v in leaf_values])
    idx = index
    for sib in path:
        sib = [int(v) for v in sib]
        if idx & 1:
            digest = pos.compress_host(sib, digest)
        else:
            digest = pos.compress_host(digest, sib)
        idx >>= 1
    cap_entry = [int(v) for v in np.asarray(cap)[idx]]
    return digest == cap_entry
