"""Poseidon Merkle trees with caps — device-resident commitment engine.

The commitment engine of the prover (SURVEY.md §3.4 "Poseidon
Merkle-cap commit", cap_height=4 like the reference's [dep] config).
TPU-first: leaves, digests and every level live ON DEVICE as u32-limb
field arrays; only the cap (2^cap_height digests, what the transcript
absorbs) is materialized to host.  Query rows and sibling paths are
extracted with batched device gathers — one transfer for all query
rounds instead of shipping the full (N x L) leaf matrix to host.

Leaf layouts supported:
  * leaf_axis=0: ``leaves`` is (N, L); leaf i = leaves[i]        (FRI layers)
  * leaf_axis=1: ``leaves`` is (L, N); leaf i = leaves[:, i]     (poly LDEs,
    avoiding a persistent (N, L) transpose of multi-GB LDE matrices)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.backend import xp as jnp, jit, device_get
from ..ops import goldilocks as gl
from ..ops import poseidon as pos


@dataclasses.dataclass
class MerkleTree:
    """Device-resident tree: field-pair leaves + digest levels.

    ``leaves``/``levels`` entries are (lo, hi) u32 device pairs;
    ``levels[k]`` has shape (N >> k, 4), ending at the cap level.
    """

    leaves: tuple  # field pair, see leaf_axis
    levels: list  # [(lo, hi) of shape (N>>k, 4)]
    cap_height: int
    leaf_axis: int = 0
    _cap_u64: np.ndarray | None = None

    @property
    def num_leaves(self) -> int:
        return self.leaves[0].shape[self.leaf_axis]

    @property
    def cap(self) -> np.ndarray:
        """Host (2^cap_height, 4) u64 cap digests (cached transfer)."""
        if self._cap_u64 is None:
            self._cap_u64 = np.asarray(
                device_get(gl.to_u64(self.levels[-1])), dtype=np.uint64
            )
        return self._cap_u64


@jit(static_argnames=("cap_height",))
def _levels_core(digests, cap_height: int):
    """Digest row (N, 4) -> all levels down to the cap (static unroll)."""
    levels = [digests]
    while levels[-1][0].shape[0] > (1 << cap_height):
        cur = levels[-1]
        nxt = pos.compress((cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
        levels.append(nxt)
    return levels


def tree_from_digests(leaves, digests, cap_height: int, leaf_axis: int = 0) -> MerkleTree:
    return MerkleTree(
        leaves=leaves,
        levels=_levels_core(digests, cap_height),
        cap_height=cap_height,
        leaf_axis=leaf_axis,
    )


def build_merkle(leaves, cap_height: int) -> MerkleTree:
    """leaves: (N, L) u64 host array OR device field pair; N a power of two."""
    if isinstance(leaves, np.ndarray):
        leaves = gl.from_u64(np.asarray(leaves, dtype=np.uint64))
    n = leaves[0].shape[0]
    assert n & (n - 1) == 0 and n >= (1 << cap_height)
    digests = pos.hash_no_pad(leaves)
    return tree_from_digests(leaves, digests, cap_height, leaf_axis=0)


def gather_rows_and_paths(tree: MerkleTree, idx):
    """Batched query extraction, all on device.

    idx: int32 array (k,) of leaf indices.  Returns device arrays
    (rows, paths): rows (k, L) field pair; paths (k, depth, 4) field
    pair of sibling digests from leaf level up to (excluding) the cap.
    """
    idx = jnp.asarray(idx, dtype=jnp.int32)
    if tree.leaf_axis == 1:
        rows = (jnp.take(tree.leaves[0], idx, axis=1).T, jnp.take(tree.leaves[1], idx, axis=1).T)
    else:
        rows = (jnp.take(tree.leaves[0], idx, axis=0), jnp.take(tree.leaves[1], idx, axis=0))
    sibs_lo, sibs_hi = [], []
    cur = idx
    for level in tree.levels[:-1]:
        sibs_lo.append(jnp.take(level[0], cur ^ 1, axis=0))
        sibs_hi.append(jnp.take(level[1], cur ^ 1, axis=0))
        cur = cur >> 1
    if sibs_lo:
        paths = (jnp.stack(sibs_lo, axis=1), jnp.stack(sibs_hi, axis=1))
    else:
        k = idx.shape[0]
        paths = (jnp.zeros((k, 0, 4), dtype=jnp.uint32), jnp.zeros((k, 0, 4), dtype=jnp.uint32))
    return rows, paths


def merkle_path(tree: MerkleTree, index: int) -> list[np.ndarray]:
    """Single-index host path (test/debug convenience)."""
    _, paths = gather_rows_and_paths(tree, np.array([index], dtype=np.int32))
    p = np.asarray(gl.to_u64(paths))[0]  # (depth, 4)
    return [p[d] for d in range(p.shape[0])]


def verify_merkle_batch(leaf_rows, indices, paths, cap) -> bool:
    """Host-side path check for a batch of queries against ONE tree.

    leaf_rows: (N, L) u64 — full leaf row per query
    indices:   (N,) leaf indices
    paths:     (N, depth, 4) u64 sibling digests, leaf level upward
    cap:       (2^cap_height, 4) u64

    Semantically identical to N calls of verify_merkle, but hashes all
    N chains in lock-step through the lane-vectorized numpy permutation
    (pos.permute_np) — the verifier's dominant cost drops from ~1 ms per
    scalar permutation to one batched call per tree level.
    """
    leaf_rows = np.asarray(leaf_rows, dtype=np.uint64)
    idx = np.asarray(indices, dtype=np.int64).copy()
    paths = np.asarray(paths, dtype=np.uint64)
    cap = np.asarray(cap, dtype=np.uint64)
    digest = pos.hash_no_pad_np(leaf_rows)
    for d in range(paths.shape[1]):
        sib = paths[:, d, :]
        odd = (idx & 1).astype(bool)[:, None]
        left = np.where(odd, sib, digest)
        right = np.where(odd, digest, sib)
        digest = pos.compress_np(left, right)
        idx >>= 1
    return bool((digest == cap[idx]).all())


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
