"""Sharded polynomial commitment: the shard_map formulation.

SURVEY.md §2c items 2 and 4 on one mesh axis:

  columns sharded  -> per-column IFFT + coset LDE      (no comm)
  all_to_all       -> evaluation-POINT sharding
  local leaf hash  -> Poseidon digests for this shard's points
  local compress   -> tree levels down to the cap boundary
  all_gather       -> the Merkle cap (what the transcript absorbs)

Contiguous point blocks keep every compress step local until the
level size reaches the device count; cap_height >= log2(D) makes the
whole tree communication-free except the final cap gather.  Results
are bit-identical to prove._commit_core (tests/test_parallel.py).
"""

from __future__ import annotations

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import goldilocks as gl
from ..ops import ntt as nttm
from ..ops import poseidon as pos
from .mesh import AXIS


def make_sharded_commit(mesh, rate_bits: int, cap_height: int):
    """Returns fn(values (num_polys, n) column-sharded field pair) ->
    (lde point-sharded-by-column-of... (num_polys, 8n) col-sharded,
     digests (8n, 4) point-sharded, cap (2^cap, 4) replicated)."""
    d = mesh.devices.size
    assert (1 << cap_height) % d == 0 or d <= (1 << cap_height), (
        "cap must be gatherable from per-device blocks"
    )
    cap_local = max(1, (1 << cap_height) // d)

    def local_fn(lo, hi):
        coeffs = nttm.intt((lo, hi))  # local columns
        lde = nttm.coset_lde(coeffs, rate_bits)  # (C/D, 8n)
        # reshard: columns -> points
        pt = (
            jax.lax.all_to_all(lde[0], AXIS, split_axis=1, concat_axis=0, tiled=True),
            jax.lax.all_to_all(lde[1], AXIS, split_axis=1, concat_axis=0, tiled=True),
        )  # (C, 8n/D)
        digests = pos.hash_no_pad((pt[0].T, pt[1].T))  # (8n/D, 4)
        levels = [digests]
        while levels[-1][0].shape[0] > cap_local:
            cur = levels[-1]
            levels.append(
                pos.compress((cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
            )
        cap = (
            jax.lax.all_gather(levels[-1][0], AXIS, tiled=True),
            jax.lax.all_gather(levels[-1][1], AXIS, tiled=True),
        )
        return lde, digests, cap

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None)),
        out_specs=(
            (P(AXIS, None), P(AXIS, None)),
            (P(AXIS, None), P(AXIS, None)),
            (P(), P()),
        ),
        check_rep=False,
    )

    @jax.jit
    def fn(values):
        return sharded(values[0], values[1])

    return fn
