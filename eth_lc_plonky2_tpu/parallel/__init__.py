"""Multi-chip parallelism (SURVEY.md §2c): device meshes, the
distributed NTT, sharded commitments, and the sharded prover.

The TPU-native replacement for the reference's rayon shared-memory
parallelism (plonky2_maybe_rayon in /root/reference/Cargo.lock):

  ntt.py     point-sharded distributed NTT — transpose (four-step)
             formulation whose stage exchange is jax.lax.all_to_all
             over the mesh axis (SURVEY §2c item 3)
  commit.py  shard_map commit pipeline: column-sharded IFFT/LDE,
             all_to_all reshard, point-sharded Poseidon leaf hashing,
             local tree levels, all_gather cap (items 2/4)
  prover.py  end-to-end sharded prove via GSPMD sharding propagation —
             inputs are placed with NamedShardings and XLA inserts the
             collectives; proofs are byte-identical to single-device
"""

from .mesh import make_mesh  # noqa: F401
