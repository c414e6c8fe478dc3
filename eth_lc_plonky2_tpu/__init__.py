"""eth_lc_plonky2_tpu — a TPU-native Plonky2-class proving stack.

A brand-new zero-knowledge proving framework built from scratch in
JAX/XLA/Pallas with the capabilities of Electron-Labs/eth-lc-plonky2
(the Ethereum beacon-chain light-client update circuit): Goldilocks
field arithmetic, radix-2 NTT/LDE, Poseidon transcript hashing,
batched SHA-256 witness generation, a plonkish constraint system with
copy constraints, FRI commitments, and the full light-client
application circuit — all designed TPU-first (vectorized u32-limb
kernels, pjit/shard_map sharding over device meshes).

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/       L0/L1: field, NTT, Poseidon, SHA-256
  circuit/   L2:    constraint-system frontend + gadget library
  prover/    L3:    prover/verifier runtime (commit, quotient, FRI)
  models/    L6:    application circuits (light-client update)
  eth/       L7:    SSZ, domains, light-client JSON ingestion
  parallel/  —:     multi-chip sharding (mesh, sharded prover)
"""

__version__ = "0.1.0"
