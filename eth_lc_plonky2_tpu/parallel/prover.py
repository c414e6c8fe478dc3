"""End-to-end sharded prover: same pipeline, mesh-partitioned arrays.

GSPMD formulation (the scaling-book recipe): place the inputs — the
witness matrix and the preprocessed commitment — with NamedShardings
over the mesh, run the SAME jitted prover programs, and let XLA
partition them and insert the collectives.  Because every field op is
exact u32 integer arithmetic there is no reassociation hazard: the
sharded proof is byte-identical to the single-device proof, which is
what tests/test_parallel.py asserts (the distributed-systems analog of
the reference's determinism contract, SURVEY.md §4 "multi-node
testing").

The evaluation DOMAIN axis is sharded (P(None, "x") on (polys, n)
matrices): it is always a power of two, scales with circuit size, and
keeps polynomial counts (which vary per batch) unconstrained.
Explicitly-scheduled alternatives for the two comm-heavy kernels live
in parallel/ntt.py (all-to-all stage exchange) and parallel/commit.py
(column->point reshard + local tree).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import goldilocks as gl
from ..prover import prove as pr
from .mesh import AXIS


def _domain_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the trailing (evaluation-domain) axis."""
    spec = [None] * ndim
    spec[-1] = AXIS
    return NamedSharding(mesh, P(*spec))


_RESHARD_CACHE: dict = {}


def _put_one(x, sharding):
    if jax.process_count() > 1:
        # Multi-controller: device_put cannot scatter to non-addressable
        # devices.  A jitted identity with out_shardings can — numpy
        # inputs are treated as the (identical-on-every-host) global
        # value, and already-global arrays are resharded by XLA.
        ident = _RESHARD_CACHE.get(sharding)
        if ident is None:
            ident = jax.jit(lambda a: a, out_shardings=sharding)
            _RESHARD_CACHE[sharding] = ident
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return ident(x)
        import numpy as np

        return ident(np.asarray(x))
    return jax.device_put(x, sharding)


def _put_pair(pair, sharding):
    return (_put_one(pair[0], sharding), _put_one(pair[1], sharding))


def shard_prover_data(pd: pr.ProverData, mesh: Mesh) -> pr.ProverData:
    """A ProverData whose preprocessed arrays live sharded on `mesh`.

    Kernel cache is fresh: the same jitted programs recompile for the
    sharded layouts (jit keys include shardings).
    """
    dom2 = _domain_sharding(mesh, 2)
    batch = pd.pre_batch
    new_batch = pr.CommitmentBatch(
        coeffs=_put_pair(batch.coeffs, dom2),
        lde=_put_pair(batch.lde, dom2),
        tree=dataclasses.replace(
            batch.tree,
            leaves=_put_pair(batch.tree.leaves, dom2),
            levels=[
                _put_pair(l, NamedSharding(mesh, P(AXIS, None)))
                if l[0].shape[0] % mesh.devices.size == 0
                else _put_pair(l, NamedSharding(mesh, P(None, None)))
                for l in batch.tree.levels
            ],
        ),
    )
    pd2 = pr.ProverData(data=pd.data, pre_values=pd.pre_values, pre_batch=new_batch)
    dom1 = _domain_sharding(mesh, 1)
    pd2.dev["sigma"] = _put_pair(pd.dev["sigma"], dom2)
    pd2.dev["omega_pows"] = _put_pair(pd.dev["omega_pows"], dom1)
    pd2.dev["k_shifts"] = _put_pair(pd.dev["k_shifts"], NamedSharding(mesh, P(None)))
    return pd2


def prove_sharded(pd: pr.ProverData, witness, mesh: Mesh) -> pr.Proof:
    """Prove on a device mesh; returns a proof byte-identical to
    pr.prove(pd, witness) on one device."""
    pd_sharded = shard_prover_data(pd, mesh)
    dom2 = _domain_sharding(mesh, 2)
    return pr.prove(pd_sharded, witness, put=lambda f: _put_pair(f, dom2))
