"""Multi-host (multi-controller) entry path: DCN-ready mesh construction.

BASELINE.json config 5 ("sharded across v5e-16, 2 hosts") needs a
prover that runs as one JAX multi-controller program: every host calls
`jax.distributed.initialize`, sees the same GLOBAL device list, runs
the same deterministic prove() code path in lockstep, and XLA routes
collectives over ICI within a slice and DCN across hosts.

The reference has no analog (single process + rayon; SURVEY.md §2c);
this is the framework's scaling differentiator.  Real multi-host
hardware is not available in this environment, so the path is
exercised by a 2-process CPU smoke test
(tests/test_multiprocess_prove.py, ci_heavy tier) that asserts the
2-process GSPMD proof is byte-identical to the committed single-device
reference proof — the same determinism contract the single-process
sharded prover certifies.

Usage (one call per host, before any other JAX work):

    from eth_lc_plonky2_tpu.parallel import distributed as dist
    dist.initialize()             # env-driven (TPU pods auto-detect)
    mesh = dist.make_global_mesh()

On Cloud TPU pods `jax.distributed.initialize()` auto-detects the
coordinator and process ids from the TPU metadata; elsewhere pass
`coordinator_address` / `num_processes` / `process_id` explicitly or
via the ELP_COORDINATOR / ELP_NUM_PROCESSES / ELP_PROCESS_ID
environment variables.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

from .mesh import AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-controller job (idempotent for a single process).

    Argument resolution order: explicit args, ELP_* environment
    variables, then jax's own auto-detection (TPU pod metadata).
    Single-process runs may skip this entirely.
    """
    coordinator_address = coordinator_address or os.environ.get("ELP_COORDINATOR")
    if num_processes is None and os.environ.get("ELP_NUM_PROCESSES"):
        num_processes = int(os.environ["ELP_NUM_PROCESSES"])
    if process_id is None and os.environ.get("ELP_PROCESS_ID"):
        process_id = int(os.environ["ELP_PROCESS_ID"])
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        # cross-process collectives on the CPU backend go through gloo
        # (the smoke-test stand-in for ICI/DCN); harmless if already set
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except (AttributeError, ValueError):
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(n_devices: int | None = None) -> Mesh:
    """1-D prover mesh over the GLOBAL device list.

    After `initialize()`, `jax.devices()` enumerates every device in
    the job (all hosts); the mesh therefore spans hosts and XLA places
    cross-host collectives on DCN.  Devices are ordered process-major,
    so a contiguous prefix keeps intra-host neighbors adjacent (domain
    halo exchanges ride ICI first).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), f"need {n_devices} devices, have {len(devs)}"
    if jax.process_count() > 1:
        assert n_devices % jax.process_count() == 0, (
            f"{n_devices} devices over {jax.process_count()} processes: "
            "every process must contribute equally (GSPMD addressable shards)"
        )
    return Mesh(np.array(devs[:n_devices]), (AXIS,))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def fetch(pytree):
    """Device -> host transfer that is multi-controller safe.

    Delegates to ops.backend.device_get — the single fetch point the
    whole prover uses (Merkle caps, opening values, FRI final poly,
    query gathers), which allgathers non-addressable shards so every
    host's Fiat-Shamir transcript sees identical values.
    """
    from ..ops.backend import device_get

    return device_get(pytree)
