"""Multi-PROCESS (multi-controller) certification: two OS processes,
each owning 2 virtual CPU devices, join one jax.distributed job and
run the GSPMD sharded prover over the global 4-device mesh.  The proof
must be byte-identical to the committed single-device numpy-backend
reference proof (assets/dryrun/) and must verify.

This exercises the code path BASELINE.json config 5 (v5e-16, 2 hosts)
needs — parallel/distributed.py initialize + make_global_mesh + the
allgather-on-fetch host-transcript discipline — on CPU stand-in
hardware (gloo instead of DCN).

Tier: ci_heavy (two concurrent XLA:CPU compile jobs saturate the
2-vCPU host; run with `python -m pytest tests/ -m ci_heavy -q`).
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from eth_lc_plonky2_tpu.parallel import distributed as dist
dist.initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)
import jax
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()
import __graft_entry__ as g
from eth_lc_plonky2_tpu.parallel import distributed as dist2
from eth_lc_plonky2_tpu.parallel.prover import prove_sharded
from eth_lc_plonky2_tpu.prover.verify import verify
mesh = dist2.make_global_mesh()
data, x = g._dryrun_circuit()
pd, vk, ref = g._load_assets(data)
w = g._witness_for(data, x)
p = prove_sharded(pd, w, mesh)
g._proofs_equal(ref, p)
verify(data, vk, p)
print(f"MP_PROVE_OK {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.ci_heavy
def test_two_process_global_mesh_prove_matches_reference():
    port = _free_port()
    env = dict(os.environ)
    env.update(
        ELP_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        PYTHONPATH="",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2").strip(),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), "2", str(port)],
            cwd=_REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=1800)
            outs.append((p.returncode, stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, stdout, stderr) in enumerate(outs):
        assert rc == 0, f"process {pid} rc={rc}\nstdout:\n{stdout}\nstderr:\n{stderr}"
        assert f"MP_PROVE_OK {pid}" in stdout, (stdout, stderr)
