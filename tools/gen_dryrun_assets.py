"""Regenerate the committed multichip-dryrun assets (assets/dryrun/).

Run with the numpy backend (eager host arithmetic, zero XLA compiles):

    ELP_BACKEND=numpy JAX_PLATFORMS=cpu python tools/gen_dryrun_assets.py

Writes:
  meta.json       circuit fingerprint the loader checks for staleness
  pre.npz         preprocessed commitment (values/coeffs/LDE/levels)
  ref_proof.json  the single-device reference proof (hex-string JSON —
                  non-executable, like every committed artifact)

tests/test_dryrun_assets.py re-derives both from scratch and asserts
byte-equality, so a stale commit fails CI rather than the driver run.
"""

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

assert os.environ.get("ELP_BACKEND") == "numpy", (
    "run with ELP_BACKEND=numpy (the asset generator must be the "
    "independent host reference implementation)"
)

import __graft_entry__ as g  # noqa: E402
from eth_lc_plonky2_tpu.ops import goldilocks as gl  # noqa: E402
from eth_lc_plonky2_tpu.prover import prove as pr  # noqa: E402
from eth_lc_plonky2_tpu.prover.verify import verify  # noqa: E402


def main():
    data, x = g._dryrun_circuit()
    pd, vk = pr.preprocess(data)
    w = g._witness_for(data, x)
    proof = pr.prove(pd, w)
    verify(data, vk, proof)

    os.makedirs(g.ASSET_DIR, exist_ok=True)
    levels = [np.asarray(gl.to_u64(l), dtype=np.uint64)
              for l in pd.pre_batch.tree.levels]
    np.savez_compressed(
        os.path.join(g.ASSET_DIR, "pre.npz"),
        pre_values=pd.pre_values,
        pre_coeffs=np.asarray(gl.to_u64(pd.pre_batch.coeffs), dtype=np.uint64),
        pre_lde=np.asarray(gl.to_u64(pd.pre_batch.lde), dtype=np.uint64),
        num_levels=np.array([len(levels)]),
        **{f"level_{i}": l for i, l in enumerate(levels)},
    )
    from eth_lc_plonky2_tpu.prover import serialize as ser

    with open(os.path.join(g.ASSET_DIR, "ref_proof.json"), "w") as f:
        json.dump(ser.proof_to_dict(proof, include_indices=True), f)
    with open(os.path.join(g.ASSET_DIR, "meta.json"), "w") as f:
        json.dump({"fingerprint": g._circuit_fingerprint(data),
                   "log_n": data.log_n}, f)
    print(f"dryrun assets written to {g.ASSET_DIR} "
          f"(fingerprint {g._circuit_fingerprint(data)})")


if __name__ == "__main__":
    main()
