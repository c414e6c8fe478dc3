"""The committed multichip-dryrun assets (assets/dryrun/) must match a
from-scratch rebuild: same preprocess bytes, same reference proof.
This keeps the driver's dryrun_multichip honest — it byte-compares the
sharded prover against these artifacts, so a stale commit must fail
HERE (cheap, numpy) rather than in the driver run."""

import os


import numpy as np

import __graft_entry__ as g
from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.prover import prove as pr


def test_assets_match_fresh_rebuild():
    assert os.path.exists(os.path.join(g.ASSET_DIR, "meta.json")), (
        "assets/dryrun missing — run tools/gen_dryrun_assets.py"
    )
    data, x = g._dryrun_circuit()
    # loader itself validates the fingerprint
    pd_loaded, vk_loaded, ref_proof = g._load_assets(data)

    pd, vk = pr.preprocess(data)
    assert np.array_equal(pd.pre_values, pd_loaded.pre_values)
    assert np.array_equal(
        np.asarray(gl.to_u64(pd.pre_batch.lde)),
        np.asarray(gl.to_u64(pd_loaded.pre_batch.lde)),
    )
    assert np.array_equal(vk.pre_cap, vk_loaded.pre_cap)

    w = g._witness_for(data, x)
    proof = pr.prove(pd, w)
    g._proofs_equal(proof, ref_proof)
