"""BLS sub-proof absorption (L5 boundary + the recursion call site).

The reference verifies a starky_bls12_381 recursive proof inside the
app circuit and binds its public inputs to the committee inputs:
`/root/reference/eth-lc-plonky2/src/targets.rs:468-482`, with PI
layout `[0..32)=signing_root bytes, [32..128)=signature bytes, then
committee_size x (48 pubkey bytes + 1 participation bit)` — 25,216
PIs at mainnet size 512.  The BLS prover itself is pluggable (its
artifacts may be produced offline and loaded from files, per
`/root/reference/README.md:14`); this module provides

  * `absorb_bls_proof`     — the in-circuit verification + index-for-
                             index PI binding into the app circuit,
  * `build_dummy_bls_circuit` / `prove_dummy_bls` — a stand-in inner
                             circuit with the exact PI layout, used
                             until a real BLS STARK artifact is
                             supplied (same affordance the reference
                             documents).
"""

from __future__ import annotations

from ..circuit import recursion as rec
from ..circuit.builder import CircuitBuilder, CircuitData
from ..prover.config import CircuitConfig, FriConfig
from ..prover import prove as pr

G1_PUBKEY_SIZE = 48
SIGNATURE_SIZE = 96
SIGNING_ROOT_SIZE = 32


def num_bls_public_inputs(committee_size: int) -> int:
    """32 + 96 + size*(48+1); 25,216 at size 512 (targets.rs:471-482)."""
    return SIGNING_ROOT_SIZE + SIGNATURE_SIZE + committee_size * (G1_PUBKEY_SIZE + 1)


# ---------------------------------------------------------------------------
# In-circuit absorption (targets.rs:468-482)
# ---------------------------------------------------------------------------


def absorb_bls_proof(b: CircuitBuilder, t, bls_data: CircuitData, pin_vk=None):
    """Verify a BLS inner proof in-circuit and bind its public inputs.

    `t` is the app-circuit ProofTarget (models.lc_circuit).  Mirrors
    targets.rs:468-482: PIs [0..32) connect to signing_root_bytes,
    [32..128) to signature_bytes, then per committee member 48 pubkey
    bytes followed by the participation bit.

    `pin_vk`: the expected inner VerifierKey.  When given, the verifier
    data (the preprocessed-commitment cap) is pinned to circuit
    CONSTANTS of that key, so a prover cannot substitute a different
    same-shape inner circuit's vk/proof pair.  The reference leaves the
    verifier data as a plain witness (targets.rs:469) and relies on the
    operator passing the right artifacts; pin the vk whenever the inner
    circuit is known at build time (the CLI's --bls dummy path does).
    Without pinning, the absorption only attests "some proof of some
    circuit with this PI layout verifies" — fine for the dummy, a
    soundness hole for a real BLS artifact.

    Returns (proof_target, verifier_data_target) for the witness side
    (set via set_bls_proof_target, the counterpart of
    targets.rs:896-897).
    """
    pt = rec.add_virtual_proof_with_pis(b, bls_data)
    vd = rec.add_virtual_verifier_data(b, bls_data)
    if pin_vk is not None:
        for d_t, d_v in zip(vd.pre_cap, pin_vk.pre_cap):
            for wire, val in zip(d_t, d_v):
                b.connect(wire, b.constant(int(val)))
    rec.verify_proof_circuit(b, pt, vd, bls_data)

    size = len(t.sync_committee.pubkeys)
    expected = num_bls_public_inputs(size)
    assert len(pt.public_inputs) == expected, (
        f"inner proof has {len(pt.public_inputs)} public inputs, "
        f"app circuit at committee size {size} binds {expected}"
    )
    pis = pt.public_inputs
    for i in range(SIGNING_ROOT_SIZE):
        b.connect(pis[i], t.signing_root_bytes[i])
    for i in range(SIGNATURE_SIZE):
        b.connect(pis[SIGNING_ROOT_SIZE + i], t.signature_bytes[i])
    off = SIGNING_ROOT_SIZE + SIGNATURE_SIZE
    for i in range(size):
        for j in range(G1_PUBKEY_SIZE):
            b.connect(pis[off], t.sync_committee.pubkeys[i][j])
            off += 1
        b.connect(pis[off], t.sync_committee_bits[i])
        off += 1
    return pt, vd


def set_bls_proof_target(w, pt, vd, proof, vk):
    """Witness half (targets.rs:896-897)."""
    rec.set_proof_with_pis_target(w, pt, proof)
    rec.set_verifier_data_target(w, vd, vk)


# ---------------------------------------------------------------------------
# Dummy inner circuit (stand-in for the BLS STARK wrapper)
# ---------------------------------------------------------------------------


def build_dummy_bls_circuit(
    committee_size: int, fri: FriConfig | None = None
) -> CircuitData:
    """An inner circuit with the exact 32+96+size*49 PI layout.

    Bits are constrained boolean (as the real wrapper's would be);
    byte inputs are free wires — their integrity comes from the app
    circuit's own SHA-256/SSZ constraints on the same values, exactly
    as in the reference, where the BLS proof attests the *signature
    check* while the app circuit attests the committee structure.
    """
    cfg = CircuitConfig(
        fri=fri or FriConfig(proof_of_work_bits=8, num_query_rounds=12)
    )
    b = CircuitBuilder(cfg)
    signing_root = b.add_virtual_targets(SIGNING_ROOT_SIZE)
    signature = b.add_virtual_targets(SIGNATURE_SIZE)
    members = []
    for _ in range(committee_size):
        pk = b.add_virtual_targets(G1_PUBKEY_SIZE)
        bit = b.add_virtual_bool_target()
        members.append((pk, bit))
    b.register_public_inputs(signing_root)
    b.register_public_inputs(signature)
    for pk, bit in members:
        b.register_public_inputs(pk)
        b.register_public_input(bit)
    data = b.build()
    data._dummy_bls_inputs = (signing_root, signature, members)  # type: ignore[attr-defined]
    return data


def prove_dummy_bls(
    data: CircuitData,
    signing_root: bytes,
    signature: bytes,
    pubkeys: list,
    bits: list,
):
    """Prove the dummy inner circuit for the given witness values.

    Returns (proof, verifier_key)."""
    sr_t, sig_t, members = data._dummy_bls_inputs  # type: ignore[attr-defined]
    pd, vk = pr.preprocess(data)
    w = data.new_witness()
    for t, byte in zip(sr_t, signing_root):
        w.set(t, byte)
    for t, byte in zip(sig_t, signature):
        w.set(t, byte)
    for (pk_t, bit_t), pk, bit in zip(members, pubkeys, bits):
        for t, byte in zip(pk_t, pk):
            w.set(t, byte)
        w.set(bit_t, int(bit))
    w.generate()
    proof = pr.prove(pd, w)
    return proof, vk


# ---------------------------------------------------------------------------
# File-based inner-proof artifacts
# ---------------------------------------------------------------------------
#
# The reference documents that the BLS artifacts (plonky2_proof,
# verifier_data, common_data) may be produced offline by another
# process and loaded from files (/root/reference/README.md:14).  The
# equivalents here: circuit.pkl (CircuitData = common data incl. PI
# layout), proof.pkl, vk.pkl (the preprocessed-commitment cap).


def save_bls_artifacts(dirpath: str, data: CircuitData, proof, vk) -> None:
    import os
    import pickle

    import cloudpickle

    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "circuit.pkl"), "wb") as f:
        cloudpickle.dump(data, f)
    with open(os.path.join(dirpath, "proof.pkl"), "wb") as f:
        pickle.dump(proof, f)
    with open(os.path.join(dirpath, "vk.pkl"), "wb") as f:
        pickle.dump(vk, f)


def load_bls_artifacts(dirpath: str):
    """Returns (CircuitData, proof, VerifierKey); the caller absorbs via
    absorb_bls_proof(..., pin_vk=vk) + set_bls_proof_target."""
    import os
    import pickle

    import cloudpickle

    with open(os.path.join(dirpath, "circuit.pkl"), "rb") as f:
        data = cloudpickle.load(f)
    with open(os.path.join(dirpath, "proof.pkl"), "rb") as f:
        proof = pickle.load(f)
    with open(os.path.join(dirpath, "vk.pkl"), "rb") as f:
        vk = pickle.load(f)
    return data, proof, vk
