"""SHA-256 kernels vs hashlib ground truth, incl. the reference's
known Merkle-root vectors (recomputed independently via hashlib)."""

import hashlib

import numpy as np

from eth_lc_plonky2_tpu.ops import sha256 as sha


def _hashlib_two_to_one(l32: bytes, r32: bytes) -> bytes:
    return hashlib.sha256(l32 + r32).digest()


def test_compress_np_matches_hashlib():
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, size=(5, 64), dtype=np.uint8)
    blocks = np.stack([sha.words_from_bytes(m.tobytes()).reshape(16) for m in msgs])
    h1 = sha.compress_np(np.broadcast_to(sha.IV, (5, 8)), blocks)
    out = sha.compress_np(h1, np.broadcast_to(sha.PAD_BLOCK_64B, (5, 16)))
    for i in range(5):
        expect = hashlib.sha256(msgs[i].tobytes()).digest()
        assert sha.bytes_from_words(out[i]) == expect


def test_two_to_one_np():
    rng = np.random.default_rng(1)
    l = rng.integers(0, 256, size=(7, 32), dtype=np.uint8)
    r = rng.integers(0, 256, size=(7, 32), dtype=np.uint8)
    lw = np.stack([sha.words_from_bytes(x.tobytes()) for x in l])
    rw = np.stack([sha.words_from_bytes(x.tobytes()) for x in r])
    got = sha.two_to_one_np(lw, rw)
    for i in range(7):
        assert sha.bytes_from_words(got[i]) == _hashlib_two_to_one(l[i].tobytes(), r[i].tobytes())


def test_device_matches_np():
    rng = np.random.default_rng(2)
    lw = rng.integers(0, 1 << 32, size=(9, 8), dtype=np.uint64).astype(np.uint32)
    rw = rng.integers(0, 1 << 32, size=(9, 8), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(sha.two_to_one(lw, rw))
    np.testing.assert_array_equal(got, sha.two_to_one_np(lw, rw))


def test_trace_consistency():
    """Trace kernel's out/w/carries must reproduce the plain kernel and
    satisfy the gadget's constraint equations."""
    rng = np.random.default_rng(3)
    state = rng.integers(0, 1 << 32, size=(4, 8), dtype=np.uint64).astype(np.uint32)
    block = rng.integers(0, 1 << 32, size=(4, 16), dtype=np.uint64).astype(np.uint32)
    tr = sha.compress_trace_np(state, block)
    np.testing.assert_array_equal(tr["out"], sha.compress_np(state, block))
    # schedule identity with carries (exact integer equation)
    w64 = tr["w"].astype(np.uint64)
    for t in range(16, 64):
        s0 = (np.right_shift(tr["w"][:, t - 15], 7) | np.left_shift(tr["w"][:, t - 15], 25)) ^ \
             (np.right_shift(tr["w"][:, t - 15], 18) | np.left_shift(tr["w"][:, t - 15], 14)) ^ \
             np.right_shift(tr["w"][:, t - 15], 3)
        s1 = (np.right_shift(tr["w"][:, t - 2], 17) | np.left_shift(tr["w"][:, t - 2], 15)) ^ \
             (np.right_shift(tr["w"][:, t - 2], 19) | np.left_shift(tr["w"][:, t - 2], 13)) ^ \
             np.right_shift(tr["w"][:, t - 2], 10)
        lhs = w64[:, t] + (tr["carry_w"][:, t].astype(np.uint64) << np.uint64(32))
        rhs = w64[:, t - 16] + s0.astype(np.uint64) + w64[:, t - 7] + s1.astype(np.uint64)
        np.testing.assert_array_equal(lhs, rhs)
    assert tr["carry_w"].max() <= 3
    assert tr["carry_a"].max() <= 6
    assert tr["carry_e"].max() <= 6
    assert tr["carry_o"].max() <= 1


def test_zero_leaf_merkle_roots():
    """The reference pins SHA-256 Merkle roots of all-zero leaf trees
    (merkle_tree_gadget.rs tests); recompute them independently and check
    our batched kernel reproduces hashlib."""
    for height in [1, 2, 3, 4]:
        n = 1 << height
        # hashlib ground truth
        layer = [b"\x00" * 32] * n
        while len(layer) > 1:
            layer = [_hashlib_two_to_one(layer[i], layer[i + 1]) for i in range(0, len(layer), 2)]
        expect = layer[0]
        # batched kernel: hash all pairs per level at once
        words = np.zeros((n, 8), dtype=np.uint32)
        while words.shape[0] > 1:
            words = sha.two_to_one_np(words[0::2], words[1::2])
        assert sha.bytes_from_words(words[0]) == expect
    # spot-check the height-1 root against the value hard-pinned by the
    # reference test (first bytes f5 a5 fd 42 ...)
    root2 = hashlib.sha256(b"\x00" * 64).digest()
    assert root2[:4] == bytes([245, 165, 253, 66])
