"""Poseidon permutation/sponge tests: device vs independent host reference."""

import numpy as np

from eth_lc_plonky2_tpu.ops import goldilocks as gl
from eth_lc_plonky2_tpu.ops import poseidon as pos

P = gl.P


def test_round_constants_canonical_and_stable():
    rc = pos.round_constants()
    assert rc.shape == (360,)
    assert all(int(x) < P for x in rc)
    # deterministic across calls
    rc2 = pos.round_constants()
    np.testing.assert_array_equal(rc, rc2)
    # Grain LFSR output must look random: no repeats expected
    assert len(set(int(x) for x in rc)) == 360


def test_permute_matches_host_reference():
    rng = np.random.default_rng(42)
    batch = 3
    states = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    got = gl.to_u64(pos.permute(gl.from_u64(states)))
    for b in range(batch):
        exp = pos.permute_host([int(x) for x in states[b]])
        assert [int(x) for x in got[b]] == exp


def test_permute_zero_state():
    got = gl.to_u64(pos.permute(gl.from_u64(np.zeros(12, dtype=np.uint64))))
    exp = pos.permute_host([0] * 12)
    assert [int(x) for x in got] == exp


def test_hash_no_pad_structure():
    rng = np.random.default_rng(1)
    # length 4 (single absorb, partial chunk)
    x4 = rng.integers(0, P, size=(2, 4), dtype=np.uint64)
    d4 = gl.to_u64(pos.hash_no_pad(gl.from_u64(x4)))
    assert d4.shape == (2, 4)
    # manual sponge check for one row
    s = [0] * 12
    s[:4] = [int(v) for v in x4[0]]
    exp = pos.permute_host(s)[:4]
    assert [int(v) for v in d4[0]] == exp
    # length 10 (two absorbs: 8 then 2)
    x10 = rng.integers(0, P, size=(10,), dtype=np.uint64)
    d10 = gl.to_u64(pos.hash_no_pad(gl.from_u64(x10)))
    s = [int(v) for v in x10[:8]] + [0] * 4
    s = pos.permute_host(s)
    s[:2] = [int(v) for v in x10[8:]]
    exp = pos.permute_host(s)[:4]
    assert [int(v) for v in d10] == exp


def test_compress():
    rng = np.random.default_rng(2)
    l = rng.integers(0, P, size=(4,), dtype=np.uint64)
    r = rng.integers(0, P, size=(4,), dtype=np.uint64)
    got = gl.to_u64(pos.compress(gl.from_u64(l), gl.from_u64(r)))
    s = [int(v) for v in l] + [int(v) for v in r] + [0] * 4
    exp = pos.permute_host(s)[:4]
    assert [int(v) for v in got] == exp


def test_batched_consistency():
    rng = np.random.default_rng(3)
    states = rng.integers(0, P, size=(7, 12), dtype=np.uint64)
    batched = gl.to_u64(pos.permute(gl.from_u64(states)))
    for i in range(7):
        single = gl.to_u64(pos.permute(gl.from_u64(states[i])))
        np.testing.assert_array_equal(batched[i], single)


def test_permute_np_matches_host_reference():
    """Lane-vectorized numpy batch permutation == scalar host reference."""
    rng = np.random.default_rng(7)
    states = rng.integers(0, pos.P, size=(9, 12), dtype=np.uint64)
    out = pos.permute_np(states)
    for b in range(states.shape[0]):
        exp = pos.permute_host([int(x) for x in states[b]])
        assert [int(x) for x in out[b]] == exp


def test_hash_compress_np_match_host():
    rng = np.random.default_rng(8)
    rows = rng.integers(0, pos.P, size=(5, 19), dtype=np.uint64)  # ragged last chunk
    dig = pos.hash_no_pad_np(rows)
    for b in range(rows.shape[0]):
        assert [int(x) for x in dig[b]] == pos.hash_no_pad_host([int(x) for x in rows[b]])
    l = rng.integers(0, pos.P, size=(5, 4), dtype=np.uint64)
    r = rng.integers(0, pos.P, size=(5, 4), dtype=np.uint64)
    cmp = pos.compress_np(l, r)
    for b in range(5):
        assert [int(x) for x in cmp[b]] == pos.compress_host(
            [int(x) for x in l[b]], [int(x) for x in r[b]]
        )
