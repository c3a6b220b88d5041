"""Pallas fused merge + row-local compaction kernel vs the XLA reference
formulation.

The kernel's output layout is ROW-LOCAL prefixes (ops/pallas/merge.py
layout contract: every 128-lane row is a valid prefix), so equivalence is
on the LOGICAL stream (valid tokens in order); each test additionally
asserts the layout invariant. Runs in interpret mode on the CPU test mesh
(compiled-mode equivalence is exercised on TPU by tests_tpu/ and the
training/encode conformance paths)."""

import numpy as np
import pytest

from zigbpe_tpu.ops import core
from zigbpe_tpu.ops.pallas import LAYOUT, merge as pm

rng = np.random.default_rng(0)


def logical(arr: np.ndarray, block: int = LAYOUT):
    """Valid tokens in logical order + assert the row-prefix invariant."""
    arr = np.asarray(arr)
    blocks = arr.reshape(-1, block)
    for g, row in enumerate(blocks):
        n = int((row >= 0).sum())
        assert (row[:n] >= 0).all() and (row[n:] < 0).all(), (
            f"row {g} is not a valid prefix"
        )
    return arr[arr >= 0].tolist()


def _check(data: bytes, a: int, b: int, cap: int, block_rows: int = 8):
    arr, _ = core.pad_tokens(data, cap)
    want, n_want = core.merge_pass(arr, a, b, 256)
    want = np.asarray(want)
    got, stats = pm.merge_pass_pallas(
        arr, a, b, 256, block_rows=block_rows, interpret=True
    )
    want_logical = want[want >= 0].tolist()
    got_logical = logical(got)
    assert want_logical == got_logical
    nhits = len(data) - len(want_logical)
    assert int(stats[0]) == nhits
    assert int(stats[1]) == len(want_logical)


@pytest.mark.parametrize(
    "data,pair",
    [
        (b"aaa", (97, 97)),          # overlap run: aaa -> [X, a]
        (b"aaaa", (97, 97)),
        (b"abab", (97, 98)),
        (b"xay", (97, 98)),          # no hits
        (b"", (97, 98)),             # empty corpus
        (b"a", (97, 97)),            # single byte, no pair
    ],
)
def test_small_vectors(data, pair):
    _check(data, pair[0], pair[1], 1024)


@pytest.mark.parametrize("pair", [(97, 98), (97, 97)])
def test_random_single_block(pair):
    data = bytes(rng.integers(97, 100, 900, dtype=np.uint8))
    _check(data, pair[0], pair[1], 1024)


@pytest.mark.parametrize("pair", [(97, 98), (97, 97)])
def test_random_multi_block(pair):
    # 4 grid blocks at block_rows=8: exercises cross-block carries and the
    # per-block compaction
    data = bytes(rng.integers(97, 100, 4000, dtype=np.uint8))
    _check(data, pair[0], pair[1], 4096)


def test_candidate_run_spanning_blocks():
    # an unbroken a-run across all block boundaries: the greedy parity
    # carry must hold across the whole grid
    _check(b"a" * 3000, 97, 97, 4096)


def test_pair_exactly_at_block_edge():
    data = bytearray(rng.integers(99, 103, 4096, dtype=np.uint8))
    data[1023] = 97
    data[1024] = 98
    _check(bytes(data), 97, 98, 4096)


def test_heavy_compaction():
    # every other pair merges: every block compacts to ~half population
    _check(b"ab" * 2000, 97, 98, 4096)


def test_row_local_layout_roundtrip():
    # a second pass on the row-local output of a first pass (the layout
    # the training loop actually feeds the kernel)
    data = b"abcabc" * 600
    arr, _ = core.pad_tokens(data, 4096)
    mid, _ = pm.merge_pass_pallas(arr, 97, 98, 256, block_rows=8, interpret=True)
    got, stats = pm.merge_pass_pallas(mid, 256, 99, 257, block_rows=8, interpret=True)
    import zigbpe_tpu.models.oracle as oracle

    want = oracle.merge_pass(oracle.merge_pass(list(data), 97, 98, 256), 256, 99, 257)
    assert logical(got) == want
    assert int(stats[1]) == len(want)


def test_min_kept_flags_draining_interior_rows():
    # Rows that drain toward empty must be reported so the trainer
    # recompacts (the kernel's layout contract); respecting the flag, the
    # chained doubling merges on a degenerate corpus stay oracle-exact.
    import zigbpe_tpu.models.oracle as oracle

    data = b"a" * 1024 + b"bcd" * 400
    out, _ = core.pad_tokens(data, 4096)
    stream = list(data)
    tok = 97
    flagged = 0
    for r in range(10):  # the a-run halves every round
        new = 256 + r
        out, stats = pm.merge_pass_pallas(out, tok, tok, new, block_rows=8,
                                          interpret=True)
        stream = oracle.merge_pass(stream, tok, tok, new)
        assert logical(out) == stream
        if int(stats[2]) <= 1:  # trainer contract: recompact now
            flagged += 1
            out, _ = core.compact_stream(out)
        tok = new
    assert flagged > 0  # the degenerate corpus must have tripped the flag


def test_min_kept_ignores_last_nonempty_row():
    # a legitimately tiny TAIL row (no successor with tokens) must not
    # trigger recompaction: only interior rows can break the next-row
    # adjacency peek
    data = b"c" * 128 + b"a" * 128
    out, _ = core.pad_tokens(data, 1024)
    tok = 97
    for r in range(7):  # last row: 128 -> ... -> 1 token
        new = 256 + r
        out, stats = pm.merge_pass_pallas(out, tok, tok, new, block_rows=8,
                                          interpret=True)
        assert int(stats[2]) > 1, "tail drain must not flag"
        tok = new
    rows = np.asarray(out).reshape(-1, 128)
    assert int((rows[1] >= 0).sum()) == 1


def test_min_kept_folds_deferred_row_across_skipped_blocks():
    # Round-4 advisor (high): if a processed block's LAST non-empty row
    # drains to <= 1 and every later non-empty block takes a fast path
    # (pair absent there), the deferred carry must still fold into
    # min_kept — otherwise the trainer skips recompaction and a later
    # round can empty that now-interior row.
    import jax.numpy as jnp

    arr = np.full(2048, -1, np.int32)  # 2 grid blocks at block_rows=8
    arr = arr.reshape(16, 128)
    arr[:7] = 99                      # block 0 rows 0-6: full 'c' rows
    arr[7, :2] = 97                   # block 0 last row: just "aa"
    arr[8:] = 100                     # block 1: full 'd' rows (no 'a'/'b')
    arr = jnp.asarray(arr.reshape(-1))

    got, stats = pm.merge_pass_pallas(arr, 97, 97, 256, block_rows=8,
                                      interpret=True)
    want = [99] * 896 + [256] + [100] * 1024
    assert logical(got) == want
    # row 7 drained to one token and block 1 (skipped) is non-empty after
    # it, so row 7 is interior: min_kept must report the drain
    assert int(stats[2]) == 1


def test_min_kept_folds_deferred_row_across_idle_blocks():
    # Same as above but the later block takes the IDLE fast path (both
    # tokens present, never adjacent) instead of the presence skip.
    import jax.numpy as jnp

    arr = np.full(2048, -1, np.int32)
    arr = arr.reshape(16, 128)
    arr[:7] = 99
    arr[7, :2] = 97                   # "aa" -> drains to 1
    arr[8:] = 100
    arr[8:, ::2] = 97                 # 'a' present in block 1, never "aa"
    arr = jnp.asarray(arr.reshape(-1))

    got, stats = pm.merge_pass_pallas(arr, 97, 97, 256, block_rows=8,
                                      interpret=True)
    stream = np.asarray(arr)
    stream = stream[stream >= 0].tolist()
    import zigbpe_tpu.models.oracle as oracle

    assert logical(got) == oracle.merge_pass(stream, 97, 97, 256)
    assert int(stats[2]) == 1


def test_encode_replay_pallas_recompacts_drained_interior_blocks():
    # Chained doubling merges drain whole blocks to 1 token and then to 0
    # (kill-first carry across the block edge); the replay path must
    # re-establish a global prefix when that happens, or later merges
    # spanning the gap are silently skipped (round-3 advisor finding).
    import jax.numpy as jnp

    B = 256 * 128  # merge kernel block (default block_rows)
    data = b"a" * (2 * B) + b"cd" * 64
    merges = [(97, 97, 256)]
    for i in range(15):  # 2*B = 2^16 a's -> one token after 16 doublings
        merges.append((256 + i, 256 + i, 257 + i))
    merges.append((271, 99, 272))  # the cross-gap pair (A16, 'c')
    marr = jnp.asarray(np.asarray(merges, np.int32))

    arr, _ = core.pad_tokens(data, 3 * B)
    out, length = core.encode_replay(arr, marr, use_pallas=True, interpret=True)
    got = np.asarray(out)[: int(length)].tolist()

    import zigbpe_tpu.models.oracle as oracle

    want = oracle.encode(data, merges)
    assert got == want
    assert got[0] == 272  # the cross-gap merge actually fired


def _multi_check(data, table, cap, block_rows=8):
    """merge_pass_pallas_multi (interpret) vs sequential oracle replay."""
    import jax.numpy as jnp
    import zigbpe_tpu.models.oracle as oracle

    arr, _ = core.pad_tokens(data, cap)
    t = jnp.asarray(np.asarray(table, np.int32).reshape(-1, 3))
    got, stats = pm.merge_pass_pallas_multi(arr, t, block_rows=block_rows,
                                            interpret=True)
    stream = list(data)
    K = len(table)
    for m in range(K):
        a, b, x = table[m]
        if x >= 0 and a >= 0:
            stream = oracle.merge_pass(stream, a, b, x)
    assert logical(got) == stream
    assert int(stats[K]) == len(stream)
    return np.asarray(stats)


def test_multi_two_disjoint_pairs():
    stats = _multi_check(b"abcdabcdxy", [(97, 98, 256), (99, 100, 257)], 1024)
    assert stats[0] == 2 and stats[1] == 2


def test_multi_shared_left_tokens():
    # a_i == a_j and b_i == b_j are both allowed by the group contract
    _multi_check(b"ab ac ab ac", [(97, 98, 256), (97, 99, 257)], 1024)
    _multi_check(b"xa ya xa", [(120, 97, 256), (121, 97, 257)], 1024)


def test_multi_disabled_slots():
    stats = _multi_check(
        b"abab", [(97, 98, 256), (-2, -2, -2), (-2, -2, -2)], 1024
    )
    assert stats[0] == 2 and stats[1] == 0 and stats[2] == 0


def test_multi_parity_slot0_with_disjoint_member():
    # slot 0 may be a == b (overlap parity); the second member shares no
    # token with it
    stats = _multi_check(b"aaaxyxy", [(97, 97, 256), (120, 121, 257)], 1024)
    assert stats[0] == 1 and stats[1] == 2  # aaa -> [X, a]


def test_multi_cross_block_boundary():
    data = bytearray(rng.integers(101, 104, 4096, dtype=np.uint8))
    data[1023] = 97
    data[1024] = 98
    data[2047] = 99
    data[2048] = 100
    _multi_check(bytes(data), [(97, 98, 256), (99, 100, 257)], 4096)


def test_multi_random_groups_vs_oracle():
    # random chain-free groups over random data (the group contract the
    # selection layer guarantees)
    for seed in range(10):
        r = np.random.default_rng(seed)
        data = bytes(r.integers(97, 105, 3000, dtype=np.uint8))
        toks = list(range(97, 105))
        r.shuffle(toks)
        # 4 disjoint-token pairs are trivially chain-free and distinct
        table = [(toks[2 * i], toks[2 * i + 1], 256 + i) for i in range(4)]
        _multi_check(data, table, 4096)
