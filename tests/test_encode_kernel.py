"""Batched-replay Pallas encode kernel (ops/pallas/encode.py) vs the oracle
(interpret mode on CPU; the compiled path is pinned in tests_tpu/)."""

import numpy as np
import pytest

from zigbpe_tpu.models import oracle
from zigbpe_tpu.ops.pallas import encode as pe

rng = np.random.default_rng(21)


def _run(docs, merges, L=1024):
    import jax.numpy as jnp

    mtab = jnp.asarray(np.asarray(merges, np.int32).reshape(-1, 3))
    buf = np.full((len(docs), L), -1, np.int32)
    for i, d in enumerate(docs):
        buf[i, : len(d)] = np.frombuffer(bytes(d), np.uint8)
    out, lens = pe.encode_rows_pallas(jnp.asarray(buf), mtab, interpret=True)
    out, lens = np.asarray(out), np.asarray(lens)
    return [out[i, : lens[i]].tolist() for i in range(len(docs))]


def test_rows_match_oracle_trained_table():
    data = bytes(rng.integers(97, 104, 4000, dtype=np.uint8))
    merges = oracle.train(data, 300)
    docs = [
        bytes(rng.integers(97, 104, int(rng.integers(1, 900)), dtype=np.uint8))
        for _ in range(4)
    ]
    docs += [b"", b"a", b"aaaaaaa"]  # empty row, 1-byte row, parity run
    got = _run(docs, merges)
    for d, g in zip(docs, got):
        assert g == oracle.encode(d, merges)


def test_rows_independent():
    # the same doc encodes identically regardless of its batch neighbours
    merges = [(97, 97, 256), (256, 97, 257), (98, 99, 258)]
    a = _run([b"aaaab bc", b"zzz"], merges)
    b = _run([b"aaaab bc", b"aaaa", b"bcbcbc"], merges)
    assert a[0] == b[0] == oracle.encode(b"aaaab bc", merges)


def test_row_collapsing_to_one_token():
    # a row that collapses under repeated doubling merges (the draining
    # case that is legal here: rows never link across blocks)
    merges = [(97, 97, 256), (256, 256, 257), (257, 257, 258)]
    got = _run([b"a" * 8], merges)
    assert got[0] == oracle.encode(b"a" * 8, merges)


def test_presence_skip_soundness_out_of_range_ids():
    # a malformed table minting an id far beyond 256+M must still replay
    # (the presence bitmap treats out-of-range ids as always-present)
    merges = [(97, 98, 9000), (9000, 99, 257)]
    got = _run([b"abcabc"], merges)
    assert got[0] == oracle.encode(b"abcabc", merges)


def test_pad_rows_in_table_are_noops():
    merges = [(97, 98, 256), (-1, -1, -1), (256, 99, 257)]
    got = _run([b"abcabc"], merges)
    want = oracle.encode(b"abcabc", [(97, 98, 256), (256, 99, 257)])
    assert got[0] == want


def test_empty_merge_table():
    # P == 0 grouped table (round-4 advisor): the public function must
    # return the rows unchanged instead of building a degenerate grid
    got = _run([b"abcabc", b""], np.zeros((0, 3), np.int32))
    assert got == [[97, 98, 99, 97, 98, 99], []]
