"""Native C++ host runtime: exact agreement with the oracle."""

import numpy as np
import pytest

from zigbpe_tpu.models import oracle
from zigbpe_tpu.native import fastio

pytestmark = pytest.mark.skipif(not fastio.available(), reason="no C++ toolchain")


def test_read_file(tmp_path):
    p = tmp_path / "x.bin"
    payload = bytes(range(256)) * 10
    p.write_bytes(payload)
    assert fastio.read_file(str(p)) == payload


def test_read_file_empty(tmp_path):
    p = tmp_path / "e"
    p.write_bytes(b"")
    assert fastio.read_file(str(p)) == b""


@pytest.mark.parametrize(
    "data",
    [b"hello world hello", b"aaaaab" * 50, b"ab" * 3, b"a", b""],
)
def test_train_matches_oracle(data):
    assert fastio.train(data, 300) == oracle.train(data, 300)


def test_train_matches_oracle_random():
    rng = np.random.default_rng(13)
    data = bytes(rng.integers(97, 103, 6000, dtype=np.uint8))
    assert fastio.train(data, 330) == oracle.train(data, 330)


def test_encode_matches_oracle():
    data = b"hello world hello hello"
    merges = oracle.train(data, 300)
    for probe in [b"hello", b"hello world", b"xyz", b""]:
        assert fastio.encode(probe, merges) == oracle.encode(probe, merges)


def test_golden(corpus_bytes, golden_merges):
    assert fastio.train(corpus_bytes, 300) == golden_merges
    assert len(fastio.encode(corpus_bytes, golden_merges)) == 128451


def test_byte_pair_hist_matches_oracle():
    data = b"aaab hello hello"
    hist = fastio.byte_pair_hist(data)
    assert hist is not None
    want = oracle.count_pairs(list(data))
    got = {(a, b): int(c) for (a, b), c in np.ndenumerate(hist) if c}
    assert got == dict(want)
