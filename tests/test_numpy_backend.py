"""NumPy host backend must agree with the pure-Python oracle exactly."""

import numpy as np
import pytest

from zigbpe_tpu.models import numpy_backend as nb
from zigbpe_tpu.models import oracle


@pytest.mark.parametrize(
    "data",
    [
        b"hello world hello",
        b"aaa",
        b"aaaaab" * 50,
        b"the quick brown fox " * 40,
        b"",
        b"a",
        b"ab" * 3,
    ],
)
def test_train_matches_oracle(data):
    assert nb.train(data, 300) == oracle.train(data, 300)


def test_train_matches_oracle_random():
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(97, 103, 6000, dtype=np.uint8))
    assert nb.train(data, 330) == oracle.train(data, 330)


def test_encode_matches_oracle():
    data = b"hello world hello hello"
    merges = oracle.train(data, 300)
    for probe in [b"hello", b"hello world", b"xyz", b"", b"h"]:
        assert nb.encode(probe, merges) == oracle.encode(probe, merges)


def test_golden(corpus_bytes, golden_merges):
    assert nb.train(corpus_bytes, 300) == golden_merges


def test_train_huge_vocab_no_overflow():
    # pair ids near the u16 vocab cap overflow int32; the sparse path must not
    from zigbpe_tpu.models import numpy_backend, oracle

    data = b"hello world hello hello"
    got = numpy_backend.train(data, 65535)
    want = oracle.train(data, 65535)
    assert got == want
