"""Batched padded-sequence encode: per-row agreement with the oracle."""

import numpy as np
import pytest

from zigbpe_tpu import BasicTokenizer
from zigbpe_tpu.models import oracle


@pytest.fixture(scope="module")
def trained():
    data = b"hello world hello the quick brown fox hello " * 30
    return oracle.train(data, 320), data


def test_encode_batch_matches_oracle(trained):
    merges, data = trained
    tok = BasicTokenizer(merges)
    docs = [b"hello world", b"the quick brown fox", b"", b"h", b"hello hello hello"]
    got = tok.encode_batch(docs)
    for d, ids in zip(docs, got):
        assert ids == oracle.encode(d, merges), d


def test_encode_batch_overlap_runs(trained):
    merges, _ = trained
    tok = BasicTokenizer([(97, 97, 256), (256, 256, 257)])
    docs = [b"aaa", b"aaaa", b"aaaaa", b"aaaaaaaa"]
    got = tok.encode_batch(docs)
    for d, ids in zip(docs, got):
        assert ids == oracle.encode(d, tok.merges), d


def test_encode_batch_equals_single(trained):
    merges, data = trained
    tok = BasicTokenizer(merges)
    docs = [data[i * 100 : (i + 1) * 100] for i in range(10)]
    batch = tok.encode_batch(docs)
    single = [tok.encode(d, backend="device") for d in docs]
    assert batch == single


def test_encode_batch_empty():
    assert BasicTokenizer([(97, 98, 256)]).encode_batch([]) == []


def test_encode_batch_no_merges():
    assert BasicTokenizer().encode_batch([b"ab"]) == [[97, 98]]
