"""Randomized conformance fuzz: the full device pipeline vs the oracle.

Each case trains to a random vocab target on a random corpus (skewed
alphabets force heavy overlap runs and count ties), then checks merge-list
equality, encode parity, and decode round-trips — the §2.3 conformance
contract end to end.
"""

import numpy as np
import pytest

from zigbpe_tpu import train as train_mod
from zigbpe_tpu.models import oracle
from zigbpe_tpu.models.basic_tokenizer import BasicTokenizer


def _random_corpus(rng) -> bytes:
    kind = rng.integers(0, 4)
    n = int(rng.integers(2, 3000))
    if kind == 0:  # tiny alphabet: dense overlap runs (aaa...)
        return bytes(rng.integers(97, 99, n, dtype=np.uint8))
    if kind == 1:  # text-like
        words = [b"hello", b"world", b"the", b"a", b" ", b"\n", "안".encode()]
        out = b""
        while len(out) < n:
            out += words[int(rng.integers(0, len(words)))]
        return out[:n]
    if kind == 2:  # full byte range
        return bytes(rng.integers(0, 256, n, dtype=np.uint8))
    return bytes([int(rng.integers(0, 256))]) * n  # single repeated byte


@pytest.mark.parametrize("seed", range(12))
def test_train_encode_decode_vs_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    data = _random_corpus(rng)
    vocab = int(rng.integers(257, 256 + 80))

    want = oracle.train(data, vocab)
    got = train_mod.train(data, vocab, chunk_rounds=int(rng.integers(1, 40)))
    assert got == want, f"merge divergence on seed {seed}"

    tok = BasicTokenizer(got)
    ids = tok.encode(data, backend="device")
    assert ids == oracle.encode(data, want)
    assert tok.decode(ids) == data
