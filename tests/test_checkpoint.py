"""Checkpoint / resume: interrupted training resumes bit-identically."""

import numpy as np
import pytest

from zigbpe_tpu import train as train_mod
from zigbpe_tpu.models import oracle
from zigbpe_tpu.utils import checkpoint


DATA = b"the quick brown fox jumps over the lazy dog hello world " * 80


def test_save_load_round_trip(tmp_path):
    merges = oracle.train(DATA, 280)
    toks = np.asarray(oracle.encode(DATA, merges), dtype=np.int32)
    checkpoint.save(tmp_path / "ck", merges, toks, 300)
    m2, t2, vs, occ = checkpoint.load(tmp_path / "ck")
    assert m2 == merges
    assert (t2 == toks).all()
    assert vs == 300


def test_resume_produces_identical_merges(tmp_path):
    ck = tmp_path / "ck"
    want = oracle.train(DATA, 300)

    # phase 1: checkpoint every chunk, stop partway via small chunks
    got_partial = train_mod.train(
        DATA, 300, chunk_rounds=10, checkpoint_dir=str(ck), checkpoint_every_chunks=1
    )
    assert got_partial == want
    assert checkpoint.exists(ck)

    # simulate a crash after the second chunk: rewind the checkpoint state
    merges, toks, vs, occ = checkpoint.load(ck)
    checkpoint.save(ck, merges[:20], np.asarray(
        oracle.encode(DATA, want[:20]), dtype=np.int32), 300, occ[:20])

    # phase 2: resume and finish — must equal a straight-through run
    got = train_mod.train(
        DATA, 300, chunk_rounds=10, checkpoint_dir=str(ck), checkpoint_every_chunks=1
    )
    assert got == want


def test_resume_vocab_mismatch(tmp_path):
    ck = tmp_path / "ck"
    train_mod.train(DATA, 280, chunk_rounds=8, checkpoint_dir=str(ck),
                    checkpoint_every_chunks=1)
    with pytest.raises(ValueError, match="vocab_size"):
        train_mod.train(DATA, 300, checkpoint_dir=str(ck))


def test_corrupt_checkpoint(tmp_path):
    ck = tmp_path / "ck"
    merges = oracle.train(DATA, 270)
    checkpoint.save(ck, merges, np.arange(10, dtype=np.int32), 270)
    (ck / "meta.json").write_text('{"format": "something-else"}')
    with pytest.raises(ValueError, match="not a zigbpe-tpu checkpoint"):
        checkpoint.load(ck)
