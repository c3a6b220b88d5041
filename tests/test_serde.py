"""merges.txt serde parity tests (reference basic_tokenizer.zig:319-348,434-461)."""

import pytest

from zigbpe_tpu.utils import serde

MERGES = [(ord("h"), ord("e"), 256), (256, ord("l"), 257), (ord("w"), ord("o"), 258)]


def test_round_trip(tmp_path):
    p = tmp_path / "merges.txt"
    serde.save(MERGES, p)
    assert serde.load(p) == MERGES


def test_exact_format():
    # "{first},{second},{new_token}\n" per merge, in order
    assert serde.dumps(MERGES) == "104,101,256\n256,108,257\n119,111,258\n"


def test_bad_field_count():
    with pytest.raises(serde.MergesFormatError):
        serde.loads("1,2\n")


def test_bad_int():
    with pytest.raises(serde.MergesFormatError):
        serde.loads("1,x,3\n")


def test_u16_range():
    with pytest.raises(serde.MergesFormatError):
        serde.loads("1,2,70000\n")


def test_golden_file_byte_identical(golden_merges):
    """Serializing the golden merge table reproduces merges.txt byte-for-byte."""
    import pathlib

    golden_text = pathlib.Path("/root/reference/merges.txt").read_text()
    assert serde.dumps(golden_merges) == golden_text
