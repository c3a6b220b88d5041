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
    from tests import conftest

    golden_text = conftest.GOLDEN_MERGES_PATH.read_text()
    assert serde.dumps(golden_merges) == golden_text


def test_fixture_parity_with_reference_checkout():
    """The vendored fixtures must not drift from the upstream artifacts
    (cross-check only when the reference checkout is present)."""
    from tests import conftest

    if not conftest.REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")
    for name, vendored in (
        ("taylorswift.txt", conftest.CORPUS_PATH),
        ("merges.txt", conftest.GOLDEN_MERGES_PATH),
    ):
        assert (
            vendored.read_bytes() == (conftest.REFERENCE_DIR / name).read_bytes()
        ), f"vendored {name} differs from the reference artifact"
