"""File I/O and host-slicing tests."""

from zigbpe_tpu.utils import fileio


def test_read_file(tmp_path):
    p = tmp_path / "c.txt"
    p.write_bytes(b"hello")
    assert fileio.read_file(p) == b"hello"


def test_host_slice_partition():
    # slices tile the corpus exactly, in order
    total = 1003
    for hosts in (1, 2, 3, 8):
        spans = [fileio.host_slice(total, h, hosts) for h in range(hosts)]
        assert spans[0][0] == 0
        assert spans[-1][1] == total
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0


def test_read_corpus_multi_file_and_slices(tmp_path):
    a, b, c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    a.write_bytes(b"0123456789")
    b.write_bytes(b"abcdefghij")
    c.write_bytes(b"KLMNOPQRST")
    paths = [a, b, c]
    full = b"0123456789abcdefghijKLMNOPQRST"
    assert fileio.read_corpus(paths) == full
    # host slices concatenate back to the full corpus across file boundaries
    for hosts in (2, 3, 4, 7):
        got = b"".join(fileio.read_corpus(paths, h, hosts) for h in range(hosts))
        assert got == full


def test_read_file_mmap(tmp_path):
    p = tmp_path / "m.bin"
    p.write_bytes(bytes(range(200)))
    view = fileio.read_file_mmap(p)
    assert bytes(view) == bytes(range(200))


def test_count_text_size(tmp_path):
    p = tmp_path / "c.txt"
    p.write_bytes(b"hello corpus")
    from zigbpe_tpu.utils import fileio

    assert fileio.count_text_size(p) == 12
