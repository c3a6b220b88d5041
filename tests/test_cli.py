"""CLI end-to-end tests (train/encode/decode/demo plumbing)."""

import subprocess
import sys

import pytest

from zigbpe_tpu import cli
from zigbpe_tpu.models import oracle


@pytest.fixture()
def corpus_file(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_bytes(b"hello world hello " * 50)
    return p


def run_cli(args):
    return cli.main([str(a) for a in args])


def test_train_encode_decode_round_trip(tmp_path, corpus_file, capsys):
    merges_path = tmp_path / "m.txt"
    assert run_cli(["train", corpus_file, "--vocab", "300", "--out", merges_path,
                    "--backend", "host"]) == 0
    capsys.readouterr()

    assert run_cli(["encode", "--merges", merges_path, "--text", "hello world"]) == 0
    ids_line = capsys.readouterr().out.strip()
    want = oracle.encode(b"hello world", oracle.train(b"hello world hello " * 50, 300))
    assert [int(t) for t in ids_line.split()] == want

    assert run_cli(["decode", "--merges", merges_path, "--ids", ids_line]) == 0
    assert capsys.readouterr().out.rstrip("\n") == "hello world"


def test_train_multiple_corpora(tmp_path, capsys):
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_bytes(b"hello world ")
    b.write_bytes(b"hello hello " * 20)
    out = tmp_path / "m.txt"
    assert run_cli(["train", a, b, "--vocab", "280", "--out", out, "--backend", "host"]) == 0
    from zigbpe_tpu.utils import serde

    assert serde.load(out) == oracle.train(a.read_bytes() + b.read_bytes(), 280)


def test_decode_comma_ids(tmp_path, corpus_file, capsys):
    merges_path = tmp_path / "m.txt"
    run_cli(["train", corpus_file, "--vocab", "280", "--out", merges_path,
             "--backend", "host"])
    capsys.readouterr()
    run_cli(["encode", "--merges", merges_path, "--text", "hello"])
    ids = capsys.readouterr().out.split()
    run_cli(["decode", "--merges", merges_path, "--ids", ",".join(ids)])
    assert capsys.readouterr().out.rstrip("\n") == "hello"


def test_module_invocation(tmp_path, corpus_file):
    merges_path = tmp_path / "m.txt"
    r = subprocess.run(
        [sys.executable, "-m", "zigbpe_tpu.cli", "train", str(corpus_file),
         "--vocab", "270", "--out", str(merges_path), "--backend", "host"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert merges_path.exists()


def test_demo(tmp_path, corpus_file, capsys):
    out = tmp_path / "m.txt"
    assert run_cli(["demo", "--corpus", corpus_file, "--vocab", "280",
                    "--out", out, "--backend", "host"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines[1] == cli.PROBE  # decoded probe round-trips
    assert out.exists()
