"""Compiled (Mosaic) Pallas kernel conformance on real TPU hardware.

Mirrors the interpret-mode assertions of tests/test_pallas_merge.py but
through the actual TPU codegen path, plus an end-to-end golden train
(reference: /root/reference/src/basic_tokenizer.zig:207-232, merges.txt).
"""

import numpy as np
import pytest


def _merge_pass_ref(tokens, first, second, new_token):
    out = []
    i, n = 0, len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == first and tokens[i + 1] == second:
            out.append(new_token)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _run_kernel(tokens_list, first, second, new_token, capacity=32768):
    import jax.numpy as jnp

    from zigbpe_tpu.ops.pallas import BLOCK
    from zigbpe_tpu.ops.pallas import merge as pm

    buf = np.full((capacity,), -1, np.int32)
    buf[: len(tokens_list)] = tokens_list
    out, stats = pm.merge_pass_pallas(
        jnp.asarray(buf), first, second, new_token
    )
    out = np.asarray(out)
    # layout contract: every 128-lane ROW is a valid prefix
    # (ops/pallas/merge.py row-local layout)
    from zigbpe_tpu.ops.pallas import LAYOUT

    for g, row in enumerate(out.reshape(-1, LAYOUT)):
        n = int((row >= 0).sum())
        assert (row[:n] >= 0).all() and (row[n:] < 0).all(), (
            f"row {g} is not a valid prefix"
        )
    return out[out >= 0].tolist(), int(stats[0])


@pytest.mark.parametrize(
    "toks,a,b",
    [
        (list(b"hello world hello"), ord("l"), ord("l")),
        (list(b"aaa"), ord("a"), ord("a")),
        (list(b"aaaa"), ord("a"), ord("a")),
        (list(b"aaaaa"), ord("a"), ord("a")),
        (list(b"abababab"), ord("a"), ord("b")),
        ([], ord("a"), ord("b")),
        (list(b"x"), ord("a"), ord("b")),
    ],
)
def test_compiled_merge_pass(toks, a, b):
    got, nhits = _run_kernel(toks, a, b, 256)
    want = _merge_pass_ref(toks, a, b, 256)
    assert got == want
    assert nhits == (len(toks) - len(want))


def test_compiled_merge_pass_fuzz():
    rng = np.random.default_rng(7)
    for trial in range(8):
        n = int(rng.integers(2, 40000))
        toks = rng.integers(0, 4, n).astype(np.int32).tolist()
        a, b = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        cap = 65536
        got, _ = _run_kernel(toks, a, b, 256, capacity=cap)
        assert got == _merge_pass_ref(toks, a, b, 256), f"trial {trial}"


def test_compiled_boundary_spanning_runs():
    # candidate runs spanning kernel block boundaries (block = 32768 elems)
    C = 256 * 128
    toks = [5] * (C - 3) + [7] * 10 + [5] * 100
    got, _ = _run_kernel(toks, 7, 7, 300, capacity=4 * C)
    assert got == _merge_pass_ref(toks, 7, 7, 300)


def test_golden_train_compiled(corpus_bytes, golden_merges):
    """Full device train on the conformance corpus through the compiled
    kernel path reproduces the committed golden merges."""
    from zigbpe_tpu import train as train_mod

    merges = train_mod.train(corpus_bytes, 300)
    assert merges == golden_merges


def test_device_encode_compiled(corpus_bytes, golden_merges):
    from zigbpe_tpu import BasicTokenizer

    tok = BasicTokenizer(golden_merges)
    ids = tok.encode(corpus_bytes, backend="device")
    assert len(ids) == 128451  # golden compression (SURVEY §2.3.9)
    assert tok.decode(ids) == corpus_bytes


def test_batched_encode_kernel_compiled(corpus_bytes, golden_merges):
    """Compiled batched-replay encode kernel (ops/pallas/encode.py) on rows
    of the conformance corpus matches the oracle replay."""
    import jax.numpy as jnp

    from zigbpe_tpu.models import oracle
    from zigbpe_tpu.ops.pallas import encode as pe

    mtab = jnp.asarray(np.asarray(golden_merges, np.int32).reshape(-1, 3))
    L = 1024
    docs = [corpus_bytes[i * L : (i + 1) * L] for i in range(4)] + [
        b"", b"a", b"aaaaaaa"
    ]
    buf = np.full((len(docs), L), -1, np.int32)
    for i, d in enumerate(docs):
        buf[i, : len(d)] = np.frombuffer(d, np.uint8)
    out, lens = pe.encode_rows_pallas(jnp.asarray(buf), mtab)
    out, lens = np.asarray(out), np.asarray(lens)
    for i, d in enumerate(docs):
        assert out[i, : lens[i]].tolist() == oracle.encode(d, golden_merges), i
