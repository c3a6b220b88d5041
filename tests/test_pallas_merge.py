"""Pallas fused merge+compaction kernel vs the XLA reference formulation.

Runs in interpret mode on the CPU test mesh (compiled-mode equivalence is
exercised on TPU by the training/encode conformance paths, which route
through the kernel whenever a real TPU backend is present).
"""

import numpy as np
import pytest

from zigbpe_tpu.ops import core
from zigbpe_tpu.ops.pallas import merge as pm

rng = np.random.default_rng(0)


def _check(data: bytes, a: int, b: int, cap: int, block_rows: int = 8):
    arr, _ = core.pad_tokens(data, cap)
    want, n_want = core.merge_pass(arr, a, b, 256)
    got, n_got = pm.merge_pass_pallas(
        arr, a, b, 256, block_rows=block_rows, interpret=True
    )
    assert np.asarray(want).tolist() == np.asarray(got).tolist()
    assert int(n_want) == int(n_got)


@pytest.mark.parametrize(
    "data,pair",
    [
        (b"aaa", (97, 97)),          # overlap run: aaa -> [X, a]
        (b"aaaa", (97, 97)),
        (b"abab", (97, 98)),
        (b"xay", (97, 98)),          # no hits
        (b"", (97, 98)),             # empty corpus
        (b"a", (97, 97)),            # single byte, no pair
    ],
)
def test_small_vectors(data, pair):
    _check(data, pair[0], pair[1], 1024)


@pytest.mark.parametrize("pair", [(97, 98), (97, 97)])
def test_random_single_block(pair):
    data = bytes(rng.integers(97, 100, 900, dtype=np.uint8))
    _check(data, pair[0], pair[1], 1024)


@pytest.mark.parametrize("pair", [(97, 98), (97, 97)])
def test_random_multi_block(pair):
    # 4 grid blocks at block_rows=8: exercises cross-block carries,
    # ring-staging flushes, and the PAD-fill tail
    data = bytes(rng.integers(97, 100, 4000, dtype=np.uint8))
    _check(data, pair[0], pair[1], 4096)


def test_candidate_run_spanning_blocks():
    # an unbroken a-run across all block boundaries: the greedy parity
    # carry must hold across the whole grid
    _check(b"a" * 3000, 97, 97, 4096)


def test_pair_exactly_at_block_edge():
    data = bytearray(rng.integers(99, 103, 4096, dtype=np.uint8))
    data[1023] = 97
    data[1024] = 98
    _check(bytes(data), 97, 98, 4096)


def test_heavy_compaction_across_flushes():
    # every other pair merges: kept count per block ~half, so staging
    # offsets stay misaligned and every ring path is exercised
    _check(b"ab" * 2000, 97, 98, 4096)
