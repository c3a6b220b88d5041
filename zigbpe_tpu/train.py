"""Training driver: host-side loop around the jitted device hot loop.

The device does everything hot (histogram, selection, merge, compaction) in
chunks of rounds under one jit; the host only orchestrates chunk calls,
optional verbose printing (reference format, basic_tokenizer.zig:308-317),
and the *shrink schedule*: as the corpus compacts, the padded capacity is
halved between chunks so later rounds touch proportionally less HBM. Each
distinct capacity costs one compile; capacities are powers of two, so there
are O(log N) compiles total.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import core
from .utils.profiling import TimeStats

Merge = Tuple[int, int, int]

MIN_CAPACITY = 1024


def _round_capacity(n: int) -> int:
    cap = MIN_CAPACITY
    while cap < n:
        cap *= 2
    return cap


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "max_rounds"),
    donate_argnums=(0, 2, 3),
)
def _train_chunk(tokens, length, merges, occupancy, num_merges, *, vocab_size, max_rounds):
    return core.train_chunk(
        tokens, length, merges, occupancy, num_merges,
        vocab_size=vocab_size, max_rounds=max_rounds,
    )


def train(
    data: bytes,
    vocab_size: int,
    verbose: bool = False,
    chunk_rounds: int = 64,
    shrink: bool = True,
    stats: Optional[TimeStats] = None,
) -> List[Merge]:
    """Train a BPE merge table on-device; exact reference semantics
    (basic_tokenizer.zig:140-205). Returns the ordered merge list."""
    if vocab_size < core.VOCAB_START:
        raise ValueError(f"vocab_size must be >= 256, got {vocab_size}")
    if vocab_size > 0x10000:
        raise ValueError(f"vocab_size must fit u16, got {vocab_size}")

    M = vocab_size - core.VOCAB_START
    if M == 0 or len(data) < 2:
        return []

    with (stats or TimeStats.null()).phase("initial_tokens"):
        capacity = _round_capacity(len(data))
        tokens, length = core.pad_tokens(data, capacity)
        merges = jnp.full((M, 3), core.PAD, jnp.int32)
        occupancy = jnp.zeros((M,), jnp.int32)
        k = jnp.int32(0)

    k_host = 0
    length_host = len(data)
    while k_host < M and length_host >= 2:
        rounds = min(chunk_rounds, M - k_host)
        with (stats or TimeStats.null()).phase("merge_rounds"):
            tokens, length, merges, occupancy, k = _train_chunk(
                tokens, length, merges, occupancy, k,
                vocab_size=vocab_size, max_rounds=rounds,
            )
            length_host = int(length)
            prev_k, k_host = k_host, int(k)

        if verbose:
            mg = np.asarray(merges[prev_k:k_host])
            oc = np.asarray(occupancy[prev_k:k_host])
            for j in range(k_host - prev_k):
                # exact reference format (basic_tokenizer.zig:308-317)
                print(
                    f"merge {prev_k + j + 1}/{M}: ({mg[j, 0]},{mg[j, 1]}) -> "
                    f"{mg[j, 2]} had {oc[j]} occurrences"
                )

        # Shrink: corpus only ever compacts; halve padded capacity when the
        # valid prefix fits, so later rounds stream less HBM.
        while shrink and capacity > MIN_CAPACITY and length_host <= capacity // 2:
            capacity //= 2
            tokens = tokens[:capacity]

    if k_host < M and length_host < 2:
        # reference early-stop notice (basic_tokenizer.zig:188-191)
        print("No more pairs to merge. Stopping early.")

    out = np.asarray(merges[:k_host])
    return [tuple(int(v) for v in row) for row in out]
