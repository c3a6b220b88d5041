"""Batched padded-sequence encode — the serving-path API.

The reference encodes one global byte sequence at a time with an O(n²·m)
scan (basic_tokenizer.zig:71-88). For throughput serving (BASELINE.json
config 3: "apply frozen merge table to 1GB corpus, batched padded
sequences") the TPU-native shape is a [B, L] batch of PAD-padded rows: each
merge is one vectorized greedy pass over the whole batch (rows are
independent), scanned over the merge table. Compaction is a per-row
stable sort on a dead key (XLA scatter serializes at ~0.14 Ge/s on this
backend; lax.sort along the last axis compacts every row at once).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import PAD


def pad_batch(docs, length: int | None = None):
    """Host->device: list of byte strings -> (int32[B, L] PAD-padded,
    int32[B] lengths)."""
    B = len(docs)
    L = length or max((len(d) for d in docs), default=1)
    buf = np.full((B, max(L, 1)), PAD, dtype=np.int32)
    lens = np.zeros((B,), dtype=np.int32)
    for i, d in enumerate(docs):
        if len(d) > buf.shape[1]:
            raise ValueError(f"doc {i} length {len(d)} exceeds row length {buf.shape[1]}")
        buf[i, : len(d)] = np.frombuffer(bytes(d), dtype=np.uint8)
        lens[i] = len(d)
    return jnp.asarray(buf), jnp.asarray(lens)


def _batch_merge_pass(tokens: jax.Array, first, second, new_token):
    """One greedy pass over every row of a [B, L] batch (reference
    basic_tokenizer.zig:207-232 semantics per row)."""
    B, L = tokens.shape
    a = tokens
    b = jnp.roll(tokens, -1, axis=1).at[:, -1].set(PAD)
    c = (b >= 0) & (a == first) & (b == second)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    last_zero = jax.lax.cummax(jnp.where(c, -1, col), axis=1)
    parity_hit = c & (((col - last_zero) % 2) == 1)
    hit = jnp.where(first == second, parity_hit, c)

    written = jnp.where(hit, new_token, tokens)
    killed = jnp.roll(hit, 1, axis=1).at[:, 0].set(False)
    keep = (tokens >= 0) & ~killed
    key = jnp.where(keep, jnp.int32(0), jnp.int32(1))
    _, out = jax.lax.sort(
        (key, jnp.where(keep, written, PAD)), num_keys=1, is_stable=True
    )
    return out


def encode_batch(tokens: jax.Array, merges: jax.Array):
    """Replay the (M, 3) merge table over a [B, L] batch; PAD rows in the
    table are no-ops. Returns (tokens, lengths) with rows prefix-compacted."""

    def step(toks, mrow):
        ta, tb, new_id = mrow[0], mrow[1], mrow[2]
        toks = jax.lax.cond(
            new_id >= 0, lambda t: _batch_merge_pass(t, ta, tb, new_id), lambda t: t, toks
        )
        return toks, None

    toks, _ = jax.lax.scan(step, tokens, merges)
    return toks, jnp.sum((toks >= 0).astype(jnp.int32), axis=1)
