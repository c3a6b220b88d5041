"""Data-parallel BPE training over a jax.sharding.Mesh.

The reference is single-threaded (SURVEY.md §2.2 — no parallelism exists to
port); this module is the TPU-native invention: the corpus is sharded
contiguously across a ``('data',)`` mesh axis, per-shard pair histograms are
``psum``-reduced over ICI each round, and the merge table stays replicated.
Results are **bit-identical** to single-chip training for any shard count:

* Every shard keeps its slice prefix-compacted; the global token sequence is
  the concatenation of shard prefixes.
* **Boundary pairs**: shard d owns the pair (its last valid token, the first
  valid token of the next non-empty shard), fetched via tiny all_gathers —
  so every global adjacent pair is counted exactly once (SURVEY.md §7 hard
  part 3).
* **Selection is lazy** (same architecture as ops.core.train_chunk_lazy): a
  REPLICATED upper-bound table is popped identically on every shard, and
  each batch of candidate bins is verified with one psum of shard-local
  exact counts — the only per-round collectives are O(batch + D) scalars,
  not a V^2 histogram.
* **Cross-shard greedy parity**: leftmost-greedy overlap resolution
  (basic_tokenizer.zig:207-232 semantics) runs on *global* pair indices: a
  cummax parity scan locally, with a carry-in equal to the max global index
  of a non-candidate pair in any earlier shard (SURVEY.md §7 hard part 1).
  A candidate run spanning shards therefore resolves exactly as on one chip.
* A boundary merge writes the new token into the left shard and kills the
  right shard's first token (flag exchanged via all_gather).
* Counting uses integer psum — deterministic, so the argmax + tie-break is
  bit-stable across any device count (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import core
from ..ops.core import PAD, VOCAB_START

Merge = Tuple[int, int, int]

AXIS = "data"


def data_mesh(devices=None) -> Mesh:
    """A 1-D ('data',) mesh over the given (default: all) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (AXIS,))


def _shard_pair_streams(tokens):
    """Per-shard (a, b, pair_valid, L, G) with the boundary pair included:
    shard d owns the pair (its last valid token, the first valid token of
    the next non-empty shard), exchanged via tiny all_gathers."""
    n = tokens.shape[0]
    D = jax.lax.axis_size(AXIS)
    d = jax.lax.axis_index(AXIS)
    idxs = jnp.arange(D, dtype=jnp.int32)
    j = jnp.arange(n, dtype=jnp.int32)

    valid_tok = tokens >= 0
    L = jnp.sum(valid_tok.astype(jnp.int32))
    lengths = jax.lax.all_gather(L, AXIS)          # [D] tiny
    firsts = jax.lax.all_gather(tokens[0], AXIS)   # [D] tiny
    nonempty = lengths > 0

    # First valid token of the next non-empty shard (the right halo).
    after = (idxs > d) & nonempty
    e_next = jnp.min(jnp.where(after, idxs, D))
    next_tok = jnp.where(e_next < D, firsts[jnp.minimum(e_next, D - 1)], PAD)

    # Global pair index offset: pairs of earlier shards come first.
    G = jnp.sum(jnp.where(idxs < d, lengths, 0))

    a = tokens
    b = jnp.roll(tokens, -1).at[-1].set(PAD)
    b = jnp.where(j == L - 1, next_tok, b)  # boundary pair at local slot L-1
    pair_valid = (a >= 0) & (b >= 0)
    return a, b, pair_valid, L, G


def init_ub_dp(tokens, *, vocab_size: int):
    """Replicated upper-bound table: psum of per-shard histograms
    (boundary pairs counted exactly once). Runs inside shard_map."""
    V = vocab_size
    a, b, pair_valid, _, _ = _shard_pair_streams(tokens)
    pid = jnp.where(pair_valid, a * V + b, V * V)
    hist = jnp.zeros((V * V,), jnp.int32).at[pid].add(1, mode="drop")
    return jax.lax.psum(hist, AXIS)


def _dp_select_lazy(ub, tokens, *, vocab_size: int, batch: int = 8):
    """Lazy batch-verified selection across shards: ub is replicated (every
    shard computes the identical pop sequence); exact verification counts
    are integer psums of shard-local counts — deterministic, so the
    argmax + tie-break is bit-stable for any device count (SURVEY.md §7
    hard part 2)."""
    V = vocab_size
    a, b, pair_valid, _, _ = _shard_pair_streams(tokens)
    pid_stream = jnp.where(pair_valid, a * V + b, -1)
    ids = jax.lax.broadcasted_iota(jnp.int32, ub.shape, 0)

    def round_(state):
        u, _, _, _ = state
        masked = u
        pids = []
        for _ in range(batch):
            c = jnp.max(masked)
            pid = jnp.max(jnp.where(masked == c, ids, -1))
            pids.append(pid)
            masked = masked.at[pid].set(-1)
        pids = jnp.stack(pids)
        local = jnp.stack(
            [jnp.sum((pid_stream == p).astype(jnp.int32)) for p in pids]
        )
        exact = jax.lax.psum(local, AXIS)
        u = u.at[pids].set(exact)
        c2 = jnp.max(u)
        pid2 = jnp.max(jnp.where(u == c2, ids, -1))
        verified = jnp.any(pids == pid2) | (c2 == 0)
        return u, pid2, c2, verified

    state = round_((ub, jnp.int32(-1), jnp.int32(0), jnp.bool_(False)))
    ub, pid, c, _ = jax.lax.while_loop(
        lambda s: ~s[3], round_, state
    )
    return pid // V, pid % V, c, ub


def _dp_round(tokens, ub, merges, occ, k, *, vocab_size: int):
    """One merge round on a shard of the corpus (runs inside shard_map)."""
    V = vocab_size
    n = tokens.shape[0]
    D = jax.lax.axis_size(AXIS)
    d = jax.lax.axis_index(AXIS)
    idxs = jnp.arange(D, dtype=jnp.int32)
    j = jnp.arange(n, dtype=jnp.int32)

    ta, tb, cnt, ub = _dp_select_lazy(ub, tokens, vocab_size=V)
    new_id = VOCAB_START + k

    a, b, pair_valid, L, G = _shard_pair_streams(tokens)
    valid_tok = tokens >= 0
    lengths = jax.lax.all_gather(L, AXIS)
    nonempty = lengths > 0

    # ---- greedy hits with global parity ----
    c = pair_valid & (a == ta) & (b == tb)
    gj = G + j
    real = j < L  # real pair slots of this shard (incl. boundary slot)
    lz_local = jax.lax.cummax(jnp.where(c, -1, gj))
    my_reset = jnp.max(jnp.where((~c) & real, gj, -1), initial=-1)
    resets = jax.lax.all_gather(my_reset, AXIS)    # [D] tiny
    carry_in = jnp.max(jnp.where(idxs < d, resets, -1), initial=-1)
    lz = jnp.maximum(lz_local, carry_in)
    hit = jnp.where(ta == tb, c & (((gj - lz) % 2) == 1), c)

    # ---- apply: write left, kill right (possibly across the boundary) ----
    boundary_hit = jnp.any(hit & (j == L - 1))
    bhits = jax.lax.all_gather(boundary_hit, AXIS)  # [D] tiny
    before = (idxs < d) & nonempty
    e_prev = jnp.max(jnp.where(before, idxs, -1), initial=-1)
    killed_first = (e_prev >= 0) & bhits[jnp.maximum(e_prev, 0)] & (L > 0)

    written = jnp.where(hit, new_id, tokens)
    killed = jnp.roll(hit, 1).at[0].set(False) | ((j == 0) & killed_first)
    keep = valid_tok & ~killed
    pos = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, n)
    tokens = jnp.full((n,), PAD, jnp.int32).at[pos].set(written, mode="drop")

    merges = merges.at[k].set(jnp.stack([ta, tb, new_id]))
    occ = occ.at[k].set(cnt)

    # ---- replicated ub maintenance (same derivation as train_chunk_lazy:
    # new (X, v) pairs sit where old (b, v) pairs were, (v, X) where (v, a),
    # (X, X) where (b, a); all capped by the global hit count) ----
    nhits = jax.lax.psum(jnp.sum(hit.astype(jnp.int32)), AXIS)
    u2 = ub.reshape(V, V)
    row_bound = jnp.minimum(jax.lax.dynamic_slice(u2, (tb, 0), (1, V)), nhits)
    col_bound = jnp.minimum(jax.lax.dynamic_slice(u2, (0, ta), (V, 1)), nhits)
    xx_bound = jnp.minimum(u2[tb, ta], nhits)
    u2 = u2.at[ta, tb].set(0)
    u2 = jax.lax.dynamic_update_slice(u2, row_bound, (new_id, 0))
    u2 = jax.lax.dynamic_update_slice(u2, col_bound, (0, new_id))
    u2 = u2.at[new_id, new_id].set(xx_bound)
    ub = u2.reshape(V * V)

    # psum (not a host-side sum of the gathered lengths) so the total carries
    # the replicated type through the while_loop
    total_len = jax.lax.psum(jnp.sum(keep.astype(jnp.int32)), AXIS)
    return tokens, ub, merges, occ, k + 1, total_len


def _dp_chunk(tokens, ub, merges, occ, k, *, vocab_size: int, max_rounds: int):
    """Up to max_rounds rounds inside one shard_map body (while_loop)."""
    M = merges.shape[0]
    target = jnp.minimum(k + max_rounds, M)
    total0 = jax.lax.psum(jnp.sum((tokens >= 0).astype(jnp.int32)), AXIS)

    def cond(state):
        _, _, _, _, kk, total = state
        return (kk < target) & (total >= 2)

    def body(state):
        toks, u, mg, oc, kk, _ = state
        toks, u, mg, oc, kk, total = _dp_round(
            toks, u, mg, oc, kk, vocab_size=vocab_size
        )
        return toks, u, mg, oc, kk, total

    toks, u, mg, oc, kk, total = jax.lax.while_loop(
        cond, body, (tokens, ub, merges, occ, k, total0)
    )
    return toks, u, mg, oc, kk, total


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "max_rounds", "mesh"),
    donate_argnums=(0, 1, 2, 3),
)
def _dp_chunk_jit(tokens, ub, merges, occ, k, *, vocab_size, max_rounds, mesh):
    fn = jax.shard_map(
        functools.partial(_dp_chunk, vocab_size=vocab_size, max_rounds=max_rounds),
        mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P(), P()),
        out_specs=(P(AXIS), P(), P(), P(), P(), P()),
    )
    return fn(tokens, ub, merges, occ, k)


@functools.partial(jax.jit, static_argnames=("vocab_size", "mesh"))
def _init_ub_jit(tokens, *, vocab_size, mesh):
    fn = jax.shard_map(
        functools.partial(init_ub_dp, vocab_size=vocab_size),
        mesh=mesh,
        in_specs=(P(AXIS),),
        out_specs=P(),
    )
    return fn(tokens)


def shard_corpus(data: bytes, mesh: Mesh, per_shard_capacity: Optional[int] = None):
    """Place contiguous corpus slices into per-shard PAD-tailed prefixes.

    Returns a [D * per_shard_capacity] int32 array sharded over the mesh.
    """
    D = mesh.devices.size
    n = len(data)
    per = (n + D - 1) // D
    if per_shard_capacity is None:
        per_shard_capacity = max(256, 1 << (per - 1).bit_length())
    if per > per_shard_capacity:
        raise ValueError(f"shard slice {per} exceeds capacity {per_shard_capacity}")
    buf = np.full((D, per_shard_capacity), PAD, dtype=np.int32)
    arr = np.frombuffer(data, dtype=np.uint8)
    for d in range(D):
        piece = arr[d * per : (d + 1) * per]
        buf[d, : len(piece)] = piece
    flat = buf.reshape(-1)
    return jax.device_put(flat, NamedSharding(mesh, P(AXIS)))


def train_dp(
    data: bytes,
    vocab_size: int,
    mesh: Optional[Mesh] = None,
    chunk_rounds: int = 64,
    verbose: bool = False,
) -> List[Merge]:
    """Data-parallel training; merge-order identical to single-chip/oracle."""
    if vocab_size < VOCAB_START:
        raise ValueError(f"vocab_size must be >= 256, got {vocab_size}")
    if vocab_size > 8192:
        # the replicated dense ub table is V^2 int32 per device; past 8192
        # use the single-chip sorted path or raise the corpus per shard
        raise ValueError(
            f"train_dp supports vocab_size <= 8192 (dense replicated ub); got {vocab_size}"
        )
    M = vocab_size - VOCAB_START
    if M == 0 or len(data) < 2:
        return []
    mesh = mesh or data_mesh()

    tokens = shard_corpus(data, mesh)
    rep = NamedSharding(mesh, P())
    ub = _init_ub_jit(tokens, vocab_size=vocab_size, mesh=mesh)
    merges = jax.device_put(jnp.full((M, 3), PAD, jnp.int32), rep)
    occ = jax.device_put(jnp.zeros((M,), jnp.int32), rep)
    k = jax.device_put(jnp.int32(0), rep)

    k_host, total_host = 0, len(data)
    while k_host < M and total_host >= 2:
        rounds = min(chunk_rounds, M - k_host)
        tokens, ub, merges, occ, k, total = _dp_chunk_jit(
            tokens, ub, merges, occ, k, vocab_size=vocab_size, max_rounds=rounds, mesh=mesh
        )
        kt = np.asarray(jnp.stack([k, total]))  # one host round-trip
        prev_k, k_host, total_host = k_host, int(kt[0]), int(kt[1])
        if verbose:
            mg = np.asarray(merges[prev_k:k_host])
            oc = np.asarray(occ[prev_k:k_host])
            for i in range(k_host - prev_k):
                print(
                    f"merge {prev_k + i + 1}/{M}: ({mg[i, 0]},{mg[i, 1]}) -> "
                    f"{mg[i, 2]} had {oc[i]} occurrences"
                )

    if k_host < M and total_host < 2:
        print("No more pairs to merge. Stopping early.")

    out = np.asarray(merges[:k_host])
    return [tuple(int(v) for v in row) for row in out]
