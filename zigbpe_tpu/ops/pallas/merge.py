"""Pallas TPU kernel: one fused greedy-merge + row-local compaction pass.

This is the Stage-2 hot-path kernel (SURVEY.md §7): the device analogue of
the reference's ``replaceTopPairWithNewToken`` (basic_tokenizer.zig:207-232)
— one leftmost-greedy pass replacing pair (a, b) with ``new_token`` and the
partner slot killed — done in a SINGLE streaming pass over HBM.

Why a kernel at all: measured on this backend (true device sync), the XLA
formulation costs ~29 ms per round at 8Mi tokens (cummax parity scan ~12 ms
+ stable-sort compaction ~17 ms), because scans and sorts are multi-pass
over HBM. The token stream at 8Mi tokens is only 32 MB — speed-of-light for
read+write is ~0.1 ms. This kernel streams each block exactly once.

Layout contract — **row-local prefixes** (the key design choice): the token
array is a sequence of 128-lane ROWS, each of which is a valid-token prefix
with a PAD tail. The LOGICAL stream is the concatenation of the row
prefixes. Compaction after a merge is then WITHIN-ROW only — tokens never
cross row boundaries — which caps the bit-move shift at 127 (<= 7 gated
steps) and lets the destination scan run as ONE MXU matmul (killed-mask @
strict-upper-triangular ones) instead of a ~30-op Kogge-Stone scan. An
earlier revision kept 32K-element block-local prefixes: its block-wide
compaction (full dest scan + up to 15 bit-move steps) was ~60% of the
kernel's VPU work (measured 6.5 ms/pass at 33.5M tokens vs the 1.4 ms
streaming floor); row-local halves that. Trainers re-establish a single
global prefix only when they need one (shrink / checkpoint), with one
stable sort (ops.core.compact_stream) — a global prefix is itself a valid
row-local layout.

Row-local invariants the trainers maintain:

* Every row that precedes a row with valid tokens is non-empty (an empty
  interior row would break next-row adjacency peeking). A merge round can
  empty a row only if the row entered it with < 2 tokens, so the kernel
  reports ``min_kept`` (the smallest post-round population of any INTERIOR
  non-empty input row — the stream's last non-empty row has no valid
  successor and is excluded via a one-block deferral, so a legitimately
  small tail row never triggers) and the trainer globally recompacts when
  it drops to <= 1. Text-like corpora hold ~90+ tokens per 128-byte row
  after 1K merges; the flag exists for degenerate (e.g. single-byte)
  corpora.
* Within a row, valid positions are exactly [0, Lr): a token's within-row
  logical rank is its lane index; whole-stream ranks (needed only for the
  a == b parity scan) add an exclusive row-population prefix.

Per (R, 128) grid block, sequential grid (one TensorCore — grids execute
in order), carries in SMEM:

* **Hits**: candidate mask c[r,j] = (t[r,j]==a) & (next[r,j]==b), where
  next is the within-row shift except at each row's last valid slot, which
  peeks slot 0 of the NEXT row (in-block: a sublane shift of the row heads;
  across blocks: the secondary input ref). For a != b candidates cannot
  overlap, so hits = c. For a == b, leftmost-greedy picks alternate members
  of each candidate run (reference semantics ``aaa`` -> ``[X, a]``):
  hit = c & odd(rank - rank of last non-candidate), via a flat max-scan
  over LOGICAL ranks (PAD slots transparent) plus a scalar carry.
* A hit on a row's edge pair writes the new token locally and kills the
  next row's head (in-block: a sublane-shifted mask; across blocks: a
  kill-first carry).
* **Compaction** (within-row): keep = alive & ~killed; shift = exclusive
  prefix count of killed within the row — ONE bf16 MXU matmul (exact for
  counts <= 128) — and kept elements move by the monotone packed bit-move
  (shift << 16 | value), step 2^s gated on the block's max row-kills, so
  sparse rounds pay O(log max-kills) steps with within-row shifts only.

The kernel returns (tokens', stats[nhits, new_length, min_kept]) with
tokens' aliasing the input; untouched blocks are never written. It is
logically bit-exact vs ops.core.merge_pass on the logical stream (tested
via interpret mode on CPU and compiled on TPU against the oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = -1
LANES = 128
NEG = -(2**31) + 1  # python int: kernels must not capture traced constants
BIG = 2**31 - 1


# ---------------------------------------------------------------------------
# Flat-order helpers on (R, 128) tiles (row-major == flat order). All shifts
# are STATIC so they lower to lane/sublane concatenates, which Mosaic
# supports (no cumsum/cummax/roll primitives needed). Still used by the
# a == b parity path here and by the encode kernel.
# ---------------------------------------------------------------------------


def _shift_right_flat(x, s: int, fill):
    """y[j] = x[j - s] in flat row-major order; first s elements = fill."""
    R, C = x.shape
    sd, sm = divmod(s, C)

    def rows_down(v, k):
        if k == 0:
            return v
        if k >= R:
            return jnp.full_like(v, fill)
        return jnp.concatenate([jnp.full((k, C), fill, v.dtype), v[:-k, :]], axis=0)

    if sm == 0:
        return rows_down(x, sd)
    a = rows_down(x, sd)      # contributes lanes >= sm
    b = rows_down(x, sd + 1)  # contributes lanes < sm (wrapped from prev row)
    a = jnp.concatenate([jnp.full((R, sm), fill, x.dtype), a[:, :-sm]], axis=1)
    b = jnp.concatenate([b[:, C - sm :], jnp.full((R, C - sm), fill, x.dtype)], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    return jnp.where(col >= sm, a, b)


def _shift_left_flat(x, s: int, fill):
    """y[j] = x[j + s] in flat row-major order; last s elements = fill."""
    R, C = x.shape
    sd, sm = divmod(s, C)

    def rows_up(v, k):
        if k == 0:
            return v
        if k >= R:
            return jnp.full_like(v, fill)
        return jnp.concatenate([v[k:, :], jnp.full((k, C), fill, v.dtype)], axis=0)

    if sm == 0:
        return rows_up(x, sd)
    a = rows_up(x, sd)
    b = rows_up(x, sd + 1)
    a = jnp.concatenate([a[:, sm:], jnp.full((R, sm), fill, x.dtype)], axis=1)
    b = jnp.concatenate([jnp.full((R, C - sm), fill, x.dtype), b[:, :sm]], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    return jnp.where(col >= C - sm, b, a)


def _scan_flat(x, op, fill):
    """Inclusive prefix-``op`` over flat row-major order (two-level scan).

    ``fill`` must be the identity of ``op``, which lets the shifted-in fill
    rows/lanes act as neutral elements (no iota masks needed). Row-level
    work runs on full-width (R, C) broadcasts — Mosaic rejects (R, 1)
    vector concats ("offset mismatch on non-concat dimension").
    """
    R, C = x.shape
    s = 1
    while s < C:  # lane-level Kogge-Stone within rows
        shifted = jnp.concatenate([jnp.full((R, s), fill, x.dtype), x[:, :-s]], axis=1)
        x = op(x, shifted)
        s *= 2
    # exclusive scan over row totals, broadcast across lanes
    totals = jnp.broadcast_to(x[:, C - 1 :], (R, C))
    t = jnp.concatenate([jnp.full((1, C), fill, x.dtype), totals[:-1, :]], axis=0)
    s = 1
    while s < R:
        shifted = jnp.concatenate([jnp.full((s, C), fill, t.dtype), t[:-s, :]], axis=0)
        t = op(t, shifted)
        s *= 2
    return op(x, t)


def _max_scan_flat(x):
    return _scan_flat(x, jnp.maximum, NEG)


def _sum_scan_flat(x):
    return _scan_flat(x, jnp.add, jnp.int32(0))


def _row_prefix_killed(killed):
    """Exclusive within-row prefix count of ``killed`` as ONE MXU matmul:
    kf @ strict-upper-triangular ones, f32 in / f32 accumulate (exact for
    counts <= 128; f32 keeps the (8,128) tiling — Mosaic rejects the
    i1 -> bf16 (16,128) relayout)."""
    R, C = killed.shape
    kf = killed.astype(jnp.float32)
    rk = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    ut = (rk < ck).astype(jnp.float32)
    return jax.lax.dot_general(
        kf, ut, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)


def _compact_rows_bitmove(written, keep, shift, mrk, work_ref):
    """Within-row stable compaction: kept element at lane c moves left by
    ``shift[r, c]`` (its exclusive killed-prefix, monotone per row, < 128).
    The (value, remaining-shift) pair is PACKED into one int32
    (shift << 16 | value; values are u16 tokens — the vocab cap is 65536
    (basic_tokenizer.zig:140)); packed < 0 marks a hole. Step 2^s runs only
    when ``mrk`` (the block's max row-kills) >= 2^s — sparse rounds pay
    O(log max-kills) steps — and every shift is WITHIN-ROW (one lane
    concat), never a flat shift."""
    R, C = written.shape
    work_ref[:] = jnp.where(keep, (shift << 16) | (written & 0xFFFF), -1)
    s = 1
    while s < C:

        @pl.when(mrk >= s)
        def _step(s=s):
            p = work_ref[:]
            incoming = jnp.concatenate(
                [p[:, s:], jnp.full((R, s), -1, jnp.int32)], axis=1
            )
            moving_in = (incoming >= 0) & (((incoming >> 16) & s) != 0)
            staying = (p >= 0) & (((p >> 16) & s) == 0)
            work_ref[:] = jnp.where(
                moving_in, incoming - (s << 16), jnp.where(staying, p, -1)
            )

        s *= 2
    packed = work_ref[:]
    return jnp.where(packed >= 0, packed & 0xFFFF, PAD)


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _merge_kernel(
    scalars,      # SMEM int32[K*3]: K (a, b, new_token) slots [scalar
                  #   prefetch]; a disabled slot is (-2, -2, -2)
    tok_ref,      # VMEM window: (R+8, 128) when G > 1 (own block + next
                  #   block's head rows, element-indexed overlap) else (R, 128)
    out_ref,      # ANY  (rows, 128) full output in HBM (aliases the input)
    stats_ref,    # SMEM int32[K+2]: (nhits_0..K-1, new_length, min_kept)
    work,         # VMEM (R, 128) scratch: bit-move staging
    obuf,         # VMEM (2R, 128) double-buffered output staging
    carry,        # SMEM int32[9+K]: see _init
    sem,          # DMA semaphore array (2,) for output copies
    *,
    R: int,
    K: int = 1,
):
    i = pl.program_id(0)
    G = pl.num_programs(0)

    # The window is element-indexed [i*R, i*R+R+8) — its first R rows are
    # this block and row R holds the next block's head — EXCEPT the last
    # block, whose window is clamped back to [rows-R-8, rows): its block
    # rows sit at [8, R+8) and it has no successor to peek. A single input
    # operand (instead of a second view of the token buffer) is what lets
    # the input/output alias run in place; a second operand forced XLA to
    # copy the whole stream every pass (+2.2 ms at 33.5M tokens).
    if G > 1:
        last = i == G - 1
        tok = jnp.where(last, tok_ref[8 : R + 8, :], tok_ref[:R, :])
        peek = jnp.where(last, jnp.int32(PAD), tok_ref[R, 0])
    else:
        tok = tok_ref[:]
        peek = jnp.int32(PAD)

    @pl.when(i == 0)
    def _init():
        carry[0] = NEG      # logical rank of the last non-candidate position
        carry[1] = 0        # kill-head carry for this block's row 0
        carry[2] = 0        # logical rank offset (sum of earlier block pops)
        carry[3] = 0        # (unused; kept for layout stability)
        carry[4] = 0        # total kept (new logical length)
        carry[5] = BIG      # min kept over INTERIOR non-empty rows
        carry[6] = 0        # copy in flight on obuf slot 0?
        carry[7] = 0        # copy in flight on obuf slot 1?
        carry[8] = BIG      # kept of the last non-empty row seen (deferred)
        for m in range(K):
            carry[9 + m] = 0  # per-member hit counts

    # Member 0 may have a == b (overlap-parity semantics); members 1..K-1
    # are guaranteed a != b, pairwise chain-free (no b_i == a_j), distinct,
    # and never reference a member's minted token — the selection layer
    # enforces this (core.train_chunk_lazy group building), which is what
    # makes simultaneous application equal to sequential replay (the same
    # argument as ops/pallas/encode.py group_merges).
    mem = [(scalars[3 * m], scalars[3 * m + 1], scalars[3 * m + 2])
           for m in range(K)]
    a, b, new_tok = mem[0]

    valid = tok >= 0
    L = jnp.sum(valid.astype(jnp.int32))

    slot = i % 2

    def store_block(value):
        """Write this block's new content: stage in the slot's VMEM buffer
        and fire an async copy to the block's (aligned) HBM slot — never
        waited here; the wait happens when the slot is reused two blocks
        later, so the copy hides behind the next block's compute."""

        @pl.when(carry[6 + slot] == 1)
        def _drain():
            pltpu.make_async_copy(
                obuf.at[pl.ds(slot * R, R), :],
                out_ref.at[pl.ds(0, R), :],
                sem.at[slot],
            ).wait()

        obuf[pl.ds(slot * R, R), :] = value
        pltpu.make_async_copy(
            obuf.at[pl.ds(slot * R, R), :],
            out_ref.at[pl.ds(i * R, R), :],
            sem.at[slot],
        ).start()
        carry[6 + slot] = 1

    # Blocks whose content is unchanged (all-PAD tail, or no hits and no
    # kill carry) are never written at all: the output aliases the input,
    # so their bytes are already correct — late sparse rounds write only
    # the handful of blocks they actually touch.
    #
    # Presence fast path: a block can only contain a candidate if token
    # ``a`` occurs in it AND ``b`` occurs in it or at the next block's head.
    # Late training rounds merge RARE (recently minted) tokens, so most
    # blocks fail this test and pay ~6 ops instead of the full ~35-op
    # machinery. Skipping the min_kept fold is safe: populations are
    # unchanged, and every interior row entered the round with >= 2 tokens
    # (the trainer recompacts whenever min_kept drops to <= 1), so an
    # unchanged row can never be the one that trips the flag.
    full = carry[1] == 1
    for m in range(K):
        am, bm, _ = mem[m]
        has_a = jnp.any(valid & (tok == am))
        has_b = jnp.any(valid & (tok == bm)) | (peek == bm)
        full = full | (has_a & has_b)

    def _fold_deferred():
        # This block is non-empty, so the deferred row (last non-empty row of
        # the last block that computed populations) is INTERIOR — fold it into
        # min_kept now. This block's own rows are unchanged by a skip/idle
        # path: its interior rows entered the round with >= 2 tokens (the
        # trainer recompacts at min_kept <= 1) so they can't trip the flag,
        # and its last non-empty row either stays the stream tail (excluded
        # by design) or is folded as >= 2-safe the same way. Resetting the
        # deferral to BIG is therefore sound.
        carry[5] = jnp.minimum(carry[5], carry[8])
        carry[8] = BIG

    def _skip():
        _fold_deferred()
        carry[0] = carry[2] + L - 1  # all tokens are non-candidates
        carry[2] = carry[2] + L
        carry[4] = carry[4] + L

    def _process():
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)

        # next view: within-row shift; each row's last valid slot peeks the
        # next row's head (row-local prefix invariant: a non-empty
        # successor's slot 0 is valid; an all-PAD successor yields PAD and
        # kills the candidate). The block's last row peeks the next block.
        nxt_in = jnp.concatenate(
            [tok[:, 1:], jnp.full((R, 1), PAD, tok.dtype)], axis=1
        )
        heads = jnp.broadcast_to(tok[:, :1], (R, LANES))
        hn = jnp.concatenate(
            [heads[1:, :], jnp.full((1, LANES), PAD, tok.dtype)], axis=0
        )
        hn = jnp.where(row == R - 1, peek, hn)
        is_lastvalid = valid & (nxt_in < 0)
        nxt = jnp.where(is_lastvalid, hn, nxt_in)

        # member candidate masks: distinct chain-free pairs can never
        # produce overlapping or adjacent candidates (adjacency would force
        # b_i == a_j), so the union resolves with member-0 parity alone
        cands = []
        cand_any = None
        for m in range(K):
            am, bm, _ = mem[m]
            cm = valid & (tok == am) & (nxt == bm) & (nxt >= 0)
            cands.append(cm)
            cand_any = cm if cand_any is None else (cand_any | cm)
        ncand = jnp.sum(cand_any.astype(jnp.int32))
        act = (ncand > 0) | (carry[1] == 1)

        # second fast path: pair tokens present but never adjacent (and no
        # kill carry) — the block is untouched; skip kills/compaction
        @pl.when(~act)
        def _idle():
            _fold_deferred()
            carry[0] = carry[2] + L - 1  # all tokens are non-candidates
            carry[2] = carry[2] + L
            carry[4] = carry[4] + L

        @pl.when(act)
        def _do_process():
            _process_act(cands, nxt_in, is_lastvalid, row, col)

    def _process_act(cands, nxt_in, is_lastvalid, row, col):
        rowpop = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)  # (R,1)

        # leftmost-greedy parity for a == b runs (reference ``aaa -> [X,a]``
        # semantics): logical ranks = exclusive row-population prefix + lane
        # index (valid slots are exactly [0, Lr) per row). PAD slots are
        # transparent (rank NEG) so runs span row boundaries correctly. For
        # a != b candidates cannot overlap: hits = candidates. (cond
        # branches yield int32 — Mosaic cannot yield i1 vectors.)
        def with_parity(c_mask):
            rp = jnp.broadcast_to(rowpop, (R, LANES))
            t = jnp.concatenate(
                [jnp.zeros((1, LANES), jnp.int32), rp[:-1, :]], axis=0
            )
            s = 1
            while s < R:  # exclusive row-population prefix (Kogge-Stone)
                t = t + jnp.concatenate(
                    [jnp.zeros((s, LANES), jnp.int32), t[:-s, :]], axis=0
                )
                s *= 2
            grank = carry[2] + t + col
            ncr = jnp.where((c_mask == 1) | ~valid, NEG, grank)
            last_nonc = jnp.maximum(_max_scan_flat(ncr), carry[0])
            hit32 = (
                (c_mask == 1) & (((grank - last_nonc) & 1) == 1)
            ).astype(jnp.int32)
            return hit32, jnp.maximum(carry[0], jnp.max(ncr))

        hit0_32, c0 = jax.lax.cond(
            a == b, with_parity, lambda c_mask: (c_mask, carry[0]),
            cands[0].astype(jnp.int32),
        )
        hits = [hit0_32 == 1] + cands[1:]
        hit = hits[0]
        for m in range(1, K):
            hit = hit | hits[m]
        hit32 = hit.astype(jnp.int32)

        # kills: within-row partner (lane shift), edge-hit partner (sublane
        # shift of per-row edge-hit flags), and the cross-block carry
        killed_in = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.int32), hit32[:, :-1]], axis=1
        )
        ehit = jnp.sum(
            (hit & is_lastvalid).astype(jnp.int32), axis=1, keepdims=True
        )  # (R,1)
        ke = jnp.broadcast_to(ehit, (R, LANES))
        ke = jnp.concatenate(
            [jnp.zeros((1, LANES), jnp.int32), ke[:-1, :]], axis=0
        )
        ke = jnp.where(row == 0, carry[1], ke)
        killed = ((killed_in == 1) | ((col == 0) & (ke >= 1))) & valid

        written = jnp.where(hits[0], new_tok, tok)
        for m in range(1, K):
            written = jnp.where(hits[m], mem[m][2], written)
        keep = valid & ~killed
        rowkills = jnp.sum(killed.astype(jnp.int32), axis=1, keepdims=True)
        nkilled = jnp.sum(rowkills)
        mrk = jnp.max(rowkills)

        nhits_blk = jnp.sum(hit32)

        # within-row compaction; with no kills ``written`` is already a
        # valid row-prefix layout. Untouched blocks skip the store entirely
        # (aliased output).
        @pl.when(nkilled > 0)
        def _do_compact():
            shift = _row_prefix_killed(killed)
            store_block(
                _compact_rows_bitmove(written, keep, shift, mrk, work)
            )

        @pl.when((nkilled == 0) & (nhits_blk > 0))
        def _no_compact():
            store_block(written)

        # min_kept folds the PREVIOUS non-empty row's population one step
        # deferred, so the stream's LAST non-empty row — which has no valid
        # successor and therefore cannot break adjacency peeking — is never
        # counted; a legitimate small tail row does not trigger spurious
        # recompaction. Interior rows of this block (all but its last
        # non-empty row) fold immediately.
        rowkept = rowpop - rowkills  # (R,1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        ne = rowpop > 0
        last_ne = jnp.max(jnp.where(ne, ridx, -1))
        m_abl = jnp.min(jnp.where(ne & (ridx != last_ne), rowkept, BIG))
        last_kept = jnp.max(jnp.where(ridx == last_ne, rowkept, NEG))

        carry[0] = c0
        carry[1] = jnp.sum(
            (hit & is_lastvalid & (row == R - 1)).astype(jnp.int32)
        )
        carry[2] = carry[2] + L
        carry[4] = carry[4] + (L - nkilled)
        carry[5] = jnp.minimum(carry[5], jnp.minimum(carry[8], m_abl))
        carry[8] = last_kept
        for m in range(K):
            carry[9 + m] = carry[9 + m] + jnp.sum(hits[m].astype(jnp.int32))

    # (plain defs above so _process can call _process_act: pl.when runs its
    # body immediately at trace time)
    pl.when((L > 0) & ~full)(_skip)
    pl.when((L > 0) & full)(_process)

    @pl.when(i == G - 1)
    def _finish():
        for s in range(2):

            @pl.when(carry[6 + s] == 1)
            def _wait(s=s):
                pltpu.make_async_copy(
                    obuf.at[pl.ds(s * R, R), :],
                    out_ref.at[pl.ds(0, R), :],
                    sem.at[s],
                ).wait()

        for m in range(K):
            stats_ref[m] = carry[9 + m]
        stats_ref[K] = carry[4]
        stats_ref[K + 1] = jnp.minimum(carry[5], jnp.int32(BIG))


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def merge_pass_pallas(
    tokens: jax.Array, first, second, new_token, *, block_rows: int = 256,
    interpret: bool = False,
):
    """Fused greedy merge + row-local compaction (single pair).

    ``tokens``: int32[N] in row-local prefix layout (a globally-compacted
    stream is a special case), N a multiple of block_rows*128. Returns
    (new_tokens, stats[nhits, new_length, min_kept]) in the same layout.
    Exact reference semantics on the logical stream
    (basic_tokenizer.zig:207-232), including ``aaa -> [X, a]``.
    """
    table = jnp.stack(
        [jnp.asarray(first, jnp.int32), jnp.asarray(second, jnp.int32),
         jnp.asarray(new_token, jnp.int32)]
    ).reshape(1, 3)
    return merge_pass_pallas_multi(
        tokens, table, block_rows=block_rows, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def merge_pass_pallas_multi(
    tokens: jax.Array, table: jax.Array, *, block_rows: int = 256,
    interpret: bool = False,
):
    """Apply up to K merges SIMULTANEOUSLY in one streaming pass.

    ``table``: int32[K, 3] of (first, second, new_token) slots; a disabled
    slot is (-2, -2, -2) (it can never match a token). The CALLER must
    guarantee the enabled slots form a valid simultaneous group: pairwise
    distinct pairs, chain-free in both directions (no b_i == a_j for
    i != j), no slot referencing another slot's minted token, and
    first != second for every slot except possibly slot 0 (which keeps
    the overlap-parity semantics). Under those conditions simultaneous
    application is bit-exact with applying the slots sequentially in
    index order (the group_merges argument, ops/pallas/encode.py:92-109)
    — this is what lets the trainer retire several argmax rounds per
    corpus pass (core.train_chunk_lazy).

    Returns (new_tokens, stats[K+2]) where stats[:K] are per-slot hit
    counts, stats[K] the new logical length, stats[K+1] min_kept.

    256-row blocks amortize the per-block fixed cost of the (inherently
    sequential — one TensorCore) grid.
    """
    N = tokens.shape[0]
    R = block_rows
    C = R * LANES
    if N % C:
        raise ValueError(f"capacity {N} must be a multiple of {C}")
    K = table.shape[0]
    G = N // C
    rows = N // LANES
    tok2d = tokens.reshape(rows, LANES)
    scalars = table.reshape(K * 3).astype(jnp.int32)

    # ONE element-indexed overlapping window per block: rows [i*R, i*R+R+8)
    # — this block plus the next block's head row (the adjacency peek). The
    # last block's window clamps back to [rows-R-8, rows); its 8-row overlap
    # with the previous block is DMA'd but never used, so the concurrent
    # in-flight write of that block's output is harmless. A single operand
    # (vs a second view of the same buffer) is what makes the input/output
    # alias truly in-place — see _merge_kernel's window comment.
    if G > 1:
        from jax._src.pallas.core import Element

        in_spec = pl.BlockSpec(
            (Element(R + 8), Element(LANES)),
            lambda i, *_: (
                pl.multiple_of(jnp.minimum(i * R, rows - R - 8), 8), 0
            ),
        )
    else:
        in_spec = pl.BlockSpec(
            (R, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[in_spec],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.int32),
            pltpu.VMEM((2 * R, LANES), jnp.int32),
            pltpu.SMEM((9 + K,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, stats = pl.pallas_call(
        functools.partial(_merge_kernel, R=R, K=K),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((K + 2,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # the output aliases the token input: untouched blocks (no hits, no
        # kills — the common case in late sparse rounds) are never copied,
        # their bytes are simply inherited
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scalars, tok2d)
    return out.reshape(N), stats
