"""Pallas TPU kernel: one fused greedy-merge + block-local compaction pass.

This is the Stage-2 hot-path kernel (SURVEY.md §7): the device analogue of
the reference's ``replaceTopPairWithNewToken`` (basic_tokenizer.zig:207-232)
— one leftmost-greedy pass replacing pair (a, b) with ``new_token`` and the
partner slot killed — done in a SINGLE streaming pass over HBM.

Why a kernel at all: measured on this backend (true device sync), the XLA
formulation costs ~29 ms per round at 8Mi tokens (cummax parity scan ~12 ms
+ stable-sort compaction ~17 ms), because scans and sorts are multi-pass
over HBM. The token stream at 8Mi tokens is only 32 MB — speed-of-light for
read+write is ~0.1 ms. This kernel streams each block exactly once.

Layout contract — **block-local prefixes** (the key design choice): the
token array is a sequence of (R*128)-element blocks, each of which is a
valid-token prefix with a PAD tail. The LOGICAL stream is the concatenation
of the block prefixes. The kernel compacts each block locally and writes it
back to its own (aligned, pipeline-DMA'd) slot; tokens never migrate across
blocks, so there is no staging ring, no unaligned stores, and no flush
bookkeeping — an earlier design that maintained a single global prefix paid
~40% of its VPU work rotating and staging compacted data into a ring buffer.
Trainers re-establish a single global prefix only when they need one
(shrink / checkpoint), with one cheap stable sort (ops.core.compact_stream).

Block-local invariants the trainers maintain:

* Every block that precedes a block with valid tokens is non-empty (an
  empty interior block would break next-block adjacency peeking). A merge
  round can empty a block only if the block entered it with < 2 tokens, so
  the kernel reports ``min_kept`` (the smallest post-round population of any
  INTERIOR non-empty input block — the last non-empty block has no valid
  successor and is excluded, so a legitimately small tail block never
  triggers) and the trainer globally recompacts when it drops
  to <= 1 — for text-like corpora this effectively never fires, because the
  shrink schedule recompacts long before any block drains.
* Within a block, valid positions are exactly [0, L): a token's logical
  rank is its flat index plus the carry of earlier block populations, which
  makes the leftmost-greedy parity indices free (no rank scan needed).

Per (R, 128) block, sequential grid (one TensorCore — grids execute in
order), carries in SMEM:

* **Hits**: candidate mask c[j] = (t[j]==a) & (next[j]==b), where next[j]
  is t[j+1] except at the block's last valid slot, which peeks slot 0 of
  the next block (8-row secondary input ref). For a != b candidates cannot
  overlap, so hits = c. For a == b, leftmost-greedy picks alternate members
  of each candidate run (reference semantics ``aaa`` -> ``[X, a]``):
  hit[j] = c[j] & odd(rank j - rank of last non-candidate), via an in-block
  max-scan over logical ranks combined with a scalar carry.
* A hit on the block-edge pair writes the new token locally and sends a
  kill-first carry to the next block (whose slot 0 is the partner).
* **Compaction** (local): keep = alive & ~killed; dest = exclusive cumsum;
  kept elements move by the monotone bit-move — for each bit 2^b of the
  shift (j - dest[j], non-decreasing in j), elements whose shift has that
  bit move left by 2^b; every partial step is collision-free. The shift is
  bounded by the block's kill count, so step 2^b runs (as a pl.when branch)
  only when the block killed >= 2^b slots: sparse rounds pay O(log kills).

The kernel returns (tokens', stats[nhits, new_length, min_kept]) with
tokens' aliasing the input. It is logically bit-exact vs ops.core.merge_pass
(tested via interpret mode on CPU and compiled on TPU against the oracle).
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


# ---------------------------------------------------------------------------
# In-block flat-order primitives on (R, 128) tiles (row-major == flat order).
# All shifts are STATIC so they lower to lane/sublane concatenates, which
# Mosaic supports (no cumsum/cummax/roll primitives needed).
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


def _compact_bitmove(val, keep, dest, nkilled, work_ref):
    """Move kept elements to their dest (exclusive cumsum of keep) — stable
    stream compaction in log2(C) collision-free steps, staged through the
    ``work_ref`` VMEM scratch. Dropped slots -> PAD.

    The (value, remaining-shift) pair is PACKED into one int32
    (shift << 16 | value; values are u16 tokens — the vocab cap is 65536
    (basic_tokenizer.zig:140) — and shifts < 2^15) so each step moves one
    array instead of two; packed < 0 marks a hole.

    Every element's shift (= number of dropped slots before it) is bounded
    by ``nkilled``, the block's kill count, so step 2^b only runs when
    ``nkilled >= 2^b`` — sparse rounds (few kills) pay O(log nkilled)
    steps, not O(log C). Steps are ``pl.when`` stores (real branches;
    Mosaic cannot lower scalar-predicated vector selects)."""
    R, C = val.shape
    n = R * C
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    )
    work_ref[:] = jnp.where(keep, ((idx - dest) << 16) | (val & 0xFFFF), -1)
    b = 1
    while b < n:

        @pl.when(nkilled >= b)
        def _step(b=b):
            p = work_ref[:]
            incoming = _shift_left_flat(p, b, -1)
            moving_in = (incoming >= 0) & (((incoming >> 16) & b) != 0)
            staying = (p >= 0) & (((p >> 16) & b) == 0)
            work_ref[:] = jnp.where(
                moving_in, incoming - (b << 16), jnp.where(staying, p, -1)
            )

        b *= 2
    packed = work_ref[:]
    return jnp.where(packed >= 0, packed & 0xFFFF, PAD)


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _merge_kernel(
    scalars,      # SMEM int32[3]: (a, b, new_token)   [scalar prefetch]
    tok_ref,      # VMEM (R, 128) current block
    nxt_ref,      # VMEM (8, 128) first rows of next block (clamped at end)
    out_ref,      # ANY  (rows, 128) full output in HBM (aliases the input)
    stats_ref,    # SMEM int32[3]: (nhits, new_length, min_kept)
    work,         # VMEM (R, 128) scratch: bit-move staging
    obuf,         # VMEM (2R, 128) double-buffered output staging
    carry,        # SMEM int32[8]: see _init
    sem,          # DMA semaphore array (2,) for output copies
    *,
    R: int,
):
    C = R * LANES
    i = pl.program_id(0)
    G = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        carry[0] = NEG      # logical rank of the last non-candidate pair
        carry[1] = 0        # kill-first flag for this block
        carry[2] = 0        # logical rank offset (sum of earlier block pops)
        carry[3] = 0        # total hits
        carry[4] = 0        # total kept (new logical length)
        carry[5] = 0x7FFFFFFF  # min kept over INTERIOR non-empty blocks
        carry[6] = 0        # copy in flight on obuf slot 0?
        carry[7] = 0        # copy in flight on obuf slot 1?
        carry[8] = 0x7FFFFFFF  # kept of the previous non-empty block

    a = scalars[0]
    b = scalars[1]
    new_tok = scalars[2]

    tok = tok_ref[:]
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
    @pl.when(L > 0)
    def _process():
        nxt = _shift_left_flat(tok, 1, jnp.int32(PAD))
        # the pair of the last valid slot peeks slot 0 of the next block
        # (block-local prefix invariant: a non-empty successor's slot 0 is
        # valid; an all-PAD successor yields PAD and kills the candidate)
        edge_second = jnp.where(i == G - 1, jnp.int32(PAD), nxt_ref[0, 0])
        is_lastvalid = valid & (nxt < 0)
        nxt2 = jnp.where(is_lastvalid, edge_second, nxt)

        cand = valid & (tok == a) & (nxt2 == b) & (nxt2 >= 0)

        # leftmost-greedy parity for a == b runs: logical pair ranks are
        # carry[2] + flat index (valid slots are exactly [0, L) — free
        # ranks). For a != b candidates cannot overlap: hits = candidates.
        # (cond branches yield int32 — Mosaic cannot yield i1 vectors)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        rank = carry[2] + row * LANES + col

        def with_parity(c_mask):
            non_cand_rank = jnp.where(c_mask == 1, NEG, rank)
            last_nonc = jnp.maximum(_max_scan_flat(non_cand_rank), carry[0])
            return ((c_mask == 1) & (((rank - last_nonc) & 1) == 1)).astype(
                jnp.int32
            )

        hit = jax.lax.cond(
            a == b, with_parity, lambda c_mask: c_mask, cand.astype(jnp.int32)
        ) == 1

        # kills: partner of an in-block hit, or the kill-first carry
        # (shift in int32 — Mosaic cannot shift/concat i1 vectors)
        killed = _shift_right_flat(hit.astype(jnp.int32), 1, 0) == 1
        killed = killed | ((row * LANES + col == 0) & (carry[1] == 1))

        written = jnp.where(hit, new_tok, tok)
        keep = valid & ~killed
        kept = jnp.sum(keep.astype(jnp.int32))
        nhits_blk = jnp.sum(hit.astype(jnp.int32))
        nkilled = jnp.sum(killed.astype(jnp.int32))

        # local compaction back to a block prefix; with no kills `written`
        # is already one (PAD only ever in the block tail). Untouched
        # blocks skip the store entirely (aliased output).
        @pl.when(nkilled > 0)
        def _do_compact():
            dest = _sum_scan_flat(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
            store_block(_compact_bitmove(written, keep, dest, nkilled, work))

        @pl.when((nkilled == 0) & (nhits_blk > 0))
        def _no_compact():
            store_block(written)

        # carries: parity rank (non-candidates only), edge-hit kill-first,
        # rank offset, totals, min population. min_kept folds the PREVIOUS
        # non-empty block's population (deferred one block), so the LAST
        # non-empty block — which has no valid successor and therefore
        # cannot break adjacency peeking — is never counted; a legitimate
        # small tail block does not trigger spurious recompaction.
        carry[0] = jnp.maximum(
            carry[0], jnp.max(jnp.where(cand | (rank >= carry[2] + L), NEG, rank))
        )
        carry[1] = jnp.sum((hit & is_lastvalid).astype(jnp.int32))
        carry[2] = carry[2] + L
        carry[3] = carry[3] + nhits_blk
        carry[4] = carry[4] + kept
        carry[5] = jnp.minimum(carry[5], carry[8])
        carry[8] = kept

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

        stats_ref[0] = carry[3]
        stats_ref[1] = carry[4]
        stats_ref[2] = jnp.minimum(carry[5], jnp.int32(0x7FFFFFFF))


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def merge_pass_pallas(
    tokens: jax.Array, first, second, new_token, *, block_rows: int = 256,
    interpret: bool = False,
):
    """Fused greedy merge + block-local compaction.

    ``tokens``: int32[N] in block-local prefix layout (a globally-compacted
    stream is a special case), N a multiple of block_rows*128. Returns
    (new_tokens, stats[nhits, new_length, min_kept]) in the same layout.
    Exact reference semantics on the logical stream
    (basic_tokenizer.zig:207-232), including ``aaa -> [X, a]``.

    256-row blocks amortize the per-block fixed cost of the (inherently
    sequential — one TensorCore) grid; 256 is the cap because the packed
    bit-move encodes the in-block shift in 15 bits (C <= 32768).
    """
    N = tokens.shape[0]
    R = block_rows
    C = R * LANES
    if R > 256:
        # packed bit-move encodes the shift in 15 bits: C <= 32768
        raise ValueError(f"block_rows {R} exceeds 256")
    if N % C:
        raise ValueError(f"capacity {N} must be a multiple of {C}")
    G = N // C
    rows = N // LANES
    tok2d = tokens.reshape(rows, LANES)
    scalars = jnp.stack(
        [jnp.asarray(first, jnp.int32), jnp.asarray(second, jnp.int32),
         jnp.asarray(new_token, jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, LANES),
                lambda i, *_: (jnp.minimum((i + 1) * (R // 8), rows // 8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.int32),
            pltpu.VMEM((2 * R, LANES), jnp.int32),
            pltpu.SMEM((9,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, stats = pl.pallas_call(
        functools.partial(_merge_kernel, R=R),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((3,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # the output aliases the token input: untouched blocks (no hits, no
        # kills — the common case in late sparse rounds) are never copied,
        # their bytes are simply inherited
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scalars, tok2d, tok2d)
    return out.reshape(N), stats
