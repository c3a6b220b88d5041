"""Pallas TPU kernel: one fused greedy-merge + compaction pass.

This is the Stage-2 hot-path kernel (SURVEY.md §7): the device analogue of
the reference's ``replaceTopPairWithNewToken`` (basic_tokenizer.zig:207-232)
— one leftmost-greedy pass replacing pair (a, b) with ``new_token``, the
partner slot killed, and the stream compacted back to a PAD-tailed prefix —
done in a SINGLE streaming pass over HBM.

Why a kernel at all: measured on this backend (true device sync), the XLA
formulation costs ~29 ms per round at 8Mi tokens (cummax parity scan ~12 ms
+ stable-sort compaction ~17 ms), because scans and sorts are multi-pass
over HBM. The token stream at 8Mi tokens is only 32 MB — speed-of-light for
read+write is ~0.1 ms. This kernel streams each block exactly once.

Design (everything below is per (R, 128) block, sequential grid, carries in
SMEM — TPU grids execute in order):

* The 1-D token array is viewed as (N/128, 128) row-major; flat order ==
  logical order.
* **Hits**: candidate mask c[j] = (t[j]==a) & (t[j+1]==b); for a != b
  candidates cannot overlap, so hits = c. For a == b, leftmost-greedy picks
  alternate members of each candidate run (reference semantics ``aaa`` ->
  ``[X, a]``): hit[j] = c[j] & odd(j - last_non_candidate_index(j)), which
  is a prefix-max over global indices — computed as a two-level in-block
  scan (lane scan then row scan; shifts are static concatenates) combined
  with a scalar carry of the previous blocks' max.
* The pair spanning the block edge belongs to THIS block (its second token
  is peeked from the next block via a second, 8-row input ref); a hit there
  sends a kill-first carry to the next block.
* **Compaction**: keep = alive & ~killed; dest = exclusive-cumsum(keep).
  Kept elements move to dest via the monotone bit-move: for each bit b of
  the shift amount (j - dest[j], non-decreasing in j), elements whose shift
  has bit b move left by 2^b. Monotonicity (clearing low bits of a
  non-decreasing sequence keeps it non-decreasing) makes every partial step
  collision-free, so each step is two flat shifts + selects.
* Compacted elements append into a (4C,) VMEM ring buffer at dynamic
  offset ``pending mod 4C`` via bit-decomposed static rotations (mod C —
  ring blocks are C-congruent) + masked merge (software unaligned store).
  Whenever a ring block fills, it DMAs to the output WITHOUT waiting; a
  block waits for flush j only when its writes could touch j's slot
  (drain-to-2 backlog), so DMA latency hides behind compute. The output
  ALIASES the input, so the PAD tail beyond the old valid length is
  inherited rather than re-written; the final grid step drains, flushes
  the partial tail, and PAD-fills only the newly-vacated gap.

* Fast paths: the parity scan runs only when a == b; the bit-move runs
  only when the block actually killed a slot; rotation only when the
  staging offset is misaligned. Late rounds (sparse hits) skip almost
  all scan work.

The kernel returns (compacted_tokens, stats[nhits, new_length]). It is
bit-exact vs ops.core.merge_pass (tested in tests/test_pallas_merge.py via
interpret mode on CPU and compiled on TPU).
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


def _rotate_flat(x, s: int):
    """Circular flat rotation right by static s (elements wrap around)."""
    R, C = x.shape
    n = R * C
    s = s % n
    if s == 0:
        return x
    sd, sm = divmod(s, C)
    a = jnp.concatenate([x[R - sd :, :], x[: R - sd, :]], axis=0) if sd else x
    if sm == 0:
        return a
    b = jnp.concatenate([a[-1:, :], a[:-1, :]], axis=0)
    a = jnp.concatenate([a[:, -sm:], a[:, :-sm]], axis=1)
    b = jnp.concatenate([b[:, -sm:], b[:, :-sm]], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    return jnp.where(col >= sm, a, b)


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
    work_ref[:] = jnp.where(packed >= 0, packed & 0xFFFF, PAD)


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _merge_kernel(
    scalars,      # SMEM int32[3]: (a, b, new_token)   [scalar prefetch]
    tok_ref,      # VMEM (R, 128) current block
    nxt_ref,      # VMEM (8, 128) first rows of next block (clamped at end)
    out_ref,      # ANY  (rows, 128) full output, written via manual DMA
    stats_ref,    # SMEM int32[2]: (nhits, new_length)
    staging,      # VMEM (4R, 128) ring of 4 flush blocks
    padblk,       # VMEM (4R, 128) scratch of PAD for tail fill
    work,         # VMEM (R, 128) scratch: bit-move + rotation staging
    carry,        # SMEM int32[8]: see _init
    sem,          # DMA semaphore array (4,) for ring flushes
    pad_sem,      # DMA semaphore for tail PAD fills
    *,
    R: int,
):
    C = R * LANES
    i = pl.program_id(0)
    G = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        carry[0] = NEG  # last non-candidate global pair index ("none yet")
        carry[1] = 0    # kill-first flag
        carry[2] = 0    # pending: total staged elements (= new length so far)
        carry[3] = 0    # flushes started
        carry[4] = 0    # total hits
        carry[5] = 0    # total valid input tokens seen
        carry[6] = 0    # flushes waited
        stats_ref[0] = 0
        stats_ref[1] = 0
        padblk[:] = jnp.full((4 * R, LANES), PAD, jnp.int32)

    # drain the flush backlog to <= 2 outstanding BEFORE this block's ring
    # writes can touch a slot a 3-back flush may still be reading
    def drain_to(limit):
        flushed0 = carry[3]
        waited0 = carry[6]
        todo = jnp.maximum(flushed0 - waited0 - limit, 0)

        def wbody(t, _):
            pltpu.make_async_copy(
                staging.at[pl.ds(0, R), :], out_ref.at[pl.ds(0, R), :],
                sem.at[(waited0 + t) % 4],
            ).wait()
            return 0

        jax.lax.fori_loop(0, todo, wbody, 0)
        carry[6] = waited0 + todo

    drain_to(2)

    a = scalars[0]
    b = scalars[1]
    new_tok = scalars[2]

    tok = tok_ref[:]
    valid_cnt = jnp.sum((tok >= 0).astype(jnp.int32))
    sidx = (
        jax.lax.broadcasted_iota(jnp.int32, (4 * R, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (4 * R, LANES), 1)
    )

    # All-PAD tail blocks (prefix invariant: once the tail starts nothing
    # follows) carry no candidates, no kills, no staged data — skip all
    # vector work. The carries are untouched: an edge hit into a PAD block
    # is impossible, so kill-first is already 0.
    @pl.when(valid_cnt > 0)
    def _process():
        nxt = _shift_left_flat(tok, 1, jnp.int32(PAD))
        # the block-edge pair's second token comes from the next block
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        is_last = (row == R - 1) & (col == LANES - 1)
        edge_second = jnp.where(i == G - 1, jnp.int32(PAD), nxt_ref[0, 0])
        nxt2 = jnp.where(is_last, edge_second, nxt)

        cand = (tok == a) & (nxt2 == b) & (nxt2 >= 0) & (tok >= 0)
        gidx = i * C + row * LANES + col
        non_cand_idx = jnp.where(cand, NEG, gidx)

        # leftmost-greedy parity for a == b runs (global pair indices); for
        # a != b candidates cannot overlap, so skip the scan entirely.
        # (cond branches yield int32 — Mosaic cannot yield i1 vectors)
        def with_parity(c_mask):
            last_nonc = jnp.maximum(_max_scan_flat(non_cand_idx), carry[0])
            return (c_mask & (((gidx - last_nonc) & 1) == 1)).astype(jnp.int32)

        hit = jax.lax.cond(
            a == b, with_parity, lambda c_mask: c_mask.astype(jnp.int32), cand
        ) == 1

        # kills: partner of an in-block hit, or the kill-first carry
        # (shift in int32 — Mosaic cannot shift/concat i1 vectors)
        killed = _shift_right_flat(hit.astype(jnp.int32), 1, 0) == 1
        killed = killed | ((gidx == i * C) & (carry[1] == 1))

        written = jnp.where(hit, new_tok, tok)
        keep = (tok >= 0) & ~killed
        kept = jnp.sum(keep.astype(jnp.int32))
        nhits_blk = jnp.sum(hit.astype(jnp.int32))
        nkilled = jnp.sum(killed.astype(jnp.int32))

        # compact kept elements to the block front; with no kills `written`
        # is already a PAD-tailed prefix (PAD only ever in the input tail)
        @pl.when(nkilled > 0)
        def _do_compact():
            dest = _sum_scan_flat(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
            _compact_bitmove(written, keep, dest, nkilled, work)

        @pl.when(nkilled == 0)
        def _no_compact():
            work[:] = written

        # ---- stage: software unaligned append into the 4C ring ----
        # rotate within the C-domain (mod C); ring positions congruent mod C
        # read the same source, so one rotation serves all 4 ring blocks.
        # Each set bit of the rotation amount is a real pl.when branch — a
        # select-based formulation would compute every power-of-two rotation
        pending = carry[2]
        pmod = pending & (4 * C - 1)
        amt = pending & (C - 1)
        step = 1
        while step < C:

            @pl.when((amt & step) != 0)
            def _rot(step=step):
                work[:] = _rotate_flat(work[:], step)

            step *= 2

        rot = work[:]
        # Ring quadrants are C-congruent, so the rotated block maps onto
        # every quadrant identically — update ONLY the (at most two)
        # quadrants the window [pmod, pmod+kept) actually touches, with
        # static slices (a full-ring masked merge costs 4x the traffic).
        cidx = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        )
        lo = pmod
        hi = pmod + kept  # <= 5C; may wrap past the ring end
        for q in range(4):
            touched = ((lo < (q + 1) * C) & (hi > q * C)) | (hi - 4 * C > q * C)

            @pl.when(touched)
            def _(q=q):
                dq = q * C + cidx - pmod
                dq = jnp.where(dq < 0, dq + 4 * C, dq)
                in_q = dq < kept
                staging[q * R : (q + 1) * R, :] = jnp.where(
                    in_q, rot, staging[q * R : (q + 1) * R, :]
                )

        pending = pending + kept
        carry[2] = pending

        # ---- start (don't wait) one ring-block flush if a block filled ----
        flushed = carry[3]

        @pl.when(pending - flushed * C >= C)
        def _flush():
            pltpu.make_async_copy(
                staging.at[pl.ds((flushed % 4) * R, R), :],
                out_ref.at[pl.ds(flushed * R, R), :],
                sem.at[flushed % 4],
            ).start()
            carry[3] = flushed + 1

        carry[0] = jnp.maximum(carry[0], jnp.max(non_cand_idx))
        carry[1] = hit.astype(jnp.int32)[R - 1, LANES - 1]
        carry[4] = carry[4] + nhits_blk
        carry[5] = carry[5] + valid_cnt

    # ---- final step: drain, flush the partial tail, PAD-fill the gap ----
    @pl.when(i == G - 1)
    def _finish():
        drain_to(0)
        f = carry[3]
        newlen = carry[2]
        # PAD the unwritten slots of the final partial ring block
        npad_from = newlen & (4 * C - 1)
        dd = sidx - npad_from
        dd = jnp.where(dd < 0, dd + 4 * C, dd)
        staging[:] = jnp.where(dd < (f + 1) * C - newlen, PAD, staging[:])
        tail = pltpu.make_async_copy(
            staging.at[pl.ds((f % 4) * R, R), :],
            out_ref.at[pl.ds(f * R, R), :],
            sem.at[f % 4],
        )
        tail.start()
        tail.wait()

        # PAD-fill [f+1, ceil(valid_total/C)) — beyond that the output
        # already holds PAD, because it aliases the input (the old tail)
        vend = (carry[5] + C - 1) // C  # in C-blocks
        base = f + 1
        if G >= 5:  # batched 4-block PADs only make sense on larger grids
            n4 = jnp.maximum((vend - base) // 4, 0)

            def pad4(j, _):
                pltpu.make_async_copy(
                    padblk.at[:, :],
                    out_ref.at[pl.ds((base + j * 4) * R, 4 * R), :],
                    pad_sem,
                ).start()
                return 0

            jax.lax.fori_loop(0, n4, pad4, 0)
        else:
            n4 = jnp.int32(0)

        def pad1(j, _):
            pltpu.make_async_copy(
                padblk.at[pl.ds(0, R), :],
                out_ref.at[pl.ds((base + n4 * 4 + j) * R, R), :],
                pad_sem,
            ).start()
            return 0

        n1 = jnp.maximum(vend - base - n4 * 4, 0)
        jax.lax.fori_loop(0, n1, pad1, 0)

        if G >= 5:
            def wait4(j, _):
                pltpu.make_async_copy(
                    padblk.at[:, :], out_ref.at[pl.ds(0, 4 * R), :], pad_sem
                ).wait()
                return 0

            jax.lax.fori_loop(0, n4, wait4, 0)

        def wait1(j, _):
            pltpu.make_async_copy(
                padblk.at[pl.ds(0, R), :], out_ref.at[pl.ds(0, R), :], pad_sem
            ).wait()
            return 0

        jax.lax.fori_loop(0, n1, wait1, 0)
        stats_ref[0] = carry[4]
        stats_ref[1] = newlen


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def merge_pass_pallas(
    tokens: jax.Array, first, second, new_token, *, block_rows: int = 256,
    interpret: bool = False,
):
    """Fused greedy merge + compaction (drop-in for ops.core.merge_pass).

    ``tokens``: int32[N] PAD-tailed prefix, N a multiple of block_rows*128.
    Returns (new_tokens, num_hits). Exact reference semantics
    (basic_tokenizer.zig:207-232), including ``aaa -> [X, a]``.

    Larger blocks amortize the per-block fixed cost of the (inherently
    sequential — one TensorCore) grid; 256 rows is the cap because the
    packed bit-move encodes the in-block shift in 15 bits (C <= 32768).
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
            pltpu.VMEM((4 * R, LANES), jnp.int32),
            pltpu.VMEM((4 * R, LANES), jnp.int32),
            pltpu.VMEM((R, LANES), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, stats = pl.pallas_call(
        functools.partial(_merge_kernel, R=R),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # output 0 aliases the token input: compaction writes in place
        # (safe: every flush/PAD write targets rows <= the read frontier),
        # and the PAD tail beyond the old valid length is inherited from
        # the input instead of being re-written
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scalars, tok2d, tok2d)
    return out.reshape(N), stats[0]
