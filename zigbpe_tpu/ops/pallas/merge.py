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
* Compacted elements append into a (2C,) VMEM staging buffer at dynamic
  offset ``pending`` via bit-decomposed static rotations + masked merge
  (software unaligned store). Whenever >= C elements are staged, one
  aligned C-sized block DMAs to the output in HBM. The final grid step
  flushes the tail and PAD-fills the rest of the output, restoring the
  PAD-tailed prefix invariant.

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


def _compact_bitmove(val, keep, dest):
    """Move kept elements to their dest (exclusive cumsum of keep) — stable
    stream compaction in log2(C) collision-free steps. Dropped slots -> PAD.
    """
    R, C = val.shape
    n = R * C
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    )
    shift = jnp.where(keep, idx - dest, 0)
    val = jnp.where(keep, val, PAD)
    shift = jnp.where(keep, shift, 0)
    b = 1
    while b < n:
        in_val = _shift_left_flat(val, b, jnp.int32(PAD))
        in_shift = _shift_left_flat(shift, b, jnp.int32(0))
        moving_in = (in_val != PAD) & ((in_shift & b) != 0)
        staying = (val != PAD) & ((shift & b) == 0)
        new_val = jnp.where(moving_in, in_val, jnp.where(staying, val, PAD))
        new_shift = jnp.where(moving_in, in_shift - b, jnp.where(staying, shift, 0))
        val, shift = new_val, new_shift
        b *= 2
    return val


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _merge_kernel(
    scalars,      # SMEM int32[3]: (a, b, new_token)   [scalar prefetch]
    tok_ref,      # VMEM (R, 128) current block
    nxt_ref,      # VMEM (8, 128) first rows of next block (clamped at end)
    out_ref,      # ANY  (rows, 128) full output, written via manual DMA
    stats_ref,    # SMEM int32[2]: (nhits, new_length)
    staging,      # VMEM (2R, 128) scratch
    padblk,       # VMEM (R, 128) scratch of PAD for tail fill
    carry,        # SMEM int32[5]: last_nonc, kill_first, pending, flushed, nhits
    sem,          # DMA semaphore
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
        carry[2] = 0    # staging pending count
        carry[3] = 0    # blocks flushed
        carry[4] = 0    # total hits
        stats_ref[0] = 0
        stats_ref[1] = 0
        padblk[:] = jnp.full((R, LANES), PAD, jnp.int32)
        # staging must start PAD so unwritten tail slots flush as PAD
        staging[:] = jnp.full((2 * R, LANES), PAD, jnp.int32)

    a = scalars[0]
    b = scalars[1]
    new_tok = scalars[2]

    tok = tok_ref[:]
    nxt = _shift_left_flat(tok, 1, jnp.int32(PAD))
    # the block-edge pair's second token comes from the next block's first elem
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    is_last = (row == R - 1) & (col == LANES - 1)
    edge_second = jnp.where(i == G - 1, jnp.int32(PAD), nxt_ref[0, 0])
    nxt = jnp.where(is_last, edge_second, nxt)

    cand = (tok == a) & (nxt == b) & (nxt >= 0) & (tok >= 0)

    # leftmost-greedy parity for a == b runs (global pair indices)
    gidx = i * C + row * LANES + col
    non_cand_idx = jnp.where(cand, NEG, gidx)
    last_nonc = jnp.maximum(_max_scan_flat(non_cand_idx), carry[0])
    # parity gates hits only for a == b runs (i1 vector selects are not
    # legal on Mosaic, so express the gate as boolean algebra)
    parity_ok = ((gidx - last_nonc) & 1) == 1
    hit = cand & (parity_ok | (a != b))

    # kills: partner of an in-block hit, or the kill-first carry
    # (shift in int32 — Mosaic cannot shift/concat i1 vectors)
    killed = _shift_right_flat(hit.astype(jnp.int32), 1, 0) == 1
    killed = killed | ((gidx == i * C) & (carry[1] == 1))

    written = jnp.where(hit, new_tok, tok)
    keep = (tok >= 0) & ~killed

    # compact kept elements to the block front
    dest = _sum_scan_flat(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
    compacted = _compact_bitmove(written, keep, dest)
    kept = jnp.sum(keep.astype(jnp.int32))
    nhits_blk = jnp.sum(hit.astype(jnp.int32))

    # ---- stage: software unaligned append at offset `pending` ----
    pending = carry[2]
    lifted = jnp.concatenate(
        [compacted, jnp.full((R, LANES), PAD, jnp.int32)], axis=0
    )  # (2R, 128) block values at positions [0, C)
    rot = lifted
    step = 1
    while step < 2 * C:  # rotate right by `pending` (dynamic, bit-decomposed)
        rot = jnp.where((pending & step) != 0, _rotate_flat(rot, step), rot)
        step *= 2
    sidx = (
        jax.lax.broadcasted_iota(jnp.int32, (2 * R, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (2 * R, LANES), 1)
    )
    in_range = (sidx >= pending) & (sidx < pending + kept)
    staging[:] = jnp.where(in_range, rot, staging[:])
    pending = pending + kept

    # ---- flush one aligned C-block if full ----
    flushed = carry[3]

    @pl.when(pending >= C)
    def _flush():
        cp = pltpu.make_async_copy(
            staging.at[pl.ds(0, R), :], out_ref.at[pl.ds(flushed * R, R), :], sem
        )
        cp.start()
        cp.wait()
        staging[:] = jnp.concatenate(
            [staging[R:, :], jnp.full((R, LANES), PAD, jnp.int32)], axis=0
        )
        carry[2] = pending - C
        carry[3] = flushed + 1

    @pl.when(pending < C)
    def _noflush():
        carry[2] = pending

    carry[0] = jnp.maximum(carry[0], jnp.max(non_cand_idx))
    carry[1] = hit.astype(jnp.int32)[R - 1, LANES - 1]
    carry[4] = carry[4] + nhits_blk

    # ---- final step: flush tail + PAD-fill the rest of the output ----
    @pl.when(i == G - 1)
    def _finish():
        f = carry[3]
        cp = pltpu.make_async_copy(
            staging.at[pl.ds(0, R), :], out_ref.at[pl.ds(f * R, R), :], sem
        )
        cp.start()
        cp.wait()

        def pad_body(j, _):
            cq = pltpu.make_async_copy(
                padblk.at[pl.ds(0, R), :], out_ref.at[pl.ds(j * R, R), :], sem
            )
            cq.start()
            cq.wait()
            return 0

        jax.lax.fori_loop(f + 1, G, pad_body, 0)
        stats_ref[0] = carry[4]
        stats_ref[1] = f * C + carry[2]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def merge_pass_pallas(
    tokens: jax.Array, first, second, new_token, *, block_rows: int = 64,
    interpret: bool = False,
):
    """Fused greedy merge + compaction (drop-in for ops.core.merge_pass).

    ``tokens``: int32[N] PAD-tailed prefix, N a multiple of block_rows*128.
    Returns (new_tokens, num_hits). Exact reference semantics
    (basic_tokenizer.zig:207-232), including ``aaa -> [X, a]``.
    """
    N = tokens.shape[0]
    R = block_rows
    C = R * LANES
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
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * R, LANES), jnp.int32),
            pltpu.VMEM((R, LANES), jnp.int32),
            pltpu.SMEM((5,), jnp.int32),
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
        interpret=interpret,
    )(scalars, tok2d, tok2d)
    return out.reshape(N), stats[0]
