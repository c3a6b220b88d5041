"""Pallas TPU kernel: batched merge-table replay (the serving path).

The reference encodes by replaying every merge over the whole stream
(basic_tokenizer.zig:71-88) — O(M) passes over HBM. For batched serving
(BASELINE.json config 3: frozen merge table over padded sequences) this
kernel flips the loop: the grid walks DOCUMENT blocks, each block is loaded
into VMEM once, ALL M merges replay over the VMEM-resident block, and the
result is written once — O(2N) HBM traffic total instead of O(M*N), with
the merge table in SMEM via scalar prefetch.

Per (R, 128) block == one padded document row:

* Rows are independent streams (no cross-block peeking or carries).
* The evolving stream uses the ROW-LOCAL prefix layout of the training
  kernel (ops/pallas/merge.py): every 128-lane row of the block is a valid
  prefix, so a merge pass compacts WITHIN rows only — destination scan =
  one MXU matmul, packed bit-move <= 7 steps gated by the max row-kills.
  A pass with a handful of hits costs ~1-2 bit-move steps instead of the
  up-to-15 flat steps of the earlier whole-document-prefix design (whose
  dest scan + bit-move were ~60% of per-pass cost, NOTES_r2).
* **Presence bitmap skip**: an SMEM bitmap of token ids present in this row
  (sound over-approximation: byte ids start set, a merge's new token is set
  when it fires) lets a pass bail in O(1) when either side of the pair
  cannot be present.
* **Next-view cache**: the adjacent-token view is cached in VMEM and only
  rebuilt after a pass that changed the stream — a pass whose pair is
  present but never adjacent costs just the candidate compare.
* If a merge empties an interior row (degenerate, e.g. doubling-collapse
  documents), the whole document is recompacted in place with the flat
  bit-move and replay continues — the row-local invariant (no empty
  interior rows) is self-healed in-kernel.
* The final document is emitted as a single global prefix (the batch API's
  ``out[i, :length[i]]`` contract).

Constraints: row length L = R*128 with 8 <= R <= 256 (the packed flat
bit-move encodes in-row shifts in 15 bits); longer documents go through the
single-stream path. The XLA formulation (ops/encode_batch.py) remains the
portable fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .merge import PAD, LANES, NEG, _compact_rows_bitmove, _max_scan_flat, \
    _row_prefix_killed, _shift_left_flat, _sum_scan_flat


def _compact_bitmove(val, keep, dest, nkilled, work_ref):
    """Flat stable stream compaction in log2(C) collision-free steps —
    used for the in-kernel global recompactions (drained interior rows,
    final prefix emission). Packs (shift << 16 | value) into one int32;
    shifts < 2^15 (C <= 32768)."""
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


def group_merges(merges, cap: int = 16):
    """Host-side: greedily group CONSECUTIVE merge-table entries that can
    replay SIMULTANEOUSLY in one fused pass. Entries i != j fuse when every
    pair is distinct, no member has a == b (the overlap-parity case stays a
    singleton), no member's (a, b) references a group member's minted
    token, and the group is CHAIN-FREE: no member's b equals another
    member's a.

    Soundness (why simultaneous == sequential here): (1) no member can
    DESTROY another's candidate — a destroyed candidate would need one of
    its two tokens hit or killed by another member, and every such case
    forces a == a' with b == b' (distinct pairs), b_i == a_j, or
    a_i == b_j, all excluded; (2) no member can CREATE another's candidate
    — every adjacency created by a merge has that member's minted token on
    its left, and minted tokens are never referenced in-group; (3) within
    one member, a != b makes candidates non-overlapping, so leftmost-greedy
    fires all of them. Hence applying all members' original-stream
    candidates at once reproduces sequential replay
    (basic_tokenizer.zig:71-88) bit-exactly.

    Real 1K-merge text tables fuse well (measured: cap=16 gives ~122
    chain-free passes for 1024 merges vs ~105 for the weaker
    minted-independence condition — but chain-freedom removes the
    per-member alive-mask chain from the kernel, ~2.4x less work per
    member).

    Returns (gtable int32[P, cap, 3] PAD-filled, glens int32[P]).
    """
    import numpy as np

    t = np.asarray(merges, np.int64).reshape(-1, 3)
    n = len(t)
    groups = []
    i = 0
    while i < n:
        g = 1
        minted = {int(t[i, 2])}
        pairs = {(int(t[i, 0]), int(t[i, 1]))}
        a_set = {int(t[i, 0])}
        b_set = {int(t[i, 1])}
        ok = t[i, 0] != t[i, 1] and t[i, 2] >= 0
        while ok and g < cap and i + g < n:
            a, b, x = (int(v) for v in t[i + g])
            if (
                a == b or x < 0 or (a, b) in pairs
                or a in minted or b in minted
                or a in b_set or b in a_set  # chain-freedom
            ):
                break
            minted.add(x)
            pairs.add((a, b))
            a_set.add(a)
            b_set.add(b)
            g += 1
        groups.append(g)
        i += g
    P = len(groups)
    gtable = np.full((P, cap, 3), PAD, np.int32)
    pos = 0
    for p, g in enumerate(groups):
        gtable[p, :g] = t[pos : pos + g]
        pos += g
    return gtable, np.asarray(groups, np.int32)


def schedule_merges(merges, cap: int = 16):
    """Reorder-with-equivalence scheduling: greedily list-schedule the merge
    table into simultaneous chain-free groups over its INDEPENDENCE DAG —
    the stronger version of :func:`group_merges`, which only fuses
    consecutive runs.

    Two merges are independent iff their pairs are distinct, no token is
    chained across them (b_i == a_j or b_j == a_i), neither references the
    other's minted token, and — when either has a == b (overlap parity) —
    their token sets are fully disjoint. Independent merges COMMUTE: each
    one's candidate set on any stream is invariant under the other's
    application (destroying a candidate would need a member token consumed,
    which forces one of the excluded equalities; every created adjacency
    involves the minted token, which is never referenced). Hence replaying
    any topological linear extension of the dependency DAG — reachable
    from training order by adjacent transpositions of independent pairs —
    produces the same output for EVERY input, and independent entries
    within one step may apply simultaneously (the group_merges argument).

    The greedy: walk the remaining entries in original order; an entry is
    READY when all of its not-yet-scheduled earlier interactors are gone;
    add ready entries pairwise-independent with the current group until
    ``cap``. Real 1K text tables schedule to ~2-3x fewer passes than
    consecutive grouping (the tail of a trained table is full of mutually
    independent but interleaved merges).

    Returns (gtable int32[P, cap, 3] PAD-filled, glens int32[P]).
    """
    import numpy as np

    t = np.asarray(merges, np.int64).reshape(-1, 3)
    n = len(t)

    def indep(i, j):
        ai, bi, xi = t[i]
        aj, bj, xj = t[j]
        if ai == aj and bi == bj:
            return False
        if xi in (aj, bj, xj) or xj in (ai, bi):
            return False
        if bi == aj or bj == ai:
            return False
        if ai == bi or aj == bj:
            return not ({ai, bi, xi} & {aj, bj, xj})
        return True

    # interactors[j] = earlier entries j must wait for (list kept sorted)
    interacts = [
        [i for i in range(j) if not indep(i, j)] for j in range(n)
    ]
    scheduled = np.zeros(n, bool)
    order = []
    groups = []
    remaining = list(range(n))
    while remaining:
        group = []
        keep = []
        for idx in remaining:
            if len(group) >= cap:
                keep.append(idx)
                continue
            if any(not scheduled[i] for i in interacts[idx]):
                keep.append(idx)
                continue
            ai, bi = t[idx, 0], t[idx, 1]
            if ai == bi and group:
                keep.append(idx)  # parity merges run as singletons
                continue
            if group and (t[group[0], 0] == t[group[0], 1]):
                keep.append(idx)
                continue
            if all(indep(g, idx) for g in group):
                group.append(idx)
            else:
                keep.append(idx)
        for g in group:
            scheduled[g] = True
        order.extend(group)
        groups.append(len(group))
        remaining = keep
    P = len(groups)
    gtable = np.full((P, cap, 3), PAD, np.int32)
    pos = 0
    for p, g in enumerate(groups):
        gtable[p, :g] = t[order[pos : pos + g]]
        pos += g
    return gtable, np.asarray(groups, np.int32)


def _encode_kernel(
    table,     # SMEM int32[P*cap*3] grouped merge table (scalar prefetch)
    glens,     # SMEM int32[P] group sizes (scalar prefetch)
    tok_ref,   # VMEM (R, 128) one padded document row
    out_ref,   # VMEM (R, 128)
    buf,       # VMEM (R, 128) scratch: the evolving stream
    nxtbuf,    # VMEM (R, 128) scratch: cached next-token view
    work,      # VMEM (R, 128) scratch: bit-move staging
    wbuf,      # VMEM (R, 128) scratch: written values accumulator
    hbuf,      # VMEM (R, 128) scratch: hit mask accumulator (int32)
    present,   # SMEM int32[words] token-presence bitmap (256 + M ids)
    flags,     # SMEM int32[1]: nxt cache dirty?
    *,
    R: int,
    M: int,
    P: int,
    cap: int,
):
    buf[:] = tok_ref[:]
    flags[0] = 1
    # presence init: all byte ids (a fresh row is raw bytes); merge-built
    # ids are marked as their merges fire. Sound over-approximation.
    words = present.shape[0]
    for w in range(8):
        present[w] = -1

    def clear(w, _):
        present[w] = 0
        return 0

    jax.lax.fori_loop(8, words, clear, 0)

    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    def flat_recompact(t):
        keep = t >= 0
        k32 = keep.astype(jnp.int32)
        dest = _sum_scan_flat(k32) - k32
        holes = R * LANES - jnp.sum(k32)
        return _compact_bitmove(t, keep, dest, holes, work)

    # ids beyond the table's mintable range (a malformed table can mint
    # any u16) are conservatively "maybe present": never skipped
    def bit(v):
        in_range = v < 256 + M
        w = jnp.minimum(v >> 5, jnp.int32(words - 1))
        return jnp.where(in_range, (present[w] >> (v & 31)) & 1, 1)

    def commit(written, killed, valid):
        """Shared tail of an applying pass: within-row compaction, the
        empty-interior-row self-heal, and next-view invalidation."""
        keep = valid & ~killed
        rowkills = jnp.sum(killed.astype(jnp.int32), axis=1, keepdims=True)
        mrk = jnp.max(rowkills)
        shift = _row_prefix_killed(killed)
        buf[:] = _compact_rows_bitmove(written, keep, shift, mrk, work)

        rowpop = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)
        rowkept = rowpop - rowkills
        ne2 = rowkept > 0
        last2 = jnp.max(jnp.where(ne2, ridx, -1))
        empty_interior = jnp.any(~ne2 & (ridx < last2))

        @pl.when(empty_interior)
        def _heal():
            buf[:] = flat_recompact(buf[:])

        flags[0] = 1  # stream changed: next view stale

    def body(p, _):
        base = p * cap * 3
        glen = glens[p]

        def member(j):
            return table[base + 3 * j], table[base + 3 * j + 1], \
                table[base + 3 * j + 2]

        def member_maybe(j):
            aj, bj, ntj = member(j)
            return (jnp.int32(j) < glen) & (ntj >= 0) & (bit(aj) == 1) & \
                (bit(bj) == 1)

        any_maybe = member_maybe(0)
        for j in range(1, cap):
            any_maybe = any_maybe | member_maybe(j)
        a0, b0, nt0 = member(0)
        parity_single = (glen == 1) & (a0 == b0)

        def rebuild_nxt(tok, valid):
            @pl.when(flags[0] == 1)
            def _rebuild():
                nxt_in = jnp.concatenate(
                    [tok[:, 1:], jnp.full((R, 1), PAD, tok.dtype)], axis=1
                )
                heads = jnp.broadcast_to(tok[:, :1], (R, LANES))
                hn = jnp.concatenate(
                    [heads[1:, :], jnp.full((1, LANES), PAD, tok.dtype)],
                    axis=0,
                )
                nxtbuf[:] = jnp.where(valid & (nxt_in < 0), hn, nxt_in)
                flags[0] = 0

        def fused_pass():
            """Chain-free group (see group_merges): every member's
            candidates are exactly its original-stream candidates — no
            member can create or destroy another's — so all members apply
            SIMULTANEOUSLY and ONE compaction commits the whole group."""
            tok = buf[:]
            valid = tok >= 0
            rebuild_nxt(tok, valid)
            nxt = nxtbuf[:]

            wbuf[:] = tok
            hbuf[:] = jnp.zeros((R, LANES), jnp.int32)

            for j in range(cap):
                aj, bj, ntj = member(j)

                @pl.when(member_maybe(j))
                def _member(aj=aj, bj=bj, ntj=ntj):
                    # tok == aj implies valid (aj >= 0 for live members)
                    candj = (tok == aj) & (nxt == bj) & (nxt >= 0)
                    wbuf[:] = jnp.where(candj, ntj, wbuf[:])
                    hbuf[:] = hbuf[:] + candj.astype(jnp.int32)

                    @pl.when(
                        (jnp.sum(candj.astype(jnp.int32)) > 0)
                        & (ntj < 256 + M)
                    )
                    def _mark():
                        present[ntj >> 5] = (
                            present[ntj >> 5] | (1 << (ntj & 31))
                        )

            hb = hbuf[:]

            @pl.when(jnp.sum(hb) > 0)
            def _commit():
                # hb is 0/1: distinct members' candidates never share a
                # position (chain-freedom). Kills: within-row partner of
                # any hit, plus the next row's head for edge hits.
                nxt_in = jnp.concatenate(
                    [tok[:, 1:], jnp.full((R, 1), PAD, tok.dtype)], axis=1
                )
                is_lv32 = (valid & (nxt_in < 0)).astype(jnp.int32)
                killed_in = jnp.concatenate(
                    [jnp.zeros((R, 1), jnp.int32), hb[:, :-1]], axis=1
                )
                ehit = jnp.sum(hb * is_lv32, axis=1, keepdims=True)
                ke = jnp.concatenate(
                    [jnp.zeros((1, LANES), jnp.int32),
                     jnp.broadcast_to(ehit, (R, LANES))[:-1, :]], axis=0,
                )
                killed = ((killed_in == 1) | ((col == 0) & (ke >= 1))) & valid
                commit(wbuf[:], killed, valid)

        def parity_pass():
            """Singleton a == b group: leftmost-greedy overlap parity on
            logical ranks (reference ``aaa -> [X, a]`` semantics)."""
            tok = buf[:]
            valid = tok >= 0
            rebuild_nxt(tok, valid)
            nxt = nxtbuf[:]
            cand = valid & (tok == a0) & (nxt == b0) & (nxt >= 0)

            @pl.when(jnp.sum(cand.astype(jnp.int32)) > 0)
            def _apply():
                nxt_in = jnp.concatenate(
                    [tok[:, 1:], jnp.full((R, 1), PAD, tok.dtype)], axis=1
                )
                is_lastvalid = valid & (nxt_in < 0)
                rowpop = jnp.sum(valid.astype(jnp.int32), axis=1,
                                 keepdims=True)
                # logical ranks: exclusive row-population prefix + lane
                rp = jnp.broadcast_to(rowpop, (R, LANES))
                t = jnp.concatenate(
                    [jnp.zeros((1, LANES), jnp.int32), rp[:-1, :]], axis=0
                )
                s = 1
                while s < R:
                    t = t + jnp.concatenate(
                        [jnp.zeros((s, LANES), jnp.int32), t[:-s, :]],
                        axis=0,
                    )
                    s *= 2
                grank = t + col
                ncr = jnp.where(cand | ~valid, NEG, grank)
                last_nonc = _max_scan_flat(ncr)
                hit = cand & (((grank - last_nonc) & 1) == 1)
                hit32 = hit.astype(jnp.int32)

                killed_in = jnp.concatenate(
                    [jnp.zeros((R, 1), jnp.int32), hit32[:, :-1]], axis=1
                )
                ehit = jnp.sum(
                    (hit & is_lastvalid).astype(jnp.int32), axis=1,
                    keepdims=True,
                )
                ke = jnp.concatenate(
                    [jnp.zeros((1, LANES), jnp.int32),
                     jnp.broadcast_to(ehit, (R, LANES))[:-1, :]], axis=0,
                )
                killed = ((killed_in == 1) | ((col == 0) & (ke >= 1))) & valid
                written = jnp.where(hit, nt0, tok)
                commit(written, killed, valid)

                @pl.when(nt0 < 256 + M)
                def _mark():
                    present[nt0 >> 5] = present[nt0 >> 5] | (1 << (nt0 & 31))

        pl.when(any_maybe & ~parity_single)(fused_pass)
        pl.when(any_maybe & parity_single)(parity_pass)
        return 0

    jax.lax.fori_loop(0, P, body, 0)
    # emit the batch API's contract: one global prefix per document row
    out_ref[:] = flat_recompact(buf[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_rows_grouped(tokens: jax.Array, gtable: jax.Array,
                        glens: jax.Array, *, interpret: bool = False):
    """Replay a GROUPED merge table (see :func:`group_merges`) over a
    [B, L] batch of padded rows — each row one document, reference
    semantics per row (basic_tokenizer.zig:71-88). Returns
    (tokens', lengths) with rows prefix-compacted. L must be a multiple of
    128 with L/128 in [8, 256]."""
    B, L = tokens.shape
    R = L // LANES
    if L % LANES or not (8 <= R <= 256):
        raise ValueError(f"row length {L} must be 128*R with 8 <= R <= 256")
    P, cap, _ = gtable.shape
    if P == 0:  # empty merge table: rows are already their own encodings
        return tokens, jnp.sum((tokens >= 0).astype(jnp.int32), axis=1)
    M = P * cap  # bitmap bound: >= true merge count, same skip soundness
    table = gtable.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.int32),  # buf
            pltpu.VMEM((R, LANES), jnp.int32),  # nxtbuf
            pltpu.VMEM((R, LANES), jnp.int32),  # work
            pltpu.VMEM((R, LANES), jnp.int32),  # wbuf
            pltpu.VMEM((R, LANES), jnp.int32),  # hbuf
            # bitmap sized to the largest id the table can mint (<= u16 cap)
            pltpu.SMEM((max((256 + M + 31) // 32, 8),), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    def kernel(table, glens, tok_ref, out_ref, buf, nxtbuf, work, wbuf,
               hbuf, present, flags):
        _encode_kernel(
            table, glens, tok_ref.at[0], out_ref.at[0], buf, nxtbuf, work,
            wbuf, hbuf, present, flags, R=R, M=M, P=P, cap=cap,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(table, glens, tokens.reshape(B, R, LANES))
    out = out.reshape(B, L)
    return out, jnp.sum((out >= 0).astype(jnp.int32), axis=1)


def encode_rows_pallas(tokens: jax.Array, merges, *, cap: int = 16,
                       interpret: bool = False):
    """Convenience wrapper: host-group the (M, 3) merge table (NumPy — the
    grouping is trace-time work) and replay it. Callers on a hot path
    should cache :func:`group_merges` output and call
    :func:`encode_rows_grouped` directly."""
    import numpy as np

    gtable, glens = group_merges(np.asarray(merges), cap=cap)
    return encode_rows_grouped(
        tokens, jnp.asarray(gtable), jnp.asarray(glens), interpret=interpret
    )
