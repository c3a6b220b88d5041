"""Pallas TPU kernel: batched merge-table replay (the serving path).

The reference encodes by replaying every merge over the whole stream
(basic_tokenizer.zig:71-88) — O(M) passes over HBM. For batched serving
(BASELINE.json config 3: frozen merge table over padded sequences) this
kernel flips the loop: the grid walks DOCUMENT blocks, each block is loaded
into VMEM once, ALL M merges replay over the VMEM-resident block, and the
result is written once — O(2N) HBM traffic total instead of O(M*N), with
the merge table in SMEM via scalar prefetch.

Per (R, 128) block == one padded document row:

* Rows are independent streams (no cross-block peeking, carries, or
  compaction migration — unlike the training kernel, ops/pallas/merge.py).
* Each merge pass is the same leftmost-greedy hit/kill/compact as training:
  parity scan only when a == b, kill-count-gated bit-move compaction.
* **Presence bitmap skip**: an SMEM bitmap of token ids present in this row
  (sound over-approximation: byte ids start set, a merge's new token is set
  when it fires) lets a pass bail in O(1) when either side of the pair
  cannot be present — for a ~1K-merge table most passes skip entirely on
  typical documents.

Constraints: row length L = R*128 with 8 <= R <= 256 (the packed bit-move
encodes in-row shifts in 15 bits); longer documents go through the
single-stream path. The XLA formulation (ops/encode_batch.py) remains the
portable fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .merge import PAD, LANES, NEG, _max_scan_flat, \
    _shift_left_flat, _shift_right_flat, _sum_scan_flat


def _compact_bitmove(val, keep, dest, nkilled, work_ref):
    """Flat stable stream compaction in log2(C) collision-free steps (the
    training kernel has moved to within-row compaction; this flat variant
    remains for the encode kernel's whole-document prefixes). Packs
    (shift << 16 | value) into one int32; shifts < 2^15 (C <= 32768)."""
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


def _encode_kernel(
    table,     # SMEM int32[M*3] merge table (scalar prefetch)
    tok_ref,   # VMEM (R, 128) one padded document row
    out_ref,   # VMEM (R, 128)
    buf,       # VMEM (R, 128) scratch: the evolving stream
    work,      # VMEM (R, 128) scratch: bit-move staging
    present,   # SMEM int32[words] token-presence bitmap (256 + M ids)
    *,
    R: int,
    M: int,
):
    buf[:] = tok_ref[:]
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
    idx = row * LANES + col

    def body(m, _):
        a = table[3 * m]
        b = table[3 * m + 1]
        nt = table[3 * m + 2]
        # ids beyond the table's mintable range (a malformed table can mint
        # any u16) are conservatively "maybe present": never skipped
        def bit(v):
            in_range = v < 256 + M
            w = jnp.minimum(v >> 5, jnp.int32(words - 1))
            return jnp.where(in_range, (present[w] >> (v & 31)) & 1, 1)

        maybe = (nt >= 0) & (bit(a) == 1) & (bit(b) == 1)

        @pl.when(maybe)
        def _pass():
            tok = buf[:]
            nxt = _shift_left_flat(tok, 1, jnp.int32(PAD))
            cand = (tok == a) & (nxt == b) & (nxt >= 0)
            ncand = jnp.sum(cand.astype(jnp.int32))

            @pl.when(ncand > 0)
            def _apply():
                def with_parity(c_mask):
                    non_cand = jnp.where(c_mask == 1, NEG, idx)
                    last_nonc = _max_scan_flat(non_cand)
                    return (
                        (c_mask == 1) & (((idx - last_nonc) & 1) == 1)
                    ).astype(jnp.int32)

                hit = jax.lax.cond(
                    a == b, with_parity, lambda c: c, cand.astype(jnp.int32)
                ) == 1
                killed = _shift_right_flat(hit.astype(jnp.int32), 1, 0) == 1
                written = jnp.where(hit, nt, tok)
                keep = (tok >= 0) & ~killed
                nkilled = jnp.sum(killed.astype(jnp.int32))
                dest = _sum_scan_flat(keep.astype(jnp.int32)) - keep.astype(
                    jnp.int32
                )
                buf[:] = _compact_bitmove(written, keep, dest, nkilled, work)

                @pl.when(nt < 256 + M)
                def _mark():
                    present[nt >> 5] = present[nt >> 5] | (1 << (nt & 31))

        return 0

    jax.lax.fori_loop(0, M, body, 0)
    out_ref[:] = buf[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_rows_pallas(tokens: jax.Array, merges: jax.Array, *,
                       interpret: bool = False):
    """Replay the (M, 3) merge table over a [B, L] batch of padded rows —
    each row one document, reference semantics per row
    (basic_tokenizer.zig:71-88). Returns (tokens', lengths) with rows
    prefix-compacted. L must be a multiple of 128 with L/128 in [8, 256]."""
    B, L = tokens.shape
    R = L // LANES
    if L % LANES or not (8 <= R <= 256):
        raise ValueError(f"row length {L} must be 128*R with 8 <= R <= 256")
    M = merges.shape[0]
    table = merges.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.int32),
            pltpu.VMEM((R, LANES), jnp.int32),
            # bitmap sized to the largest id the table can mint (<= u16 cap)
            pltpu.SMEM((max((256 + M + 31) // 32, 8),), jnp.int32),
        ],
    )

    def kernel(table, tok_ref, out_ref, buf, work, present):
        _encode_kernel(
            table, tok_ref.at[0], out_ref.at[0], buf, work, present, R=R, M=M
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(table, tokens.reshape(B, R, LANES))
    out = out.reshape(B, L)
    return out, jnp.sum((out >= 0).astype(jnp.int32), axis=1)
