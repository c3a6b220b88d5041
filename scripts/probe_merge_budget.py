"""Op-level budget of the fused merge kernel's dense pass (VERDICT r5 #1).

Protocol: native-train the first NP golden merges on a real corpus,
precompute the NP intermediate streams with the REAL kernel (so every
variant sees realistic data and realistic fast-path statistics), stack
them, and replay all NP passes in ONE pallas dispatch per variant — each
variant a copy of the kernel with one piece of the machinery disabled.
Differences between variants are the per-piece cost; the `copy` variant is
the floor. Outputs are garbage for ablated variants (write traffic is kept
identical via the same store predicates).

Run: python scripts/probe_merge_budget.py [MB] [NP passes]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

LANES = 128
PAD = -1
NEG = -(2**31) + 1
BIG = 2**31 - 1


def make_variant(name, R, G, NP, rows, *, fastpath=True, parity=True,
                 minkept=True, edgekills=True, destscan=True, bitmove=True,
                 kills=True, candidates=True, store=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from zigbpe_tpu.ops.pallas.merge import (
        _compact_rows_bitmove, _max_scan_flat, _row_prefix_killed,
    )

    total_rows8 = NP * rows // 8

    def kernel(scalars, tok_ref, nxt_ref, dummy_ref, out_ref, stats_ref,
               work, obuf, carry, sem):
        i = pl.program_id(0)
        j = i % G       # block within the pass
        p = i // G      # pass index

        @pl.when(j == 0)
        def _init():
            carry[0] = NEG
            carry[1] = 0
            carry[2] = 0
            carry[3] = carry[3] * (p > 0)  # keep accumulating hits across passes
            carry[4] = 0
            carry[5] = BIG
            carry[8] = BIG

        @pl.when(i == 0)
        def _init0():
            carry[3] = 0
            carry[6] = 0
            carry[7] = 0

        a = scalars[3 * p]
        b = scalars[3 * p + 1]
        new_tok = scalars[3 * p + 2]

        tok = tok_ref[:]
        valid = tok >= 0
        L = jnp.sum(valid.astype(jnp.int32))

        slot = i % 2

        def store_block(value):
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
                out_ref.at[pl.ds(j * R, R), :],
                sem.at[slot],
            ).start()
            carry[6 + slot] = 1

        has_a = jnp.any(valid & (tok == a))
        has_b = jnp.any(valid & (tok == b)) | ((j != G - 1) & (nxt_ref[0, 0] == b))
        if fastpath:
            full = (carry[1] == 1) | (has_a & has_b)
        else:
            full = has_a | True

        def _fold_deferred():
            carry[5] = jnp.minimum(carry[5], carry[8])
            carry[8] = BIG

        def _skip():
            _fold_deferred()
            carry[0] = carry[2] + L - 1
            carry[2] = carry[2] + L
            carry[4] = carry[4] + L

        def _process():
            row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)

            nxt_in = jnp.concatenate(
                [tok[:, 1:], jnp.full((R, 1), PAD, tok.dtype)], axis=1
            )
            heads = jnp.broadcast_to(tok[:, :1], (R, LANES))
            hn = jnp.concatenate(
                [heads[1:, :], jnp.full((1, LANES), PAD, tok.dtype)], axis=0
            )
            edge = jnp.where(j == G - 1, jnp.int32(PAD), nxt_ref[0, 0])
            hn = jnp.where(row == R - 1, edge, hn)
            is_lastvalid = valid & (nxt_in < 0)
            nxt = jnp.where(is_lastvalid, hn, nxt_in)

            if candidates:
                cand = valid & (tok == a) & (nxt == b) & (nxt >= 0)
            else:
                cand = valid & (tok == a)
            ncand = jnp.sum(cand.astype(jnp.int32))
            if fastpath:
                act = (ncand > 0) | (carry[1] == 1)
            else:
                act = ncand >= 0

            @pl.when(~act)
            def _idle():
                _fold_deferred()
                carry[0] = carry[2] + L - 1
                carry[2] = carry[2] + L
                carry[4] = carry[4] + L

            @pl.when(act)
            def _do():
                _process_act(cand, nxt_in, is_lastvalid, row, col)

        def _process_act(cand, nxt_in, is_lastvalid, row, col):
            rowpop = jnp.sum(valid.astype(jnp.int32), axis=1, keepdims=True)

            if parity:
                def with_parity(c_mask):
                    rp = jnp.broadcast_to(rowpop, (R, LANES))
                    t = jnp.concatenate(
                        [jnp.zeros((1, LANES), jnp.int32), rp[:-1, :]], axis=0
                    )
                    s = 1
                    while s < R:
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

                hit32, c0 = jax.lax.cond(
                    a == b, with_parity, lambda c: (c, carry[0]),
                    cand.astype(jnp.int32),
                )
            else:
                hit32, c0 = cand.astype(jnp.int32), carry[0]
            hit = hit32 == 1

            if kills:
                killed_in = jnp.concatenate(
                    [jnp.zeros((R, 1), jnp.int32), hit32[:, :-1]], axis=1
                )
                if edgekills:
                    ehit = jnp.sum(
                        (hit & is_lastvalid).astype(jnp.int32), axis=1,
                        keepdims=True,
                    )
                    ke = jnp.broadcast_to(ehit, (R, LANES))
                    ke = jnp.concatenate(
                        [jnp.zeros((1, LANES), jnp.int32), ke[:-1, :]], axis=0
                    )
                    ke = jnp.where(row == 0, carry[1], ke)
                    killed = ((killed_in == 1) | ((col == 0) & (ke >= 1))) & valid
                else:
                    killed = (killed_in == 1) & valid
            else:
                killed = hit & False

            written = jnp.where(hit, new_tok, tok)
            keep = valid & ~killed
            rowkills = jnp.sum(killed.astype(jnp.int32), axis=1, keepdims=True)
            nkilled = jnp.sum(rowkills)
            nhits_blk = jnp.sum(hit32)
            mrk = jnp.max(rowkills)

            if store:
                @pl.when(nkilled > 0)
                def _do_compact():
                    if destscan:
                        shift = _row_prefix_killed(killed)
                    else:
                        shift = rowkills * 0  # broadcast zeros, no matmul
                    if bitmove:
                        store_block(
                            _compact_rows_bitmove(written, keep, shift, mrk, work)
                        )
                    else:
                        store_block(written)

                @pl.when((nkilled == 0) & (nhits_blk > 0))
                def _no_compact():
                    store_block(written)

            if minkept:
                rowkept = rowpop - rowkills
                ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
                ne = rowpop > 0
                last_ne = jnp.max(jnp.where(ne, ridx, -1))
                m_abl = jnp.min(jnp.where(ne & (ridx != last_ne), rowkept, BIG))
                last_kept = jnp.max(jnp.where(ridx == last_ne, rowkept, NEG))
                carry[5] = jnp.minimum(carry[5], jnp.minimum(carry[8], m_abl))
                carry[8] = last_kept

            carry[0] = c0
            carry[1] = jnp.sum(
                (hit & is_lastvalid & (row == R - 1)).astype(jnp.int32)
            )
            carry[2] = carry[2] + L
            carry[3] = carry[3] + nhits_blk
            carry[4] = carry[4] + (L - nkilled)

        if candidates:
            pl.when((L > 0) & ~full)(_skip)
            pl.when((L > 0) & full)(_process)
        else:
            # pure copy: no compute, just stream through the double buffer
            if store:
                pl.when(L >= 0)(lambda: store_block(tok))

        @pl.when(i == NP * G - 1)
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
            stats_ref[2] = jnp.minimum(carry[5], jnp.int32(BIG))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NP * G,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, LANES),
                lambda i, *_: (jnp.minimum((i + 1) * (R // 8), total_rows8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
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

    def call(scalars, stacked, dummy):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((3,), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            input_output_aliases={3: 0},
        )(scalars, stacked, stacked, dummy)

    return call


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    NP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    REPS = 4

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import load_corpus
    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.native import fastio
    from zigbpe_tpu.ops.pallas import merge as pm

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = load_corpus(mb << 20)
    gold = fastio.train(data, 256 + NP)
    table = np.asarray(gold, np.int32).reshape(-1, 3)[:NP]
    print(f"corpus {mb} MB, {NP} golden merges", file=sys.stderr)

    tokens, length, _ = train_mod.upload(data)
    N = tokens.shape[0]
    R = 256
    G = N // (R * LANES)
    rows = N // LANES

    # precompute the NP input streams with the real kernel
    streams = [tokens]
    t = tokens
    for p in range(NP - 1):
        t, _ = pm.merge_pass_pallas(
            t, int(table[p, 0]), int(table[p, 1]), int(table[p, 2])
        )
        streams.append(t)
    stacked = jnp.concatenate([s.reshape(rows, LANES) for s in streams], axis=0)
    sync(stacked)
    del streams, t, tokens
    scalars = jnp.asarray(table.reshape(-1))
    dummy = jnp.zeros((rows, LANES), jnp.int32)

    variants = [
        ("full", {}),
        ("nofast", dict(fastpath=False)),
        ("noparity", dict(parity=False)),
        ("nominkept", dict(minkept=False)),
        ("noedgek", dict(edgekills=False)),
        ("noscan", dict(destscan=False)),
        ("nobitmove", dict(bitmove=False, destscan=False)),
        ("nokills", dict(kills=False, bitmove=False, destscan=False,
                         minkept=False, edgekills=False)),
        ("nostore", dict(store=False)),
        ("copy", dict(candidates=False, parity=False, minkept=False,
                      kills=False, destscan=False, bitmove=False,
                      edgekills=False, fastpath=False)),
    ]

    results = {}
    for name, kw in variants:
        call = make_variant(name, R, G, NP, rows, **kw)

        @jax.jit
        def loop(scalars, stacked, dummy):
            def step(c, _):
                out, st = call(scalars, stacked, c)
                return out, st
            out, sts = jax.lax.scan(step, dummy, None, length=REPS)
            return out, sts

        try:
            out = loop(scalars, stacked, dummy)
            sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(scalars, stacked, dummy)
                sync(out)
                ts.append(time.perf_counter() - t0)
            ms = min(ts) / (REPS * NP) * 1000
            results[name] = ms
            print(f"{name:10s}: {ms:7.3f} ms/pass   (runs {[f'{x*1000:.0f}' for x in ts]})")
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")

    if "full" in results:
        print("\n--- budget (delta vs full; negative = that piece costs) ---")
        for name, ms in results.items():
            if name != "full":
                print(f"{name:10s}: {results['full'] - ms:+7.3f} ms")


if __name__ == "__main__":
    main()
