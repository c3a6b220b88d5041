"""A/B the lazy-selection pop formulations at the shrunk-corpus floor.

Config: 32K-token corpus (fully shrunk), vocab 1280, 256 rounds — the regime
where the per-round fixed floor dominates 1K-merge training. Variants:

  oldsel : full-table pops (two V^2 reductions per pop, the round-2 shape)
  newsel : rowmax-cached pops (O(V) reads per pop, round-3 shape)
  merge  : merge pass only (replayed golden merges), no selection
  full   : shipped train_chunk_lazy (select + merge + ub maintenance)

Each loops its rounds inside one jit (single dispatch; the tunnel adds
~30 ms per dispatch), timed by scalar readback.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.native import fastio
    from zigbpe_tpu.ops import core

    V = 1280
    ROUNDS = 256
    CAP = 32768

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = open("tests/data/taylorswift.txt", "rb").read()[:CAP - 1]
    sync(jax.device_put(np.ones((8,), np.int32)))
    tokens, length = core.pad_tokens(data, CAP)
    hist = fastio.byte_pair_hist(data)
    ub0 = train_mod._place_byte_hist(jnp.asarray(hist), vocab_size=V)
    gold = fastio.train(data, 256 + ROUNDS)
    mtab = jnp.asarray(np.asarray(gold, np.int32).reshape(-1, 3))
    sync(tokens); sync(ub0)

    ids_flat = jax.lax.broadcasted_iota(jnp.int32, (V * V,), 0)

    def old_select(u, toks):
        """Round-2 pop shape: batch=8 iterated argmaxes over the V^2 table."""
        a, b = core.pair_streams(toks)
        pid_stream = jnp.where(b >= 0, a * V + b, -1)

        def round_(state):
            u, _, _, _ = state
            masked = u
            pids = []
            for _ in range(8):
                c = jnp.max(masked)
                pid = jnp.max(jnp.where(masked == c, ids_flat, -1))
                pids.append(pid)
                masked = masked.at[pid].set(-1)
            pids = jnp.stack(pids)
            exact = jnp.stack(
                [jnp.sum((pid_stream == p).astype(jnp.int32)) for p in pids]
            )
            u = u.at[pids].set(exact)
            c2 = jnp.max(u)
            pid2 = jnp.max(jnp.where(u == c2, ids_flat, -1))
            verified = jnp.any(pids == pid2) | (c2 == 0)
            return u, pid2, c2, verified

        state = round_((u, jnp.int32(-1), jnp.int32(0), jnp.bool_(False)))
        u, pid, c, _ = jax.lax.while_loop(
            lambda s: ~s[-1], round_, state
        )
        return pid // V, pid % V, c, u

    @jax.jit
    def oldsel_chunk(toks, u):
        def body(k, state):
            u, acc = state
            ta, tb, cnt, u = old_select(u, toks)
            u = u.at[ta * V + tb].set(0)
            return (u, acc + cnt)

        return jax.lax.fori_loop(0, ROUNDS, body, (u, jnp.int32(0)))

    @jax.jit
    def newsel_chunk(toks, u):
        def body(k, state):
            u, rm, acc = state
            ta, tb, cnt, u, rm = core.select_top_pair_lazy(u, toks, V, rowmax=rm)
            u2 = u.reshape(V, V)
            u2 = u2.at[ta, tb].set(0)
            rm = rm.at[ta].set(
                jnp.max(jax.lax.dynamic_slice(u2, (ta, 0), (1, V)))
            )
            return (u2.reshape(V * V), rm, acc + cnt)

        u, rm, acc = jax.lax.fori_loop(
            0, ROUNDS, body, (u, core.rowmax_of(u, V), jnp.int32(0))
        )
        return u, acc

    @jax.jit
    def merge_chunk(toks):
        return core.encode_replay(toks, mtab)

    @jax.jit
    def maint_chunk(u):
        """update_ub_after_merge only (replayed golden pairs)."""
        def body(k, state):
            u, rm = state
            row = jax.lax.dynamic_slice(mtab, (k, 0), (1, 3))[0]
            u, rm = core.update_ub_after_merge(
                u, rm, row[0], row[1], row[2], jnp.int32(5), V
            )
            return (u, rm)

        return jax.lax.fori_loop(
            0, ROUNDS, body, (u, core.rowmax_of(u, V))
        )

    @jax.jit
    def full_chunk(toks, u):
        mg = jnp.full((ROUNDS, 3), core.PAD, jnp.int32)
        occ = jnp.zeros((ROUNDS,), jnp.int32)
        return core.train_chunk_lazy(
            toks, jnp.int32(len(data)), u, mg, occ, jnp.int32(0),
            vocab_size=V, max_rounds=ROUNDS,
        )

    def timeit(name, fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:8s}: {best*1000:8.1f} ms  {best/ROUNDS*1000:7.3f} ms/round")

    timeit("merge", lambda: merge_chunk(jnp.copy(tokens)))
    timeit("oldsel", lambda: oldsel_chunk(tokens, jnp.copy(ub0)))
    timeit("newsel", lambda: newsel_chunk(tokens, jnp.copy(ub0)))
    timeit("maint", lambda: maint_chunk(jnp.copy(ub0)))
    timeit("full", lambda: full_chunk(jnp.copy(tokens), jnp.copy(ub0)))


if __name__ == "__main__":
    main()
