"""Per-round device-time breakdown of the training hot loop on real TPU.

Decomposes the per-round cost of the lazy trainer at a fixed capacity into
select (lazy pop+verify) vs merge (fused Pallas pass) vs loop overhead, by
timing three 64-round variants (true sync = scalar readback; the tunnel's
block_until_ready does not block):

  full   : train_chunk_lazy as shipped
  replay : identical rounds but selection replaced by a precomputed merge
           table (encode_replay over the first 64 golden merges) -> merge cost
  select : train_chunk_lazy with the merge pass stubbed to a no-op kill of
           the found pair's count (selection + ub maintenance cost)

Run:  python scripts/profile_breakdown.py [MB] [rounds]
"""

import sys
import time

import numpy as np


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, ".")
    from bench import load_corpus
    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.ops import core
    from zigbpe_tpu.native import fastio

    V = 256 + rounds

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = load_corpus(mb << 20)
    sync(jax.device_put(np.ones((8,), np.int32)))  # tunnel warm-up

    # golden merges for the replay variant (native host trainer)
    t0 = time.perf_counter()
    gold = fastio.train(data, V)
    print(f"native train ({mb} MB, {rounds} merges): {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)
    mtab = jnp.asarray(np.asarray(gold, np.int32).reshape(-1, 3))

    tokens, length, ub_block = train_mod.upload(data)
    ub0 = train_mod._place_byte_hist(ub_block, vocab_size=V)
    merges0 = jnp.full((rounds, 3), core.PAD, jnp.int32)
    occ0 = jnp.zeros((rounds,), jnp.int32)
    sync(tokens); sync(ub0)

    import functools

    @jax.jit
    def full_chunk(toks, L, ub, mg, occ):
        return core.train_chunk_lazy(
            toks, L, ub, mg, occ, jnp.int32(0),
            vocab_size=V, max_rounds=rounds, use_pallas=True)

    @jax.jit
    def replay_chunk(toks):
        return core.encode_replay(toks, mtab, use_pallas=True)

    @jax.jit
    def select_chunk(toks, L, ub):
        """Selection-only: pops+verify+ub maintenance, merge stubbed (the
        found bin is zeroed so the loop advances; corpus never changes)."""
        def body(k, state):
            u, rm, acc = state
            ta, tb, cnt, u, rm = core.select_top_pair_lazy(u, toks, V, rowmax=rm)
            u = u.reshape(V, V).at[ta, tb].set(0).reshape(V * V)
            rm = rm.at[ta].set(
                jnp.max(jax.lax.dynamic_slice(u.reshape(V, V), (ta, 0), (1, V)))
            )
            return (u, rm, acc + cnt)
        u, rm, acc = jax.lax.fori_loop(
            0, rounds, body, (ub, core.rowmax_of(ub, V), jnp.int32(0))
        )
        return u, acc

    def timeit(name, fn, n=3):
        fn()  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:8s}: {best*1000:8.1f} ms total  {best/rounds*1000:7.2f} ms/round  (runs: {[f'{t*1000:.0f}' for t in ts]})")
        return best

    t_full = timeit("full", lambda: full_chunk(jnp.copy(tokens), length, jnp.copy(ub0), merges0, occ0))
    t_replay = timeit("replay", lambda: replay_chunk(jnp.copy(tokens)))
    t_select = timeit("select", lambda: select_chunk(tokens, length, jnp.copy(ub0)))

    print(f"\nderived: merge={t_replay/rounds*1000:.2f} ms/rd  select~={t_select/rounds*1000:.2f} ms/rd  "
          f"other~={(t_full-t_replay-t_select)/rounds*1000:.2f} ms/rd")

    # single-op timings at this capacity
    one_merge = jax.jit(lambda t: core.merge_pass(t, 101, 32, 256))
    from zigbpe_tpu.ops.pallas import merge as pm
    one_merge_p = jax.jit(lambda t: pm.merge_pass_pallas(t, 101, 32, 256))
    timeit("1xla_mrg", lambda: one_merge(jnp.copy(tokens)), n=3)
    timeit("1pal_mrg", lambda: one_merge_p(jnp.copy(tokens)), n=3)


if __name__ == "__main__":
    main()
