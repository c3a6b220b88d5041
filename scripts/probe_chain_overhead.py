"""Where do the extra ~2.4 ms/pass go between the kernel's own dense-pass
cost (probe_merge_budget: 2.71 ms) and the trainer's measured merge cost
(~5.1 ms)? Candidates: alias-copy inserted when the scan carry has other
consumers, cond-wrapping, the shrink-loop structure.

Times 16 golden merges at 32 MB under several chaining structures.
Run: python scripts/probe_chain_overhead.py [MB] [NP]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    NP = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import load_corpus
    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.native import fastio
    from zigbpe_tpu.ops.pallas import merge as pm
    from zigbpe_tpu.ops import core

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = load_corpus(mb << 20)
    gold = fastio.train(data, 256 + NP)
    table = np.asarray(gold, np.int32).reshape(-1, 3)[:NP]
    mtab = jnp.asarray(table)

    tokens, length, _ = train_mod.upload(data)
    sync(tokens)

    def timeit(name, fn, n=3):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:28s}: {best*1000:8.1f} ms total  {best/NP*1000:7.3f} ms/pass")
        return best

    # 1. bare scan: carry -> kernel -> carry; nothing else reads the carry
    @jax.jit
    def bare(toks):
        def step(t, row):
            out, stats = pm.merge_pass_pallas(t, row[0], row[1], row[2])
            return out, stats[0]
        t, hits = jax.lax.scan(step, toks, mtab)
        return hits

    # 2. scan with the live/cond wrapper (encode_replay's structure, minus
    #    the final compact_stream)
    @jax.jit
    def with_cond(toks):
        def step(t, row):
            live = row[2] >= 0

            def do(t):
                out, stats = pm.merge_pass_pallas(t, row[0], row[1], row[2])
                return jax.lax.cond(
                    stats[2] <= 1, lambda x: core.compact_stream(x)[0],
                    lambda x: x, out,
                )

            t = jax.lax.cond(live, do, lambda t: t, t)
            return t, row[2]
        t, hits = jax.lax.scan(step, toks, mtab)
        return hits

    # 3. scan where the carry is ALSO read by a masked reduction before the
    #    kernel (the trainer's structure: select's verify pass reads toks)
    @jax.jit
    def with_read(toks):
        def step(t, row):
            cnt = jnp.sum(((t == row[0])).astype(jnp.int32))  # extra consumer
            out, stats = pm.merge_pass_pallas(t, row[0], row[1], row[2])
            return out, cnt + stats[0]
        t, hits = jax.lax.scan(step, toks, mtab)
        return hits

    # 4. while_loop version of (1) (the trainer uses while_loop, not scan)
    @jax.jit
    def bare_while(toks):
        def cond(state):
            return state[1] < NP

        def body(state):
            t, k, acc = state
            row = jax.lax.dynamic_slice(mtab, (k, 0), (1, 3))[0]
            out, stats = pm.merge_pass_pallas(t, row[0], row[1], row[2])
            return out, k + 1, acc + stats[0]

        t, _, acc = jax.lax.while_loop(cond, body, (toks, jnp.int32(0), jnp.int32(0)))
        return acc

    timeit("bare scan", lambda: bare(jnp.copy(tokens)))
    timeit("scan + cond wrapper", lambda: with_cond(jnp.copy(tokens)))
    timeit("scan + extra carry read", lambda: with_read(jnp.copy(tokens)))
    timeit("bare while_loop", lambda: bare_while(jnp.copy(tokens)))


if __name__ == "__main__":
    main()
