"""Slope-based timing (removes the ~30 ms tunnel dispatch+sync constant):
run the same workload at two repetition counts inside one jit and report
(T2 - T1) / (reps2 - reps1). Measures the real device cost of

  * chained dense merge passes (the trainer's structure: carry-aliased)
  * one-call stacked dense passes (the kernel's intrinsic cost)
  * chained copy / read floors

Run: python scripts/probe_slope.py [MB] [NP]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench import load_corpus
    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.native import fastio
    from zigbpe_tpu.ops.pallas import merge as pm

    import os, pickle
    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = load_corpus(mb << 20)
    cache = f"/tmp/gold{NP}_{mb}.pkl"
    if os.path.exists(cache):
        gold = pickle.load(open(cache, "rb"))
    else:
        gold = fastio.train(data, 256 + NP)
        pickle.dump(gold, open(cache, "wb"))
    mtab = jnp.asarray(np.asarray(gold, np.int32).reshape(-1, 3)[:NP])

    tokens, length, _ = train_mod.upload(data)
    N = tokens.shape[0]
    sync(tokens)

    def slope(name, make_fn, r1, r2, per_rep_passes):
        f1, f2 = make_fn(r1), make_fn(r2)
        sync(f1()); sync(f2())
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter(); sync(f1()); t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); sync(f2()); t2s.append(time.perf_counter() - t0)
        t1, t2 = min(t1s), min(t2s)
        per = (t2 - t1) / (r2 - r1) / per_rep_passes * 1000
        print(f"{name:34s}: {per:7.3f} ms/pass   (T{r1}={t1*1000:.0f} T{r2}={t2*1000:.0f})")
        return per

    # A. chained dense: each rep replays the NP golden merges from the
    #    pristine stream (inner scan carry re-initialised per rep)
    def make_chained(reps):
        @jax.jit
        def run(toks):
            def rep(acc, _):
                def step(t, row):
                    out, stats = pm.merge_pass_pallas(t, row[0], row[1], row[2])
                    return out, stats[0]
                t, hits = jax.lax.scan(step, toks, mtab)
                return acc + hits[-1], None
            acc, _ = jax.lax.scan(rep, jnp.int32(0), None, length=reps)
            return acc
        return lambda: run(tokens)

    # B. chained no-hit (skip path; stream never changes)
    def make_nohit(reps):
        @jax.jit
        def run(toks):
            def rep(carry, _):
                acc, t = carry
                def step(t, _):
                    out, stats = pm.merge_pass_pallas(t, 60000, 60001, 60002)
                    return out, stats[1]
                t, lens = jax.lax.scan(step, t, None, length=NP)
                return (acc + lens[-1], t), None
            (acc, t), _ = jax.lax.scan(rep, (jnp.int32(0), toks), None, length=reps)
            return acc
        return lambda: run(jnp.copy(tokens))

    # C. chained XLA copy (read + write a fresh buffer per pass)
    def make_copy(reps):
        @jax.jit
        def run(toks):
            def rep(carry, _):
                acc, t = carry
                def step(t, _):
                    t2 = t + 1
                    return t2, t2[0]
                t, heads = jax.lax.scan(step, t, None, length=NP)
                return (acc + heads[-1], t), None
            (acc, t), _ = jax.lax.scan(rep, (jnp.int32(0), toks), None, length=reps)
            return acc
        return lambda: run(jnp.copy(tokens))

    slope("chained dense merges", make_chained, 1, 3, NP)
    slope("chained no-hit (skip path)", make_nohit, 1, 3, NP)
    slope("chained elementwise +1 (XLA)", make_copy, 1, 3, NP)


if __name__ == "__main__":
    main()
