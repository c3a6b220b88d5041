"""A/B the merge kernel's grid block size (block_rows): per-block fixed
work amortizes with bigger blocks; VMEM caps them. Times K real merge
passes (alternating pairs so every pass has hits) inside one jit."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from bench import load_corpus
    from zigbpe_tpu.ops import core
    from zigbpe_tpu.ops.pallas import merge as pm

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    K = 64

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = load_corpus(mb << 20)
    sync(jax.device_put(np.ones((8,), np.int32)))
    tokens, length = core.pad_tokens(data, len(data))
    sync(tokens)

    # K dense-ish passes: merge the two most common byte pairs alternately
    # into throwaway ids (every pass touches most blocks)
    pairs = [(101, 32), (115, 32), (111, 117), (116, 104)]

    for R in (256, 512, 1024):
        import functools

        @jax.jit
        def loop(toks, R=R):
            def step(t, k):
                pa = jnp.asarray([p[0] for p in pairs])[k % len(pairs)]
                pb = jnp.asarray([p[1] for p in pairs])[k % len(pairs)]
                out, stats = pm.merge_pass_pallas(
                    t, pa, pb, 256 + k, block_rows=R
                )
                return out, stats[0]
            t, hits = jax.lax.scan(step, toks, jnp.arange(K, dtype=jnp.int32))
            return t, hits

        try:
            out = loop(jnp.copy(tokens))
            sync(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(jnp.copy(tokens))
                sync(out)
                ts.append(time.perf_counter() - t0)
            ms = min(ts) / K * 1000
            print(f"block_rows={R:5d}: {ms:7.3f} ms/pass "
                  f"(hits first 4: {np.asarray(out[1][:4]).tolist()})")
        except Exception as e:
            print(f"block_rows={R}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
