"""A/B the lazy-selection verify batch size for deep merge tables."""
import sys, time
sys.path.insert(0, ".")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from bench import load_corpus
    from zigbpe_tpu import train as train_mod

    def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
    data = load_corpus(mb << 20)
    sync(jax.device_put(np.ones((8,), np.int32)))
    tokens, length, ub_block = train_mod.upload(data)
    sync(tokens)
    ref = None
    for batch in (8, 16, 32):
        # warm (compile)
        m = train_mod.train_device(jnp.copy(tokens), length, vocab,
                                   length_host=len(data), ub_seed_block=ub_block,
                                   select_batch=batch)
        if ref is None: ref = m
        assert m == ref, f"batch={batch} diverges!"
        t0 = time.perf_counter()
        m = train_mod.train_device(jnp.copy(tokens), length, vocab,
                                   length_host=len(data), ub_seed_block=ub_block,
                                   select_batch=batch)
        dt = time.perf_counter() - t0
        print(f"batch={batch:3d}: {dt:6.2f}s  {mb/dt:6.2f} MB/s  ({len(m)} merges)")

if __name__ == "__main__":
    main()
