"""A/B the merge kernel grid block size inside the REAL trainer loop
(monkeypatched default) at the headline and deep-vocab regimes."""

import functools
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
    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.ops.pallas import merge as pm

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    sync(jax.device_put(np.ones((8,), np.int32)))
    orig = pm.merge_pass_pallas

    for mb, vocab in ((32, 512), (8, 1280)):
        data = load_corpus(mb << 20)
        tokens, length, ub_block = train_mod.upload(data)
        sync(tokens)
        ref = None
        for R in (256, 1024):
            pm.merge_pass_pallas = functools.partial(orig, block_rows=R)
            m = train_mod.train_device(
                jnp.copy(tokens), length, vocab, length_host=len(data),
                ub_seed_block=ub_block)  # warm/compile
            if ref is None:
                ref = m
            assert m == ref, f"R={R} diverges"
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                train_mod.train_device(
                    jnp.copy(tokens), length, vocab, length_host=len(data),
                    ub_seed_block=ub_block)
                ts.append(time.perf_counter() - t0)
            print(f"{mb}MB vocab={vocab} R={R:4d}: {min(ts):6.2f}s "
                  f"{mb/min(ts):6.2f} MB/s", flush=True)
        pm.merge_pass_pallas = orig


if __name__ == "__main__":
    main()
