"""Measure the batched-replay encode kernel on TPU: frozen 1024-merge
table over the bench corpus reshaped to 32K-token rows."""
import sys, time
sys.path.insert(0, ".")
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from bench import load_corpus
    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.ops.pallas import encode as pe
    from zigbpe_tpu.ops import encode_batch as eb

    def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    data = load_corpus(mb << 20)
    sync(jax.device_put(np.ones((8,), np.int32)))

    # frozen table: 1024 merges trained on-device on the same corpus
    tokens, length, ub_block = train_mod.upload(data)
    t0 = time.perf_counter()
    merges = train_mod.train_device(jnp.copy(tokens), length, 1280,
                                    length_host=len(data), ub_seed_block=ub_block)
    print(f"device train 1024 merges on {mb}MB: {time.perf_counter()-t0:.1f}s "
          f"({len(merges)} merges)", file=sys.stderr)
    mtab = jnp.asarray(np.asarray(merges, np.int32))

    L = 32768
    B = tokens.shape[0] // L
    rows = tokens[: B * L].reshape(B, L)

    kfn = jax.jit(pe.encode_rows_pallas)
    out, lens = kfn(rows, mtab); sync(lens)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, lens = kfn(rows, mtab)
        sync(lens)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    nbytes = B * L
    print(f"pallas encode: {nbytes/best/1e6:.1f} MB/s  ({[f'{t*1000:.0f}ms' for t in ts]})")
    total = int(np.asarray(lens).sum())
    print(f"compression: {nbytes} -> {total} tokens ({nbytes/total:.3f}x)")

    # XLA batch path on a 4 MB slice (M full-batch sorts -- slow; scale-invariant MB/s)
    Bx = max((4 << 20) // L, 1)
    rx = rows[:Bx]
    xfn = jax.jit(eb.encode_batch)
    _, lx = xfn(rx, mtab); sync(lx)
    t0 = time.perf_counter()
    _, lx = xfn(rx, mtab); sync(lx)
    dt = time.perf_counter() - t0
    print(f"xla encode:    {Bx*L/dt/1e6:.1f} MB/s  (on {Bx*L>>20} MB)")

if __name__ == "__main__":
    main()
