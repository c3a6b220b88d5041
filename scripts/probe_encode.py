"""Measure the batched Pallas encode kernel (config-3 serving path):
frozen 1K-merge table over the device-resident corpus in 32K-token rows.

Run: python scripts/probe_encode.py [MB] [rowtokens]
"""

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
    from zigbpe_tpu.native import fastio
    from zigbpe_tpu.ops import core
    from zigbpe_tpu.ops.pallas import encode as pe

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 32768

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    data = load_corpus(mb << 20)
    sync(jax.device_put(np.ones((8,), np.int32)))
    t0 = time.perf_counter()
    table = fastio.train(data[: 1 << 20], 256 + 1024)
    print(f"native table train: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    gt, gl = pe.group_merges(np.asarray(table, np.int32).reshape(-1, 3))
    print(f"fused passes: {len(gl)} for {len(table)} merges", file=sys.stderr)
    gt, gl = jnp.asarray(gt), jnp.asarray(gl)

    tokens, _ = core.pad_tokens(data, len(data))
    B = tokens.shape[0] // L
    rows = tokens[: B * L].reshape(B, L)
    sync(rows)

    fn = pe.encode_rows_grouped
    _, lens = fn(rows, gt, gl)
    sync(lens)
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, lens = fn(rows, gt, gl)
        sync(lens)
        runs.append(B * L / (time.perf_counter() - t0) / 1e6)
    print(f"encode {mb} MB rows={L}: {max(runs):.1f} MB/s  (runs {[f'{r:.1f}' for r in runs]})")
    print(f"tokens out: {int(np.asarray(lens).sum())}")


if __name__ == "__main__":
    main()
