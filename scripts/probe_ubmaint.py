"""Isolate the per-round cost of update_ub_after_merge at deep vocab.

profile_breakdown.py at 8 MB / 1024 rounds shows full=3.58 ms/rd,
merge=0.90, select=0.21 -> other=2.47 ms/rd. The only remaining per-round
work is ub/rowmax maintenance (update_ub_after_merge) plus merge-table
bookkeeping. This probe times K rounds of each candidate in one jit.

Run: python scripts/probe_ubmaint.py [V] [K]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from zigbpe_tpu.ops import core

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    sync(jax.device_put(np.ones((8,), np.int32)))
    rng = np.random.default_rng(0)
    ub0 = jnp.asarray(rng.integers(0, 1000, (V * V,), dtype=np.int32))
    rm0 = core.rowmax_of(ub0, V)

    def timeit(name, fn, *args):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:24s}: {best*1000:8.1f} ms total  {best/K*1000:7.3f} ms/round")

    @jax.jit
    def maint_loop(ub, rm):
        def body(k, s):
            u, r = s
            ta = (k * 7) % V
            tb = (k * 13) % V
            new_id = (k * 29) % V
            return core.update_ub_after_merge(u, r, ta, tb, new_id,
                                              jnp.int32(5), V)
        return jax.lax.fori_loop(0, K, body, (ub, rm))

    @jax.jit
    def maint_rows_only(ub, rm):
        """Same but with the COLUMN slice/update replaced by row ops — to
        attribute cost to lane-dim dynamic slicing."""
        def body(k, s):
            u, r = s
            ta = (k * 7) % V
            tb = (k * 13) % V
            new_id = (k * 29) % V
            u2 = u.reshape(V, V)
            row_bound = jnp.minimum(jax.lax.dynamic_slice(u2, (tb, 0), (1, V)), 5)
            u2 = u2.at[ta, tb].set(0)
            u2 = jax.lax.dynamic_update_slice(u2, row_bound, (new_id, 0))
            r = r.at[ta].set(jnp.max(jax.lax.dynamic_slice(u2, (ta, 0), (1, V))))
            r = r.at[new_id].set(jnp.max(row_bound[0]))
            return u2.reshape(V * V), r
        return jax.lax.fori_loop(0, K, body, (ub, rm))

    @jax.jit
    def col_slice_only(ub):
        def body(k, u):
            ta = (k * 7) % V
            u2 = u.reshape(V, V)
            col = jax.lax.dynamic_slice(u2, (0, ta), (V, 1))
            u2 = jax.lax.dynamic_update_slice(u2, jnp.minimum(col, 5), (0, (k * 29) % V))
            return u2.reshape(V * V)
        return jax.lax.fori_loop(0, K, body, ub)

    @jax.jit
    def row_slice_only(ub):
        def body(k, u):
            ta = (k * 7) % V
            u2 = u.reshape(V, V)
            row = jax.lax.dynamic_slice(u2, (ta, 0), (1, V))
            u2 = jax.lax.dynamic_update_slice(u2, jnp.minimum(row, 5), ((k * 29) % V, 0))
            return u2.reshape(V * V)
        return jax.lax.fori_loop(0, K, body, ub)

    timeit("update_ub_after_merge", maint_loop, ub0, rm0)
    timeit("rows-only variant", maint_rows_only, ub0, rm0)
    timeit("col slice+update", col_slice_only, ub0)
    timeit("row slice+update", row_slice_only, ub0)


if __name__ == "__main__":
    main()
