"""Does int16 pay on the VPU? Times a Pallas kernel running the merge
kernel's representative op mix (flat shift via concat, compares, selects,
masked sums) on (rows,128) blocks in int32 vs int16, plus pure-copy floors.

If int16 ALU ops run ~2x (packed), the merge kernel should compute in
int16; if not, int16 only pays at the HBM edges (load/store) and the kernel
should cast at the edges.

Run: python scripts/probe_alu16.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    LANES = 128
    N = 1 << 25
    rows = N // LANES
    R = 256
    G = rows // R
    K = 32

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    sync(jax.device_put(np.ones((8,), np.int32)))

    def shift_left1(x, fill):
        # flat shift by 1: lane concat + row fixup (the kernel's hot pattern)
        R_, C = x.shape
        a = jnp.concatenate([x[:, 1:], jnp.full((R_, 1), fill, x.dtype)], axis=1)
        b = jnp.concatenate([x[1:, :1], jnp.full((1, 1), fill, x.dtype)], axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R_, C), 1)
        return jnp.where(col == C - 1, jnp.broadcast_to(b, (R_, C)), a)

    def opmix_kernel(i_ref, o_ref, *, dt, reps):
        tok = i_ref[:]
        fill = jnp.asarray(-1, dt)
        acc = tok
        for _ in range(reps):
            nxt = shift_left1(acc, fill)
            cand = (acc == jnp.asarray(101, dt)) & (nxt == jnp.asarray(32, dt))
            acc = jnp.where(cand, jnp.asarray(300, dt), acc)
            acc = jnp.where(nxt < 0, acc, jnp.maximum(acc, nxt))
        o_ref[:] = acc

    import functools

    def run(name, dt, reps):
        x = jnp.zeros((rows, LANES), dt)

        def one(x):
            return pl.pallas_call(
                functools.partial(opmix_kernel, dt=dt, reps=reps),
                grid=(G,),
                in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, LANES), dt),
            )(x)

        @jax.jit
        def loop(x):
            def step(t, _):
                return one(t), None
            t, _ = jax.lax.scan(step, x, None, length=K)
            return t

        loop(x)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / K * 1000
        print(f"{name:20s}: {ms:7.3f} ms/pass")
        return ms

    for reps in (0, 4, 16):
        a = run(f"int32 opmix x{reps}", jnp.int32, reps)
        b = run(f"int16 opmix x{reps}", jnp.int16, reps)
        if reps:
            print(f"  -> int16 ALU speedup at reps={reps}: {a/b:.2f}x")


if __name__ == "__main__":
    main()
