"""Probe the streaming floor: blocked copy at varying block sizes and
dtypes, to establish whether the per-pass floor is grid-step overhead or
true HBM bandwidth, and what int16 buys. Loops K passes inside one jit
(single dispatch; the tunnel adds ~30 ms per dispatch)."""

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
    LANES = 128
    N = 1 << 25  # 33.5M tokens
    rows = N // LANES
    K = 64

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def copy_loop(dtype, R):
        G = rows // R
        x = jnp.zeros((rows, LANES), dtype)

        def copy_kernel(i_ref, o_ref):
            o_ref[:] = i_ref[:]

        def one(x):
            return pl.pallas_call(
                copy_kernel,
                grid=(G,),
                in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, LANES), dtype),
            )(x)

        @jax.jit
        def loop(x):
            def step(t, _):
                return one(t), None
            t, _ = jax.lax.scan(step, x, None, length=K)
            return t

        loop(x)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / K * 1000
        nbytes = rows * LANES * np.dtype(dtype).itemsize
        gbs = 2 * nbytes / (ms / 1000) / 1e9
        print(f"copy {np.dtype(dtype).name:6s} R={R:5d} G={G:5d}: {ms:7.3f} ms/pass  {gbs:6.0f} GB/s eff")

    for dtype in (jnp.int32, jnp.int16):
        for R in (128, 256, 512, 1024, 2048):
            try:
                copy_loop(dtype, R)
            except Exception as e:
                print(f"copy {np.dtype(dtype).name} R={R}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
