"""Probe Pallas pipeline overhead on TPU: pure copy kernels with the merge
kernel's grid/spec structure, vs the real merge kernel. Establishes the
floor that kernel compute optimizations can reach."""

import functools
import sys
import time

import numpy as np
import sys
sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")

    R, LANES = 256, 128
    N = 1 << 25  # 33.5M tokens = 128 MB
    rows = N // LANES
    G = N // (R * LANES)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    x = jnp.zeros((rows, LANES), jnp.int32)
    sync(x)

    # (a) pure blocked copy
    def copy_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    @jax.jit
    def copy(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        )(x)

    # (b) copy + scalar SMEM carry (forces sequential semantics like merge)
    def copy_carry_kernel(i_ref, o_ref, s_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = 0

        t = i_ref[:]
        o_ref[:] = t
        carry[0] = carry[0] + jnp.sum((t >= 0).astype(jnp.int32))

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[0] = carry[0]

    @jax.jit
    def copy_carry(x):
        return pl.pallas_call(
            copy_carry_kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(x)

    # (c) copy + the 8-row lookahead second input (merge kernel structure)
    def copy_peek_kernel(i_ref, n_ref, o_ref, s_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0] = 0

        t = i_ref[:]
        o_ref[:] = t
        carry[0] = carry[0] + jnp.sum((t >= 0).astype(jnp.int32)) + n_ref[0, 0]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            s_ref[0] = carry[0]

    @jax.jit
    def copy_peek(x):
        return pl.pallas_call(
            copy_peek_kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (8, LANES),
                    lambda i: (jnp.minimum((i + 1) * (R // 8), rows // 8 - 1), 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        )(x, x)

    # (d) the real merge kernel
    from zigbpe_tpu.ops.pallas import merge as pm

    @jax.jit
    def real(x):
        out, stats = pm.merge_pass_pallas(x.reshape(-1), 101, 32, 300)
        return out

    def timeit(name, fn, n=3):
        fn(x)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s}: {min(ts)*1000:7.2f} ms  ({[f'{t*1000:.1f}' for t in ts]})")

    timeit("copy", copy)
    timeit("copy+carry", copy_carry)
    timeit("copy+peek", copy_peek)
    timeit("merge", real)



def main_loop():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")
    R, LANES = 256, 128
    N = 1 << 25
    rows = N // LANES
    G = N // (R * LANES)
    K = 64

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    x = jnp.zeros((rows, LANES), jnp.int32)
    sync(x)

    def copy_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:]

    def one_copy(x):
        return pl.pallas_call(
            copy_kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        )(x)

    @jax.jit
    def copy_loop(x):
        def step(t, _):
            return one_copy(t), None
        t, _ = jax.lax.scan(step, x, None, length=K)
        return t

    from zigbpe_tpu.ops.pallas import merge as pm

    @jax.jit
    def merge_loop(x):
        def step(t, _):
            out, _ = pm.merge_pass_pallas(t.reshape(-1), 101, 32, 300)
            return out.reshape(rows, LANES), None
        t, _ = jax.lax.scan(step, x, None, length=K)
        return t

    def timeit(name, fn, n=3):
        fn(x)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s}: {min(ts)/K*1000:7.2f} ms/pass  ({[f'{t*1000:.0f}' for t in ts]})")

    timeit("copyx64", copy_loop)
    timeit("mergex64", merge_loop)



if __name__ == "__main__":
    main_loop() if "loop" in sys.argv else main()
