"""Probe the in-kernel MXU one-hot histogram cost (the building block of
exact pair-count maintenance): copy kernel + two masked V-bin histograms of
the block values, accumulated across the sequential grid in VMEM scratch.

Measures ms/pass added over plain copy at several vocab sizes, with and
without per-subchunk skip (hit-free subchunks skip their matmul), for both
bf16 and int8 one-hot operands.
"""

import functools
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
    R = 256
    N = 1 << 25
    rows = N // LANES
    G = rows // R
    K = 32

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    def make(V, S, ot, density_mod, skip):
        """S = subchunk rows; ot = one-hot dtype; density_mod: hit when
        tok % density_mod == 0 (0 = no hits anywhere)."""
        Vh = -(-V // 128)

        def kern(tok_ref, out_ref, hist_ref, acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            tok = tok_ref[:]
            out_ref[:] = tok
            if density_mod:
                m = ((tok % density_mod) == 0).astype(jnp.float32)
            else:
                m = jnp.zeros((R, LANES), jnp.float32)
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (S * LANES, 2 * Vh), 1) % Vh
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (S * LANES, LANES), 1)
            half = jax.lax.broadcasted_iota(jnp.int32, (S * LANES, 2 * Vh), 1) >= Vh
            for s in range(R // S):
                t = tok[s * S : (s + 1) * S, :].reshape(S * LANES, 1)
                ms = m[s * S : (s + 1) * S, :].reshape(S * LANES, 1)

                def do():
                    hi = (t >> 7) == hi_iota
                    # two masks stacked in one operand: [mL block | mR block]
                    mm = jnp.where(half, ms, 1.0 - ms)
                    a = jnp.where(hi, mm, 0.0).astype(ot)
                    lo = ((t & 127) == lo_iota).astype(ot)
                    acc[:] += jax.lax.dot_general(
                        a, lo, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                if skip:
                    nh = jnp.sum(ms)

                    @pl.when(nh > 0)
                    def _(do=do):
                        do()
                else:
                    do()

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                hist_ref[:] = acc[:].astype(jnp.int32)

        @jax.jit
        def loop(x):
            def one(t):
                return pl.pallas_call(
                    kern,
                    grid=(G,),
                    in_specs=[pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
                    out_specs=(
                        pl.BlockSpec((R, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec(memory_space=pltpu.VMEM),
                    ),
                    out_shape=(
                        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                        jax.ShapeDtypeStruct((2 * Vh, 128), jnp.int32),
                    ),
                    scratch_shapes=[pltpu.VMEM((2 * Vh, 128), jnp.float32)],
                )(t)

            def step(t, _):
                o, h = one(t)
                return o, h[0, 0]

            t, hs = jax.lax.scan(step, x, None, length=K)
            return t, hs

        return loop

    x = jnp.abs(jax.random.randint(jax.random.PRNGKey(0), (rows, LANES), 0, 500, jnp.int32))
    sync(x)

    def timeit(name, loop):
        try:
            loop(x)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)/K*1000:7.3f} ms/pass")

    for V in (512, 1280, 4352):
        for ot in (jnp.bfloat16,):
            for S in (8, 32):
                timeit(f"hist V={V:5d} S={S:3d} {np.dtype(ot).name} dense  ", make(V, S, ot, 7, False))
        timeit(f"hist V={V:5d} S= 32 bfloat16 skip-on dense", make(V, 32, jnp.bfloat16, 7, True))
        timeit(f"hist V={V:5d} S= 32 bfloat16 skip-on nohit", make(V, 32, jnp.bfloat16, 0, True))


if __name__ == "__main__":
    main()
