"""Bisect which constructs Mosaic accepts on this backend: cross-lane
reshape, 2D transpose, bf16/int8 dot_general shapes, iota tricks."""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/zigbpe_jax_cache")

    def try_kernel(name, kern, out_shape, *ins):
        try:
            r = pl.pallas_call(kern, out_shape=out_shape)(*ins)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
            print(f"OK   {name}")
            return True
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:100]}")
            return False

    x = jnp.arange(32 * 128, dtype=jnp.int32).reshape(32, 128) % 500
    f = jnp.ones((256, 128), jnp.bfloat16)

    try_kernel(
        "reshape (32,128)->(4096,1)",
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(4096, 1)),
        jax.ShapeDtypeStruct((4096, 1), jnp.int32), x,
    )
    try_kernel(
        "reshape (32,128)->(4096,)->(4096,1) via [:,None]",
        lambda i, o: o.__setitem__(slice(None), i[:].reshape(-1)[:, None]),
        jax.ShapeDtypeStruct((4096, 1), jnp.int32), x,
    )
    try_kernel(
        "transpose (32,128)->(128,32)",
        lambda i, o: o.__setitem__(slice(None), i[:].T),
        jax.ShapeDtypeStruct((128, 32), jnp.int32), x,
    )
    try_kernel(
        "iota mod trick (4096, 8)",
        lambda i, o: o.__setitem__(
            slice(None),
            (jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1) % 4) + i[:],
        ),
        jax.ShapeDtypeStruct((32, 128), jnp.int32), x,
    )
    try_kernel(
        "bf16 dot (128,256)@(256,128)",
        lambda i, o: o.__setitem__(
            slice(None),
            jax.lax.dot_general(
                i[:], i[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
        ),
        jax.ShapeDtypeStruct((128, 128), jnp.float32), f,
    )
    # skinny lhs dot: (4096, 8)^T @ (4096, 128)
    g = jnp.ones((4096, 8), jnp.bfloat16)
    h = jnp.ones((4096, 128), jnp.bfloat16)

    def skinny(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try:
        r = pl.pallas_call(
            skinny,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(g, h)
        np.asarray(r[0, 0])
        print("OK   skinny dot (4096,8)^T@(4096,128)")
    except Exception as e:
        print(f"FAIL skinny dot: {type(e).__name__}: {str(e)[:100]}")

    # one-hot build from (4096,1) int + iota compare, then dot
    def onehot_dot(t_ref, o_ref):
        t = t_ref[:]  # (4096, 1)
        hi = ((t >> 7) == jax.lax.broadcasted_iota(jnp.int32, (4096, 8), 1)).astype(jnp.bfloat16)
        lo = ((t & 127) == jax.lax.broadcasted_iota(jnp.int32, (4096, 128), 1)).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            hi, lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    t1 = (jnp.arange(4096, dtype=jnp.int32) % 500)[:, None]
    try:
        r = pl.pallas_call(
            onehot_dot, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(t1)
        v = np.asarray(r)
        print(f"OK   onehot+dot from (4096,1) input, sum={v.sum()}")
    except Exception as e:
        print(f"FAIL onehot+dot: {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
