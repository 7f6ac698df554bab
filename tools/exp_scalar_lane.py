"""Can Mosaic do a dynamic-lane SCALAR load from a VMEM table?

Tests e = ref[0, k >> 7, k & 127] (dynamic sublane AND lane) against the
known-good (chunk, 1) sublane-only pattern, and times both.
"""
from __future__ import annotations

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

N = 4096
ITERS = 2048


def kern_sub(tab_ref, o_ref):
    def body(k, acc):
        return acc + tab_ref[k & (N - 1), 0]
    acc = jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    o_ref[...] = jnp.full((8, 128), acc, jnp.int32)


def kern_lane(tab_ref, o_ref):
    def body(k, acc):
        kk = k & (N - 1)
        return acc + tab_ref[kk >> 7, kk & 127]
    acc = jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))
    o_ref[...] = jnp.full((8, 128), acc, jnp.int32)


def run(kern, tab, shape):
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(shape, lambda: (0,) * len(shape),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )
    return f(tab)


def main():
    tab = jnp.arange(N, dtype=jnp.int32)
    t_sub = tab.reshape(N, 1)
    t_lane = tab.reshape(N // 128, 128)

    r1 = run(kern_sub, t_sub, (N, 1))
    print("sublane result ok:", int(r1[0, 0]))
    try:
        r2 = run(kern_lane, t_lane, (N // 128, 128))
        print("lane result:", int(r2[0, 0]), "match:", int(r1[0, 0]) == int(r2[0, 0]))
    except Exception as e:
        print("lane FAILED:", type(e).__name__, str(e)[:500])
        return

    # timing: run each 64x chained
    import time
    def timeit(kern, tab, shape, name):
        @jax.jit
        def prog(tab):
            acc = jnp.int32(0)
            for _ in range(32):
                t = tab + (acc >> 30)
                o = run_jit(kern, t, shape)
                acc = o[0, 0]
            return acc
        def run_jit(kern, t, shape):
            return pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            )(t)
        np.asarray(prog(tab))
        t0 = time.perf_counter()
        np.asarray(prog(tab))
        dt = (time.perf_counter() - t0) / 32 / ITERS
        print(f"{name}: {dt * 1e9:.1f} ns/read")

    timeit(kern_sub, t_sub, (N, 1), "sublane (N,1)")
    timeit(kern_lane, t_lane, (N // 128, 128), "lane (N/128,128)")


if __name__ == "__main__":
    main()
