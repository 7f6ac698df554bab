"""How big can a scalar-prefetch (SMEM) operand be on this TPU?

Tries growing i32 scalar-prefetch arrays until compile fails; reads a few
entries so the operand is live. Binary relevance: can the bin idx table
(~655K entries at diablo scale) ride SMEM instead of 128x-padded VMEM
blocks?
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def try_size(n):
    tab = jnp.arange(n, dtype=jnp.int32)

    def kernel(tab_ref, x_ref, o_ref):
        s = tab_ref[0] + tab_ref[n // 2] + tab_ref[n - 1]
        o_ref[...] = x_ref[...] + s

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = jnp.zeros((8, 128), jnp.int32)
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
    out = np.asarray(f(tab, x))
    expect = 0 + n // 2 + (n - 1)
    assert out[0, 0] == expect, (out[0, 0], expect)
    return True


def main():
    for n in (1 << 15, 1 << 16, 1 << 17, 1 << 18, 1 << 19, 1 << 20):
        try:
            ok = try_size(n)
            print(f"{n:>9} i32 ({n * 4 / 1024:7.0f} KiB): OK")
        except Exception as e:
            print(f"{n:>9} i32 ({n * 4 / 1024:7.0f} KiB): FAIL "
                  f"{type(e).__name__} {str(e)[:160]}")
            break


if __name__ == "__main__":
    main()
