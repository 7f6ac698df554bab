"""Probe: which take_along_axis(axis=0) shapes lower inside Mosaic?

Variants isolate failure modes:
  pure8   : (8,128) ref-loaded table, axis-0 gather only
  slice8  : (16,128) table, sublane-sliced halves, axis-0 gathers + select
  chain8  : pure axis-0 gather then axis-1 lane gather
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

rng = np.random.default_rng(0)


def try_run(name, kernel, ins, want):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(want.shape, jnp.int32),
        )(*[jnp.asarray(a) for a in ins])
        out = np.asarray(out)
        ok = bool((out == want).all())
        print(f"{name}: lowered OK; correct: {ok}")
        if not ok:
            bad = np.argwhere(out != want)[:4]
            for i, j in bad:
                print(f"   out[{i},{j}]={out[i, j]} want={want[i, j]}")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


def main():
    tab8 = rng.integers(0, 1 << 20, (8, 128), dtype=np.int32)
    r8 = rng.integers(0, 8, (8, 128), dtype=np.int32)
    c8 = rng.integers(0, 128, (8, 128), dtype=np.int32)

    def pure8(tab_ref, r_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], r_ref[:], axis=0)

    try_run("pure8", pure8, [tab8, r8], tab8[r8, np.arange(128)[None, :]])

    def chain8(tab_ref, r_ref, c_ref, out_ref):
        t = jnp.take_along_axis(tab_ref[:], r_ref[:], axis=0)
        out_ref[:] = jnp.take_along_axis(t, c_ref[:], axis=1)

    try_run("chain8", chain8, [tab8, r8, c8], tab8[r8, c8])

    tab16 = rng.integers(0, 1 << 20, (16, 128), dtype=np.int32)
    r16 = rng.integers(0, 16, (8, 128), dtype=np.int32)

    def slice8(tab_ref, r_ref, out_ref):
        tab = tab_ref[:]
        g0 = jnp.take_along_axis(tab[0:8, :], jnp.minimum(r_ref[:], 7),
                                 axis=0)
        g1 = jnp.take_along_axis(tab[8:16, :], jnp.clip(r_ref[:] - 8, 0, 7),
                                 axis=0)
        out_ref[:] = jnp.where(r_ref[:] < 8, g0, g1)

    try_run("slice8", slice8, [tab16, r16],
            tab16[r16, np.arange(128)[None, :]])


if __name__ == "__main__":
    main()


def extra():
    tab16 = rng.integers(0, 1 << 20, (16, 128), dtype=np.int32)
    r16 = rng.integers(0, 16, (8, 128), dtype=np.int32)
    c8 = rng.integers(0, 128, (8, 128), dtype=np.int32)

    def full_composite(tab_ref, r_ref, c_ref, out_ref):
        tab = tab_ref[:]
        g0 = jnp.take_along_axis(tab[0:8, :], jnp.minimum(r_ref[:], 7),
                                 axis=0)
        g1 = jnp.take_along_axis(tab[8:16, :], jnp.clip(r_ref[:] - 8, 0, 7),
                                 axis=0)
        t = jnp.where(r_ref[:] < 8, g0, g1)
        out_ref[:] = jnp.take_along_axis(t, c_ref[:], axis=1)

    try_run("composite16", full_composite, [tab16, r16, c8], tab16[r16, c8])

    tab8 = rng.integers(0, 1 << 20, (8, 128), dtype=np.int32)
    r8 = rng.integers(0, 8, (8, 128), dtype=np.int32)

    def chain8_barrier(tab_ref, r_ref, c_ref, out_ref):
        t = jnp.take_along_axis(tab_ref[:], r_ref[:], axis=0)
        t = jax.lax.optimization_barrier(t)
        out_ref[:] = jnp.take_along_axis(t, c_ref[:], axis=1)

    try_run("chain8_barrier", chain8_barrier, [tab8, r8, c8], tab8[r8, c8])


extra()
