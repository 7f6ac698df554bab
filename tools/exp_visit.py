"""Per-visit cost microbench: what does one (face, tile) visit cost?

Variants (all loop K visits over one resident (16, 128) slab, RMW a tile):
  scalar_bary : current style — ~12 dynamic scalar reads + barycentric setup
  scalar_affine: 9 dynamic scalar reads of precomputed affine coeffs
  vreg_affine : 1 dynamic row load + lane-broadcast coeffs (no scalar reads)

Run on the TPU. Times via the device trace (deterministic).
"""
from __future__ import annotations

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tools.exp_trace import run_traced_each

K = 4096          # visits
SLAB = 16
TW = 128


def mk_kernel(style):
    def kernel(fdata_ref, zb_ref, tid_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (SLAB, TW), 0).astype(
            jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (SLAB, TW), 1).astype(
            jnp.float32)
        tid_ref[:] = jnp.zeros((SLAB, TW), jnp.int32)
        zb_ref[:] = jnp.full((SLAB, TW), 1e30, jnp.float32)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (SLAB, TW), 1) * 0

        def bcast(row_v, c):
            # row_v: (SLAB, TW) broadcast of the face row; lane c to all lanes
            return jnp.take_along_axis(row_v, lane_idx + c, axis=1)

        def body(k, _):
            f = jax.lax.rem(k * 7, 512)
            if style == "scalar_bary":
                sx0, sx1, sx2 = (fdata_ref[f, 0], fdata_ref[f, 1],
                                 fdata_ref[f, 2])
                sy0, sy1, sy2 = (fdata_ref[f, 3], fdata_ref[f, 4],
                                 fdata_ref[f, 5])
                v0x, v0y = sx1 - sx0, sy1 - sy0
                v1x, v1y = sx2 - sx0, sy2 - sy0
                d00 = v0x * v0x + v0y * v0y
                d01 = v0x * v1x + v0y * v1y
                d11 = v1x * v1x + v1y * v1y
                inv_denom = 1.0 / (d00 * d11 - d01 * d01)
                v2x = cols - sx0
                v2y = rows - sy0
                d20 = v2x * v0x + v2y * v0y
                d21 = v2x * v1x + v2y * v1y
                v = (d11 * d20 - d01 * d21) * inv_denom
                w = (d00 * d21 - d01 * d20) * inv_denom
                u = 1.0 - v - w
                z = (u * fdata_ref[f, 6] + v * fdata_ref[f, 7] +
                     w * fdata_ref[f, 8])
            elif style == "scalar_affine":
                av, bv, cv = (fdata_ref[f, 0], fdata_ref[f, 1],
                              fdata_ref[f, 2])
                aw, bw, cw = (fdata_ref[f, 3], fdata_ref[f, 4],
                              fdata_ref[f, 5])
                az, bz, cz = (fdata_ref[f, 6], fdata_ref[f, 7],
                              fdata_ref[f, 8])
                v = av * cols + bv * rows + cv
                w = aw * cols + bw * rows + cw
                u = 1.0 - v - w
                z = az * cols + bz * rows + cz
            else:
                row = fdata_ref[pl.ds(f, 1), :]
                row_v = jnp.broadcast_to(row, (SLAB, TW))
                av, bv, cv = bcast(row_v, 0), bcast(row_v, 1), bcast(row_v, 2)
                aw, bw, cw = bcast(row_v, 3), bcast(row_v, 4), bcast(row_v, 5)
                az, bz, cz = bcast(row_v, 6), bcast(row_v, 7), bcast(row_v, 8)
                v = av * cols + bv * rows + cv
                w = aw * cols + bw * rows + cw
                u = 1.0 - v - w
                z = az * cols + bz * rows + cz
            cov = (u >= 0) & (v >= 0) & (w >= 0)
            upd = cov & (zb_ref[:] >= z)
            tid_ref[:] = jnp.where(upd, k, tid_ref[:])
            zb_ref[:] = jnp.where(upd, z, zb_ref[:])
            return 0

        jax.lax.fori_loop(0, K, body, 0)
    return kernel


def run(style, fdata):
    zb, tid = pl.pallas_call(
        mk_kernel(style),
        out_shape=[jax.ShapeDtypeStruct((SLAB, TW), jnp.float32),
                   jax.ShapeDtypeStruct((SLAB, TW), jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
    )(fdata)
    return tid


def main():
    rng = np.random.RandomState(0)
    fdata = jnp.asarray(rng.randn(512, 128).astype(np.float32))

    def mixf(a, r):
        return a + (r >> 30).astype(a.dtype)

    freq_ghz = 0.94
    res = run_traced_each(
        [(s, lambda r, fd, s=s: run(s, mixf(fd, r))[:8, :1])
         for s in ("scalar_bary", "scalar_affine", "vreg_affine")],
        (fdata,))
    for name, ms, _ in res:
        cyc = ms * 1e-3 * freq_ghz * 1e9 / K
        print(f"{name:14s} {cyc:8.1f} cyc/visit")


if __name__ == "__main__":
    main()
