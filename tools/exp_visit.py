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
    def kernel(fdata_ref, idx_ref, zb_ref, tid_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (SLAB, TW), 0).astype(
            jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (SLAB, TW), 1).astype(
            jnp.float32)
        tid_ref[:] = jnp.zeros((32, TW), jnp.int32)
        zb_ref[:] = jnp.full((32, TW), 1e30, jnp.float32)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (SLAB, TW), 1) * 0

        def bcast(row_v, c):
            # row_v: (SLAB, TW) broadcast of the face row; lane c to all lanes
            return jnp.take_along_axis(row_v, lane_idx + c, axis=1)

        def body(k, _):
            if style.endswith("_idx"):
                f = idx_ref[k, 0]
            else:
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
                row_v2 = row_v
                av, bv, cv = bcast(row_v, 0), bcast(row_v, 1), bcast(row_v, 2)
                aw, bw, cw = bcast(row_v, 3), bcast(row_v, 4), bcast(row_v, 5)
                az, bz, cz = bcast(row_v, 6), bcast(row_v, 7), bcast(row_v, 8)
                v = av * cols + bv * rows + cv
                w = aw * cols + bw * rows + cw
                u = 1.0 - v - w
                z = az * cols + bz * rows + cz
            cov = (u >= 0) & (v >= 0) & (w >= 0)
            if "wmask" in style:
                cov &= ((cols >= bcast(row_v2, 12)) &
                        (cols < bcast(row_v2, 13)) &
                        (rows >= bcast(row_v2, 14)) &
                        (rows < bcast(row_v2, 15)))
            if "dslice" in style:
                s0 = (f & 3) * 8

                def apply():
                    zb_s = zb_ref[pl.ds(s0, SLAB), :]
                    upd = cov & (zb_s >= z)
                    tid_ref[pl.ds(s0, SLAB), :] = jnp.where(
                        upd, k, tid_ref[pl.ds(s0, SLAB), :])
                    zb_ref[pl.ds(s0, SLAB), :] = jnp.where(upd, z, zb_s)
                if "branch" in style:
                    ppc = (f & 7) == 3

                    @pl.when(ppc)
                    def _():
                        apply()

                    @pl.when(jnp.logical_not(ppc))
                    def _():
                        apply()
                else:
                    apply()
            else:
                upd = cov & (zb_ref[pl.ds(0, SLAB), :] >= z)
                tid_ref[pl.ds(0, SLAB), :] = jnp.where(
                    upd, k, tid_ref[pl.ds(0, SLAB), :])
                zb_ref[pl.ds(0, SLAB), :] = jnp.where(
                    upd, z, zb_ref[pl.ds(0, SLAB), :])
            return 0

        jax.lax.fori_loop(0, K, body, 0)
    return kernel


def run(style, fdata, idx):
    zb, tid = pl.pallas_call(
        mk_kernel(style),
        out_shape=[jax.ShapeDtypeStruct((32, TW), jnp.float32),
                   jax.ShapeDtypeStruct((32, TW), jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)],
    )(fdata, idx)
    return tid


def main():
    rng = np.random.RandomState(0)
    fdata = jnp.asarray(rng.randn(512, 128).astype(np.float32))
    idx = jnp.asarray((rng.permutation(np.arange(K) * 7 % 512))[:, None]
                      .astype(np.int32))

    def mixf(a, r):
        return a + (r >> 30).astype(a.dtype)

    freq_ghz = 0.94
    res = run_traced_each(
        [(s, lambda r, fd, s=s: run(s, mixf(fd, r), idx)[:8, :1])
         for s in ("vreg_affine", "vreg_affine_idx", "vreg_affine_wmask_idx",
                   "vreg_affine_wmask_dslice_idx",
                   "vreg_affine_wmask_dslice_branch_idx")],
        (fdata,))
    for name, ms, _ in res:
        cyc = ms * 1e-3 * freq_ghz * 1e9 / K
        print(f"{name:14s} {cyc:8.1f} cyc/visit")


if __name__ == "__main__":
    main()
