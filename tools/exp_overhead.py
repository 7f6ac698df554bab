"""Isolate Pallas per-program overhead on the visibility kernel's grid.

P1: outputs only, empty body               -> launch + output-block cost
P2: + the three face-table inputs, no loop -> input block DMA cost
P3: P2 with half the grid (128x256 tiles)  -> per-program amortization
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tpu_renderer.ops.raster_pallas import _I_COLS, _cdiv, _pad_rows_to, pack_faces

H = W = 1024


def timeit(fn, *args, n=50, label=""):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(n)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[:4]
        best = min(best, (time.time() - t0) / n)
    print(f"{label:40s} {best*1e3:7.3f} ms")


def probe(tile_h, tile_w, with_inputs, fdata, idata, idx, counts, label):
    n_ty = _cdiv(H, tile_h)
    n_tx = _cdiv(W, tile_w)
    chunk = fdata.shape[0]

    if with_inputs:
        def kernel(c_ref, idx_ref, fd_ref, id_ref, zb_ref, tid_ref):
            @pl.when(pl.program_id(2) == 0)
            def _():
                zb_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
                tid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        in_specs = [
            pl.BlockSpec((1, 1, chunk, 1),
                         lambda ty, tx, c, s: (c, ty * n_tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, fdata.shape[1]), lambda ty, tx, c, s: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _I_COLS), lambda ty, tx, c, s: (c, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (counts, idx, fdata, idata)
    else:
        def kernel(c_ref, zb_ref, tid_ref):
            @pl.when(pl.program_id(2) == 0)
            def _():
                zb_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
                tid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)
        in_specs = []
        args = (counts,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx, 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
    )
    fn = jax.jit(lambda *a: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)])(*a))
    timeit(fn, *args, label=label)


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, _ = pp._build_face_batch(cfg, d, cam_m, None)
        fdata = pack_faces(faces, False)
        return fdata, idata

    fdata, idata = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    g0 = fdata.shape[0]
    chunk = min(rp.FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = jnp.asarray(_pad_rows_to(fdata, chunk))
    idata = jnp.asarray(_pad_rows_to(idata, chunk))
    idx = jnp.zeros((1, 128, chunk, 1), jnp.int32)
    counts = jnp.zeros(129, jnp.int32)

    probe(64, 128, False, fdata, idata, idx, counts, "P1 64x128 outputs-only")
    probe(64, 128, True, fdata, idata, idx, counts,  "P2 64x128 + face-table inputs")
    probe(128, 256, True, fdata, idata, idx, counts, "P3 128x256 + face-table inputs")
    probe(128, 128, True, fdata, idata, idx, counts, "P4 128x128 + face-table inputs")
    probe(64, 128, False, fdata, idata, idx, counts, "P1 again")


if __name__ == "__main__":
    main()
