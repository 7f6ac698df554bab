"""Microbenchmarks of the individual Pallas kernels on the flagship inputs.

Resident device inputs, n=50 enqueues per round, sync on a tiny slice
(CLAUDE.md tunnel discipline: per-call fixed cost ~= 30ms/n from the final
sync; compare A/B within one process only).
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=50, label=""):
    out = fn(*args)
    sync = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:8]
    sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(n)]
        sync(outs[-1])
        best = min(best, (time.time() - t0) / n)
    print(f"{label:46s} {best * 1e3:8.3f} ms")
    return out


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.shadow import prepare_quads

    scene = build_scene()
    cfg, dyn = scene._prepare()
    _wg = all(mc.win_grid for mc in cfg.models if mc.win_kinds)
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    H, W = cfg.resolution
    sign = cfg.system

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, attrs, bins, cam_m

    faces, attrs, bins, cam_m = jax.tree_util.tree_map(
        jnp.asarray, setup(dyn))

    vis = jax.jit(lambda fc, bn: rp.visibility_pallas(
        fc, H, W, sign, bins=bn[:2]))
    zb_sign, tid = timeit(vis, faces, bins, label="visibility_pallas (z+id only)")

    visg = jax.jit(lambda fc, at, bn: rp.visibility_gbuffer_pallas(
        fc, at, H, W, sign, bins=bn[:2], with_tex_tables=False))
    zb_sign, tid, gbuffer = timeit(visg, faces, attrs, bins,
                                   label="visibility_gbuffer_pallas")

    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)
    windows = dyn["windows_all"]
    samp = jax.jit(lambda fc, bn, win, t, gb: rp.sample_textures_pallas(
        fc, bn[:2], win, t, gb[rp.GB_IU], gb[rp.GB_IV], H, W, n_kinds,
        win_grid=_wg))
    timeit(samp, faces, bins, windows, tid, gbuffer,
           label="sample_textures_pallas")

    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]

    @jax.jit
    def quads(d, cm):
        screen, counts, ok, n_sil, cap = prepare_quads(cfg, d, cm)
        cap = max(cap)  # largest compaction level (tuple since r5)
        return screen[:cap], counts[:cap], ok[:cap]
    screen, qcounts, qok = jax.tree_util.tree_map(
        jnp.asarray, quads(dyn, cam_m))

    @jax.jit
    def pack(sc, ct, ok_):
        return rp.pack_quads(sc, ct, ok_, H, W, near, far)
    qdata, qi = jax.tree_util.tree_map(jnp.asarray, pack(screen, qcounts, qok))

    zbuf = (zb_sign * sign).block_until_ready()
    sten = jax.jit(lambda qd, qi_, zb: rp.stencil_pallas(
        qd, qi_, zb, H, W, sign, near, far))
    timeit(sten, qdata, qi, zbuf, label="stencil_pallas (compact, incl bins)")


if __name__ == "__main__":
    main()
