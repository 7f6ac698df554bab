"""Per-stage device timings of the flagship 1024^2 frame.

SUPERSEDED by tools/exp_fulltrace.py for kernel attribution: standalone-jit
stage timings measured here carry several ms of per-call dispatch that the
in-frame device trace does not (e.g. the fused kernel reads 12 ms standalone
vs 6 ms in-frame) — use this only for rough end-to-end stage sanity, and the
profiler-based tools for real numbers.

Microbenchmark discipline for the axon tunnel (CLAUDE.md): inputs made
device-resident first (jnp.asarray), each stage jitted standalone, timed with
an enqueue-N / sync-small-slice loop so neither compile time nor the 28 MB/s
download is measured. Run on the TPU: `python tools/profile_stages.py`.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    sync = lambda o: np.asarray(
        jax.tree_util.tree_leaves(o)[0]).ravel()[:8]
    sync(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        outs = [fn(*args) for _ in range(n)]
        sync(outs[-1])
        best = min(best, (time.time() - t0) / n)
    print(f"{label:42s} {best * 1e3:8.3f} ms")
    return out, best


def main():
    from bench import build_scene, orbit_position
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.shadow import prepare_quads

    scene = build_scene()
    cfg, dyn = scene._prepare()
    _wg = all(mc.win_grid for mc in cfg.models if mc.win_kinds)
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    H, W = cfg.resolution
    sign = cfg.system
    total = 0.0

    @jax.jit
    def full(d):
        return pp.render_frame(cfg, d)[0]
    _, t_full = timeit(full, dyn, label="FULL render_frame")

    @jax.jit
    def f_batch(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        return faces, attrs, cam_m
    (faces, attrs, cam_m), t = timeit(f_batch, dyn, label="vertex+face batch")
    total += t

    @jax.jit
    def f_bins(fc):
        return rp.face_bins(fc, H, W)
    bins, t = timeit(f_bins, faces, label="face_bins (XLA)")
    total += t

    n_kinds = max((len(mc.win_kinds) for mc in cfg.models), default=0)

    @jax.jit
    def f_vis(fc, at, bn):
        return rp.visibility_gbuffer_pallas(
            fc, at, H, W, sign, bins=bn[:2], with_tex_tables=False)
    (zb_sign, tid, gbuffer), t = timeit(
        f_vis, faces, attrs, bins, label="visibility+gbuffer kernel")
    total += t

    windows_parts = []
    for mc, md in zip(cfg.models, dyn["models"]):
        if not mc.win_kinds:
            continue
        w = md["windows"]
        if w.shape[1] < 16 * n_kinds:
            w = jnp.pad(w, ((0, 0), (0, 16 * n_kinds - w.shape[1]), (0, 0)))
        windows_parts.append(w)
    windows = jnp.concatenate(windows_parts, axis=0)

    @jax.jit
    def f_samp(fc, bn, win, tid_, gb):
        return rp.sample_textures_pallas(
            fc, bn[:2], win, tid_, gb[rp.GB_IU], gb[rp.GB_IV], H, W, n_kinds,
            win_grid=_wg)
    (samp, samp_mask), t = timeit(
        f_samp, faces, bins, windows, tid, gbuffer, label="texture sampler kernel")
    total += t

    @jax.jit
    def f_quads(d, cm):
        return prepare_quads(cfg, d, cm)[:3]
    (screen, qcounts, qok), t = timeit(
        f_quads, dyn, cam_m, label="shadow silhouette+clip (XLA)")
    total += t
    sil_cap = max(64, -(-screen.shape[0] // 3 // 64) * 64)
    screen = screen[:sil_cap]
    qcounts = qcounts[:sil_cap]
    qok = qok[:sil_cap]

    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]

    @jax.jit
    def f_pack(sc, ct, ok, zb):
        qdata, qi = rp.pack_quads(sc, ct, ok, H, W, near, far)
        return qdata, qi
    (qdata, qi), t = timeit(f_pack, screen, qcounts, qok, zb_sign,
                            label="pack_quads (XLA)")
    total += t

    zbuf = zb_sign * sign

    @jax.jit
    def f_sten(qd, qi_, zb):
        return rp.stencil_pallas(qd, qi_, zb, H, W, sign, near, far)
    stencil, t = timeit(f_sten, qdata, qi, zbuf, label="stencil kernel (incl bins)")
    total += t

    @jax.jit
    def f_shade(d, tid_, st, gb, sp, spm):
        frame = pp._shade_gbuffer(cfg, d, tid_, st, gb, None if False else
                                  pp._cam_matrices(cfg, d["camera"],
                                                   cfg.cam_projection_type),
                                  samp=sp, samp_mask=spm)
        return (jnp.clip(frame[::-1] ** 0.8, 0, 1) * 255).astype(jnp.uint8)
    _, t = timeit(f_shade, dyn, tid, stencil, gbuffer, samp, samp_mask,
                  label="shading+flip+gamma (XLA)")
    total += t

    print(f"{'SUM of stages':42s} {total * 1e3:8.3f} ms")
    print(f"{'fps (full)':42s} {1.0 / t_full:8.1f}")


if __name__ == "__main__":
    main()
