"""Phase decomposition of the fused visibility+gbuffer+sampler kernel.

  full  : everything
  nosamp: z pass + interp, no texture sampling
  nogb  : z pass + phase-1 win scan only (no interp, no sampling)
  zonly : z pass only

Run WITH A MODE ARGUMENT (one process per mode): compiling several mode
variants of the kernel into one process trips the 16 MB scoped-VMEM
compiler limit that a single variant stays under.
  for m in full nosamp nogb zonly; do python tools/exp_fused.py $m; done
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp

H = W = 1024


def main():
    from bench import build_scene, build_highpoly_scene
    from tpu_renderer.ops import pipeline as pp

    if "--highpoly" in sys.argv:
        n = int(sys.argv[sys.argv.index("--highpoly") + 1])
        scene = build_highpoly_scene(
            n, cull="--cull" in sys.argv,
            cam_height=1.5 if "--low" in sys.argv else 4.5)
    else:
        scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, attrs, bins[:2]

    faces, attrs, bins = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    windows = dyn["windows_all"]

    # Past FACE_CHUNK faces the pipeline runs the SPLIT path: measure the
    # phase-1-only kernel (tid_in, pruned bins) — zonly then times pure
    # grid/streaming machinery (both phases gated off).
    split = faces["sx"].shape[0] > rp.FACE_CHUNK
    tid_in = None
    if split:
        @jax.jit
        def setup2(faces):
            zb, tid = rp.visibility_pallas(faces, H, W, sign, bins=bins)
            keep = rp.phase1_keep(faces, zb, H, W, sign)
            bins1 = rp.face_bins(faces, H, W, keep=keep)
            return tid, bins1[:2]
        tid_in, bins = jax.tree_util.tree_map(jnp.asarray, setup2(faces))

    # Chain the reps (each consumes a scalar of the previous tid): without a
    # data dependency XLA overlaps two kernel instances and their combined
    # scoped VMEM (2 x ~8.7 MB) trips the 16 MB compiler limit.
    import shutil
    from tpu_renderer.utils.profiling import trace, summarize_device_trace

    REPS = 6

    def measure(mode):
        @jax.jit
        def program(faces, attrs):
            acc = jnp.int32(0)
            outs = []
            for _ in range(REPS):
                # aff reaches fdata (valid does not — bins are precomputed),
                # so this both defeats CSE and serializes the reps. abs()
                # first: tid[0, 0] is the BACKGROUND (-1), and -1 >> 30 is
                # -1 — the round-2 version shifted every affine coefficient
                # by -1.0 in reps 2+, collapsing coverage and silently
                # skipping the interp/sampling phases (measured: corrupted
                # reps 3.7 ms vs true 6.0 ms per call).
                fc = dict(faces, aff=faces["aff"]
                          + (jnp.abs(acc) >> 30).astype(jnp.float32))
                o = rp.visibility_gbuffer_pallas(
                    fc, attrs, H, W, sign, bins=bins, with_tex_tables=False,
                    windows=windows, n_kinds=n_kinds, mode=mode,
                    win_grid=all(mc.win_grid for mc in cfg.models
                                 if mc.win_kinds), tid_in=tid_in)
                probe = (o[0][0] if split else o[1])
                acc = probe[0, 0].astype(jnp.int32)
                outs.append(probe[:8, :1].astype(jnp.int32))
            return jnp.concatenate(outs)

        np.asarray(program(faces, attrs))
        ld = f"/tmp/exp_fused_{mode}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(program(faces, attrs))
        rows = summarize_device_trace(ld)
        tot = sum(ms for ms, _, _ in rows) / REPS
        print(f"{tot:8.3f} ms/call  {mode}")

    for m in (sys.argv[1:] or ["full", "nosamp", "nogb", "zonly"]):
        measure(m)


if __name__ == "__main__":
    main()
