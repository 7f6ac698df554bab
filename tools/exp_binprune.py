"""A/B: exact edge-coverage pruning in face_bins vs bbox-only binning.

The exact prune costs ~0.29 ms of _face_edge_coeffs + the corner-max reduce
inside bin_primitives, per frame. Flagship faces are tiny (p50 bbox 3 px),
where the bbox is already near-exact — does the prune still pay for itself
in saved kernel visits?

One process, reps chained through a consumed input (aff) per CLAUDE.md.
"""
from __future__ import annotations

import shutil
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp

H = W = 1024
REPS = 6


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.utils.profiling import trace, summarize_device_trace

    scene = build_scene()
    cfg, dyn = scene._prepare()
    _wg = all(mc.win_grid for mc in cfg.models if mc.win_kinds)
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        return pp._build_face_batch(cfg, d, cam_m, None)

    faces, attrs = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    windows = dyn["windows_all"]

    # Visit counts under each binning.
    for exact in (True, False):
        cnts = np.asarray(rp.face_bins(faces, H, W, exact=exact)[0])
        print(f"exact={exact}: visits={cnts.sum()} max_tile={cnts.max()}")

    def measure(name, exact):
        @jax.jit
        def program(faces, attrs):
            acc = jnp.int32(0)
            outs = []
            for _ in range(REPS):
                fc = dict(faces, aff=faces["aff"]
                          + (jnp.abs(acc) >> 30).astype(jnp.float32))
                bins = rp.face_bins(fc, H, W, exact=exact)
                o = rp.visibility_gbuffer_pallas(
                    fc, attrs, H, W, sign, bins=bins[:2],
                    with_tex_tables=False, windows=windows, n_kinds=n_kinds,
                    win_grid=_wg)
                acc = o[1][0, 0]
                outs.append(o[1][:8, :1])
            return jnp.concatenate(outs)

        out = np.asarray(program(faces, attrs))
        ld = f"/tmp/exp_binprune_{name}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(program(faces, attrs))
        rows = summarize_device_trace(ld)
        tot = sum(ms for ms, _, _ in rows) / REPS
        print(f"{tot:8.3f} ms/call total  {name}")
        agg = {}
        for ms, cnt, nm in rows:
            key = nm.split("  ")[-1][-60:]
            agg[key] = agg.get(key, 0.0) + ms / REPS
        for key, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:8]:
            print(f"    {ms:7.3f} ms  {key}")
        return out

    a = measure("exact", True)
    b = measure("bbox", False)
    a2 = measure("exact2", True)
    b2 = measure("bbox2", False)
    print("outputs identical:", bool((a == b).all() and (a2 == b2).all()))


if __name__ == "__main__":
    main()
