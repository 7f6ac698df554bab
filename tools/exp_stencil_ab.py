"""Within-process A/B of the stencil kernel: HEAD version vs working tree.

TPU contention is ±40% across processes (CLAUDE.md) — the only trustworthy
comparison runs both variants in ONE process on identical inputs. The HEAD
kernel is materialized from git to /tmp and imported as a sibling module
(absolute imports keep it wired to the live package for everything else).

Reps chain through an input the kernel actually consumes (zbuf += tiny *
consumed scalar) to defeat CSE and device-side overlap.
"""
from __future__ import annotations

import shutil
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

H = W = 1024
REPS = 8


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp_new
    from tpu_renderer.ops.shadow import prepare_quads
    from tpu_renderer.utils.profiling import trace, summarize_device_trace

    old_src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         "HEAD:tpu_renderer/ops/raster_pallas.py"],
        capture_output=True, text=True, check=True).stdout
    with open("/tmp/rp_head.py", "w") as f:
        f.write(old_src)
    sys.path.insert(0, "/tmp")
    import rp_head as rp_old

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp_new.face_bins(faces, H, W)
        zb_sign, tid = rp_new.visibility_pallas(
            faces, H, W, sign, bins=bins[:2])
        zbuf = zb_sign * sign
        screen, counts, ok, n_sil, sil_cap = prepare_quads(cfg, d, cam_m)
        sil_cap = max(sil_cap)  # largest compaction level (tuple since r5)
        return (zbuf, screen[:sil_cap], counts[:sil_cap], ok[:sil_cap])

    zbuf, screen, counts, ok = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]

    def measure(name, rp):
        @jax.jit
        def program(zbuf):
            acc = jnp.int32(0)
            outs = []
            for _ in range(REPS):
                zb = zbuf + (acc >> 30).astype(jnp.float32)
                qdata, qi = rp.pack_quads(screen, counts, ok, H, W, near, far)
                st = rp.stencil_pallas(qdata, qi, zb, H, W, sign, near, far)
                acc = st[0, 0]
                outs.append(st[:8, :1])
            return jnp.concatenate(outs)

        out = np.asarray(program(zbuf))
        ld = f"/tmp/exp_stencil_{name}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(program(zbuf))
        rows = summarize_device_trace(ld)
        tot = sum(ms for ms, _, _ in rows) / REPS
        print(f"{tot:8.3f} ms/call total  {name}")
        for ms, cnt, nm in sorted(rows, reverse=True)[:20]:
            print(f"    {ms / REPS:7.3f} ms  x{cnt}  {nm[:100]}")
        return out

    a = measure("old", rp_old)
    b = measure("new", rp_new)
    a2 = measure("old2", rp_old)
    b2 = measure("new2", rp_new)
    assert (a == b).all(), "stencil outputs diverge between variants!"
    print("outputs identical:", bool((a == b).all() and (a2 == b2).all()))


if __name__ == "__main__":
    main()
