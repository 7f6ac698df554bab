"""Break down prepare_quads' 2 ms: silhouette, extrude, argsort, gather,
clip, project."""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tools.exp_trace import run_traced_each

H = W = 1024


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops.shadow import (silhouette_edges, extrude_quads,
                                         QUAD_PMAX)
    from tpu_renderer.ops.frustum import clip_polygon
    from tpu_renderer.ops.transforms import matmul

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        return cam_m

    cam_m = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    light = dyn["light"]

    mds = [(mc, md) for mc, md in zip(cfg.models, dyn["models"])
           if mc.shadowing and mc.num_edges]

    def mixf(a, r):
        return a + (r >> 30).astype(a.dtype)

    def sil_fn(r, _):
        outs = []
        for mc, md in mds:
            sil, a, b = silhouette_edges(
                mixf(md["verts"], r), md["vid"], md["pad_valid"],
                md["inc_edge"], md["inc_dir"], md["inc_valid"],
                light["position"], mc.num_edges)
            outs.append(sil.astype(jnp.int32)[:8])
        return jnp.concatenate(outs)[:, None]

    @jax.jit
    def mk(d):
        quads, flags = [], []
        for mc, md in mds:
            sil, a_vid, b_vid = silhouette_edges(
                md["verts"], md["vid"], md["pad_valid"], md["inc_edge"],
                md["inc_dir"], md["inc_valid"], light["position"],
                mc.num_edges)
            quads.append(extrude_quads(md["verts"], a_vid, b_vid, light,
                                       cfg.light_type))
            flags.append(sil)
        return jnp.concatenate(quads), jnp.concatenate(flags)

    quad, sil = jax.tree_util.tree_map(jnp.asarray, mk(dyn))
    e_total = quad.shape[0]
    cap1 = max(64, -(-e_total // 5 // 64) * 64)
    print(f"e_total={e_total} cap1={cap1}")

    def ext_fn(r, _):
        outs = []
        for mc, md in mds:
            n = md["inc_edge"].shape[0]
            a = jnp.arange(n) % md["verts"].shape[0]
            q = extrude_quads(mixf(md["verts"], r), a, a, light,
                              cfg.light_type)
            outs.append(q[:8, 0, :1])
        return jnp.concatenate(outs)

    def sort_fn(r, _):
        order = jnp.argsort(~(sil ^ (r > 10)), stable=True)
        return order[:8, None]

    order = jnp.asarray(jnp.argsort(~sil, stable=True))

    def gath_fn(r, _):
        sel = order[: cap1]
        return (mixf(quad, r)[sel])[:8, 0, :1]

    qsel = jnp.asarray(quad[order[:cap1]])
    padded0 = jnp.zeros((cap1, QUAD_PMAX, 4), jnp.float32).at[:, :4].set(qsel)
    counts0 = jnp.full(cap1, 4, jnp.int32)
    planes = cam_m["frustum_planes"]

    def clip_fn(r, _):
        clipped, counts = jax.vmap(
            lambda v, c: clip_polygon(v, c, planes))(mixf(padded0, r),
                                                     counts0)
        return clipped[:8, 0, :1]

    @jax.jit
    def clip0(p):
        return jax.vmap(lambda v, c: clip_polygon(v, c, planes))(p, counts0)

    clipped, counts = jax.tree_util.tree_map(jnp.asarray, clip0(padded0))

    def proj_fn(r, _):
        ndc = matmul(mixf(clipped, r), cam_m["MVP"])
        screen = matmul(ndc / ndc[..., 3:4], cam_m["viewport"])
        return screen[:8, 0, :1]

    run_traced_each(
        [("silhouette", sil_fn), ("extrude", ext_fn), ("argsort", sort_fn),
         ("gather_sel", gath_fn), ("clip6", clip_fn), ("project", proj_fn)],
        (0,))


if __name__ == "__main__":
    main()
