"""Scene: model container + camera/light binding + the render() entry point.

Reference surface (core.py:558-640) with the render loop replaced by one jitted
device program (ops/pipeline.py). Fixed reference quirks (SURVEY.md §2):

- ``shadows=`` is honored (the reference ignores it, core.py:568) and
  ``Model.shadowing`` gates which models cast shadow volumes.
- ``debug_camera`` is truly optional (the reference dereferences it
  unconditionally, triangular.py:39).
- Camera/Light binding state lives on the Scene instance, not on a class-level
  descriptor shared across scenes (core.py:527-529), and default camera/light
  are fresh per Scene (mutable-default quirk, core.py:565-567).

Per-model device packets (vertex/face/texture arrays) are packed once and
cached; the compiled program is cached by the scene's static configuration, so
moving the camera/light or animating vertices re-renders without recompiling.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from tpu_renderer.constants import SUBSYSTEM, SYSTEM
from tpu_renderer.models.camera import Camera, Light
from tpu_renderer.models.model import Model
from tpu_renderer.ops import transforms as T
from tpu_renderer.ops.lightning import Lightning
from tpu_renderer.ops.pipeline import (ModelConfig, SceneConfig, SHADER_GENERAL,
                                       render_frame_jit)

__all__ = ["Scene"]

_PAD = 8  # face-count padding multiple (== pipeline chunk)


def _pad_rows(a: np.ndarray, rows: int) -> np.ndarray:
    if len(a) == rows:
        return a
    pad = np.zeros((rows - len(a), *a.shape[1:]), dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _material_table(model: Model, attr: str, width: int) -> np.ndarray:
    """Per-material-group scalar/vector attribute table, broadcast to width."""
    out = []
    for name in model.material_group:
        mat = model.materials.get(name, model.materials["default"])
        val = np.atleast_1d(np.asarray(getattr(mat, attr), dtype=np.float32))
        out.append(np.broadcast_to(val, (width,)) if width > 1 else val[:1])
    return np.stack(out)


def _texture_stack(model: Model, attr: str):
    """Stack all materials' ``attr`` maps, RGB-packed into one uint32 texel.

    TPU gathers cost per *indexed element*, not per byte: one u32 gather +
    shift/mask unpack is ~5x faster than gathering an f32[...,3] slice. All
    textures originate from 8-bit images (core.py:100-105), so quantizing back
    to u8 under a per-stack (scale, offset) affine — (1, 0) for raw [0,1]
    maps, (2, -1) for ``*2-1``-normalized normal maps — reconstructs the
    original float values exactly.

    Returns (stack (N, TH, TW) uint32, slot (G,), shape (G, 2), tangent (G,),
    scale_offset (2,) float32) or None when no material carries the map.
    """
    groups = model.material_group
    entries = []
    for gi, name in enumerate(groups):
        mat = model.materials.get(name, model.materials["default"])
        tex = mat.__dict__.get(attr)
        if tex is not None:
            tangent = bool((tex.dtype.metadata or {}).get("tangent", False))
            entries.append((gi, np.asarray(tex, np.float32), tangent))
    if not entries:
        return None
    th = max(t.shape[0] for _, t, _ in entries)
    tw = max(t.shape[1] for _, t, _ in entries)
    lo = min(float(t.min()) for _, t, _ in entries)
    scale, offset = (2.0, -1.0) if lo < 0 else (1.0, 0.0)

    stack = np.zeros((len(entries), th, tw), np.uint32)
    slot = np.full(len(groups), -1, np.int32)
    shape = np.ones((len(groups), 2), np.float32)
    tangent_flags = np.zeros(len(groups), bool)
    for si, (gi, tex, tangent) in enumerate(entries):
        q = np.round(np.clip((tex[..., :3] - offset) / scale, 0, 1) * 255)
        q = q.astype(np.uint32)
        packed = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
        stack[si, :tex.shape[0], :tex.shape[1]] = packed
        slot[gi] = si
        shape[gi] = tex.shape[:2]
        tangent_flags[gi] = tangent
    return (stack, slot, shape, tangent_flags,
            np.array([scale, offset], np.float32))


#: Texel-window geometry for the in-kernel texture sampler
#: (ops/raster_pallas.sample_textures_pallas): (rows, cols) per window.
_WIN_R = 32
_WIN_C = 128


def _window_metadata(uv, shapes, slot_list):
    """Per-face (_WIN_R, 128)-texel window grids covering each face's UV bbox.

    ``uv``: (F, 3, 2) per-face vertex uv; ``shapes``: (F, 2) float (TH, TW) of
    the face's texture; ``slot_list``: per sampled kind, (F,) material slot
    (−1 = kind absent on this face).

    The texel coordinates replicate the reference's nearest-sample indexing
    (core.py:138-143): col = clip(u, max=1)·(TW−1), row = (1−clip(v, max=1))·
    (TH−1), truncated; interpolated values on covered pixels are convex
    combinations of the vertex values, so the vertex extremes (±1 texel fp
    margin) bound every pixel's texel. Windows are anchored on the unwrapped
    bbox; negative-uv wrap (quirk 6) resolves at content-build time plus a
    straddle correction in the kernel.

    Returns dict of per-face int32 arrays (wbase, nwr, nwc, rbase, cbase,
    kmask) and per-window arrays (w_face, w_r0, w_c0), or None if no face
    samples anything.
    """
    kmask = np.zeros(len(uv), np.int32)
    for k, slot in enumerate(slot_list):
        kmask |= (np.asarray(slot) >= 0).astype(np.int32) << k
    active = kmask > 0
    if not active.any():
        return None

    th = np.asarray(shapes[:, 0], np.float64)
    tw = np.asarray(shapes[:, 1], np.float64)
    colf = np.minimum(uv[:, :, 0], 1.0) * (tw[:, None] - 1)
    rowf = (1.0 - np.minimum(uv[:, :, 1], 1.0)) * (th[:, None] - 1)
    rbase = (np.floor(rowf.min(1)) - 1).astype(np.int64)
    cbase = (np.floor(colf.min(1)) - 1).astype(np.int64)
    rmax = (np.floor(rowf.max(1)) + 1).astype(np.int64)
    cmax = (np.floor(colf.max(1)) + 1).astype(np.int64)
    nwr = np.where(active, (rmax - rbase) // _WIN_R + 1, 0).astype(np.int32)
    nwc = np.where(active, (cmax - cbase) // _WIN_C + 1, 0).astype(np.int32)

    counts = (nwr * nwc).astype(np.int64)
    wbase = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    total = int(counts.sum())
    w_face = np.repeat(np.arange(len(uv), dtype=np.int32),
                       counts.astype(np.int32))
    # Window (wr, wc) within each face's grid, wr-major.
    local = (np.arange(total, dtype=np.int64)
             - wbase.astype(np.int64)[w_face])
    wr = local // nwc[w_face]
    wc = local - wr * nwc[w_face]
    w_r0 = (rbase[w_face] + _WIN_R * wr).astype(np.int64)
    w_c0 = (cbase[w_face] + _WIN_C * wc).astype(np.int64)
    return {
        "wbase": wbase, "nwr": nwr, "nwc": nwc,
        "rbase": rbase.astype(np.int32), "cbase": cbase.astype(np.int32),
        "kmask": kmask, "w_face": w_face, "w_r0": w_r0, "w_c0": w_c0,
    }


def _build_window_content(stacks_slots, w_face, w_r0, w_c0, shapes):
    """Slice each window's texels out of the (device) texture stacks.

    ``stacks_slots``: per UNION kind, (stack (N, TH, TW) uint32, slot (F,)
    int32), or None for kinds outside this grid's group (their _WIN_R-row plane
    is zeros — never read: the mask plane only carries bits this grid's
    kmask sets). Content rows [Rk, R(k+1)), R = _WIN_R, hold union kind k;
    window origins wrap modulo the face's texture shape, with wrap-straddle
    handled by a (TH+R, TW+128) wrap-pad of each texture slice.
    Returns (W, R·K, 128) int32 on device.
    """
    import jax

    th = jnp.asarray(shapes[w_face, 0], jnp.int32)
    tw = jnp.asarray(shapes[w_face, 1], jnp.int32)
    r0 = jnp.mod(jnp.asarray(w_r0, jnp.int32), th)
    c0 = jnp.mod(jnp.asarray(w_c0, jnp.int32), tw)

    padded = []
    slots = []
    for entry in stacks_slots:
        if entry is None:
            padded.append(None)
            continue
        stack, slot = entry
        p = jnp.pad(jnp.asarray(stack).astype(jnp.int32),
                    ((0, 0), (0, _WIN_R), (0, _WIN_C)), mode="wrap")
        padded.append(p)
        slots.append(jnp.clip(jnp.asarray(slot)[w_face], 0))

    def one(args):
        r, c, *ss = args
        ss = list(ss)
        parts = []
        for p in padded:
            if p is None:
                parts.append(jnp.zeros((_WIN_R, _WIN_C), jnp.int32))
            else:
                parts.append(jax.lax.dynamic_slice(
                    p, (ss.pop(0), r, c), (1, _WIN_R, _WIN_C))[0])
        return jnp.concatenate(parts, axis=0)

    # Sequential scan: vmap would lower the slices to a (5x/element) XLA
    # slice-gather; ~10k sequential dynamic_slices run once per scene.
    out = jax.lax.map(one, (r0, c0, *slots))
    return out.reshape(out.shape[0], _WIN_R * len(padded), _WIN_C)


#: Per-model byte budget for the VMEM-resident shared-cell grid (see
#: raster_pallas: grid mode holds the whole cell table in VMEM next to the
#: fused kernel's ~10 MB of blocks; v5e has 128 MB of VMEM).
_GRID_BUDGET = 20 * 2 ** 20


def _grid_metadata(uv, shapes, slot_list):
    """Grid-ALIGNED shared-cell metadata for the VMEM-resident sampler.

    Same per-face texel-bbox semantics as _window_metadata (reference
    nearest-sample indexing, core.py:138-143), but windows are the cells of
    a fixed (_WIN_R, _WIN_C)-aligned grid tiling the whole texture, SHARED
    by every face that samples it — so the content table is one reshape of
    the texture (no per-face duplication) and the kernel reads cells
    straight out of VMEM with no DMA (raster_pallas._sample_face_slab grid
    mode). One full grid per distinct (slot-combination, shape); per-face
    wbase points at its combo's first cell.

    Returns dict of per-face int32 arrays (wbase, nwr, nwc, rbase, cbase —
    rbase/cbase are the ALIGNED anchors, kmask, ngrid (F, 2) cell-grid
    dims) plus ``combos`` [(per-group-kind slots, th, tw)] and
    ``total_cells``, or None if no face samples anything.
    """
    kmask = np.zeros(len(uv), np.int32)
    for k, slot in enumerate(slot_list):
        kmask |= (np.asarray(slot) >= 0).astype(np.int32) << k
    active = kmask > 0
    if not active.any():
        return None

    th = np.asarray(shapes[:, 0], np.float64)
    tw = np.asarray(shapes[:, 1], np.float64)
    colf = np.minimum(uv[:, :, 0], 1.0) * (tw[:, None] - 1)
    rowf = (1.0 - np.minimum(uv[:, :, 1], 1.0)) * (th[:, None] - 1)
    rbase = (np.floor(rowf.min(1)) - 1).astype(np.int64)
    cbase = (np.floor(colf.min(1)) - 1).astype(np.int64)
    rmax = (np.floor(rowf.max(1)) + 1).astype(np.int64)
    cmax = (np.floor(colf.max(1)) + 1).astype(np.int64)
    gr0 = rbase // _WIN_R                        # floor-aligned grid anchor
    gc0 = cbase // _WIN_C
    nwr = np.where(active, rmax // _WIN_R - gr0 + 1, 0).astype(np.int32)
    nwc = np.where(active, cmax // _WIN_C - gc0 + 1, 0).astype(np.int32)
    gr0 = np.where(active, gr0, 0).astype(np.int64)
    gc0 = np.where(active, gc0, 0).astype(np.int64)

    # One grid per distinct (slot-combination, shape) over active faces.
    slotmat = np.stack([np.asarray(s) for s in slot_list], axis=1)
    key = np.concatenate(
        [slotmat.astype(np.int64),
         np.stack([th, tw], axis=1).astype(np.int64)], axis=1)
    uniq, inv = np.unique(key[active], axis=0, return_inverse=True)
    combo = np.zeros(len(uv), np.int64)
    combo[active] = inv
    ngr_c = -(-uniq[:, -2] // _WIN_R)
    ngc_c = -(-uniq[:, -1] // _WIN_C)
    cells = ngr_c * ngc_c
    base_c = np.concatenate([[0], np.cumsum(cells)[:-1]])
    wbase = np.where(active, base_c[combo], 0).astype(np.int32)
    ngrid = np.zeros((len(uv), 2), np.int32)
    ngrid[active] = np.stack(
        [ngr_c[combo[active]], ngc_c[combo[active]]], axis=1)
    return {
        "wbase": wbase, "nwr": nwr, "nwc": nwc,
        "rbase": (gr0 * _WIN_R).astype(np.int32),
        "cbase": (gc0 * _WIN_C).astype(np.int32),
        "kmask": kmask, "ngrid": ngrid,
        "combos": [(uniq[i, :-2], int(uniq[i, -2]), int(uniq[i, -1]))
                   for i in range(len(uniq))],
        "total_cells": int(cells.sum()),
    }


def _build_grid_content(stacks_slots, group_kinds, union, combos):
    """Cell tables for every combo of one group, built ON HOST.

    ``stacks_slots``: per UNION kind, (stack (N, TH, TW) uint32, slot) or
    None outside this group (zero planes, never read — kmask gating).
    Each combo's grid is the whole padded texture reshaped into
    (_WIN_R, _WIN_C) cells — a transpose, not a per-window gather.
    Returns (total_cells, _WIN_R·K, _WIN_C) int32.

    Host numpy throughout, ONE device transfer at the end: eager jnp ops
    here each compile + dispatch a tiny XLA program through the (tunneled,
    time-shared) device — measured at seconds per op under contention,
    which once made Scene packing take minutes at high instance counts.
    """
    parts = []
    for slots, th_c, tw_c in combos:
        ngr = -(-th_c // _WIN_R)
        ngc = -(-tw_c // _WIN_C)
        kparts = []
        for k, entry in zip(union, stacks_slots):
            s = (int(slots[group_kinds.index(k)])
                 if k in group_kinds else -1)
            if entry is None or s < 0:
                kparts.append(
                    np.zeros((ngr * ngc, _WIN_R, _WIN_C), np.int32))
                continue
            stack, _ = entry
            tex = np.asarray(stack).astype(np.int32)[s, :th_c, :tw_c]
            tex = np.pad(tex, ((0, ngr * _WIN_R - th_c),
                               (0, ngc * _WIN_C - tw_c)))
            kparts.append(
                tex.reshape(ngr, _WIN_R, ngc, _WIN_C)
                .transpose(0, 2, 1, 3).reshape(ngr * ngc, _WIN_R, _WIN_C))
        parts.append(np.concatenate(kparts, axis=1))
    return jnp.asarray(np.concatenate(parts, axis=0))


class Scene:
    def __init__(self, camera: Optional[Camera] = None,
                 light: Optional[Light] = None, shadows: bool = False,
                 debug_camera: Optional[Camera] = None,
                 resolution=(1500, 1500), system=SYSTEM.RH,
                 subsystem=SUBSYSTEM.DIRECTX, skymap=None,
                 shader: str = SHADER_GENERAL, backend: Optional[str] = None,
                 supersample: int = 1):
        self.system = system
        self.subsystem = subsystem
        self.resolution = tuple(int(r) for r in resolution)
        self.models: List[Model] = []
        self.shadows = shadows
        self.skybox = skymap
        self.shader = shader
        #: 'pallas' (tile-binned TPU kernels), 'xla' (portable streaming
        #: path), or None = auto: pallas on TPU, xla elsewhere.
        self.backend = backend
        #: Windowed in-kernel texture sampling: True/False, or None = auto
        #: (on past 512^2, where it beats the XLA per-pixel gather).
        self.tex_kernel = None
        #: Draw the debug camera's frustum wireframe like the reference
        #: (core.py:638) whenever a debug camera is present.
        self.debug_overlay = True
        #: Supersampling anti-aliasing factor (beyond the reference): render
        #: at N x the resolution, box-filter down before quantization.
        self.supersample = int(supersample)
        self.camera = camera if camera is not None else Camera(
            position=(0, 0, 1), center=(0, 0, 0))
        self.light = light if light is not None else Light(position=(1, 1, 1))
        self.debug_camera = debug_camera
        self._packets: Dict[int, dict] = {}
        self.last_zbuf = None
        self.last_tid = None
        self.last_stencil = None

    # ------------------------------------------------------------- binding

    def __setattr__(self, key, value):
        # Bind camera/light-like objects to this scene (reference Bound
        # descriptor, core.py:527-555) and materialize their gizmos.
        if key in ("camera", "light", "debug_camera") and value is not None:
            value.scene = self
            super().__setattr__(key, value)
            if getattr(value, "show", False):
                self._add_gizmo(value)
            return
        super().__setattr__(key, value)

    def _add_gizmo(self, obj):
        """Show a sphere at a light / a frustum mesh at a camera
        (reference core.py:532-552; its gizmo OBJs are absent from the repo,
        so procedural meshes stand in)."""
        from tpu_renderer.models import gizmos as gz

        sub = gz.make_sphere() if isinstance(obj, Light) else gz.make_camera_gizmo()
        sub.clip = False
        sub = sub @ T.scale(0.1)
        lookat = np.asarray(obj.lookat, np.float64)
        try:
            inv = np.linalg.inv(lookat)
        except np.linalg.LinAlgError:
            inv = np.linalg.pinv(lookat)
        sub = sub @ inv
        try:
            inv3 = np.linalg.inv(lookat[:3, :3])
        except np.linalg.LinAlgError:
            inv3 = np.linalg.pinv(lookat[:3, :3])
        sub.normals = (-sub.normals @ inv3).astype(np.float32) \
            if sub.normals is not None else None
        self.add_model(sub)

    def add_model(self, model: Model):
        self.models.append(model)

    # ------------------------------------------------------------- packing

    def _pack_model(self, model: Model) -> dict:
        key = id(model)
        cached = self._packets.get(key)
        if (cached is not None and cached["_verts_src"] is model.vertices
                and cached["_version"] == model._version):
            return cached

        F = model.num_faces
        Fp = max(_PAD, -(-F // _PAD) * _PAD)
        faces = model.face_array

        vid = _pad_rows(faces[:, :, 0].astype(np.int32), Fp)
        pad_valid = np.zeros(Fp, bool)
        pad_valid[:F] = True

        if model.uv is not None:
            uv = model.uv[faces[:, :, 1]][..., :2].astype(np.float32)
        else:
            uv = np.zeros((F, 3, 2), np.float32)
        uv = _pad_rows(uv, Fp)

        has_vn = model.normals is not None
        vn = (_pad_rows(model.normals[faces[:, :, 2]].astype(np.float32), Fp)
              if has_vn else None)

        mtl = faces[:, 0, 3].astype(np.int32)
        kd_t = _material_table(model, "Kd", 3)
        ks_t = _material_table(model, "Ks", 3)
        ns_t = _material_table(model, "Ns", 1)[:, 0]
        pm_t = _material_table(model, "Pm", 1)[:, 0]
        pr_t = _material_table(model, "Pr", 1)[:, 0]
        ka_t = _material_table(model, "Ka", 3)

        packet = {
            "_verts_src": model.vertices,
            "_version": model._version,
            "verts": jnp.asarray(model.vertices, jnp.float32),
            "vid": jnp.asarray(vid),
            "pad_valid": jnp.asarray(pad_valid),
            "uv": jnp.asarray(uv),
            "kd": jnp.asarray(_pad_rows(kd_t[mtl], Fp)),
            "ks": jnp.asarray(_pad_rows(ks_t[mtl], Fp)),
            "ns": jnp.asarray(_pad_rows(ns_t[mtl], Fp)),
            "pm": jnp.asarray(_pad_rows(pm_t[mtl], Fp)),
            "pr": jnp.asarray(_pad_rows(pr_t[mtl], Fp)),
            "ka": jnp.asarray(_pad_rows(ka_t[mtl], Fp)),
        }
        if has_vn:
            packet["vn"] = jnp.asarray(vn)

        # Edge incidence arrays for batched silhouette extraction (ops/shadow).
        et = model.edge_table
        inc_edge = np.zeros(3 * Fp, np.int32)
        inc_dir = np.zeros((3 * Fp, 2), np.int32)
        inc_valid = np.zeros(3 * Fp, bool)
        inc_edge[:3 * F] = et.incidence_edge
        inc_dir[:3 * F] = et.incidence_dir
        inc_valid[:3 * F] = True
        packet["inc_edge"] = jnp.asarray(inc_edge)
        packet["inc_dir"] = jnp.asarray(inc_dir)
        packet["inc_valid"] = jnp.asarray(inc_valid)

        # Texture stacks + sampler window/grid tables depend only on
        # (materials, uv, face indices) — all shared BY REFERENCE across
        # instanced copies (``model @ transform`` shallow-copies, model.py).
        # Cache on those identities so N instances of one mesh share ONE
        # texture atlas and ONE window-content table on device: without
        # this an instanced high-poly scene replicates the ~17 MB grid per
        # instance and overflows the kernels' VMEM input budget.
        wkey = (id(model.materials), id(model.uv), id(model._faces),
                F, Fp, model._version)
        cache = getattr(self, "_win_pack_cache", None)
        if cache is None:
            cache = self._win_pack_cache = {}
        hit = cache.get(wkey)
        if hit is not None:
            tex_fields, cfg_args, _pins = hit
            packet.update(tex_fields)
            packet["_config"] = ModelConfig(
                num_faces=Fp, clip=model.clip, depth_test=model.depth_test,
                shadowing=model.shadowing, has_vn=has_vn,
                has_uv=model.uv is not None, num_edges=et.num_edges,
                **cfg_args)
            self._packets[key] = packet
            return packet

        _packet_base_keys = set(packet)
        flags = {}
        st_by_kind = {}
        for kind, attr in (("kd", "map_Kd"), ("ks", "map_Ks"), ("norm", "norm")):
            st = _texture_stack(model, attr)
            st_by_kind[kind] = st
            if st is None:
                packet[f"{kind}_slot"] = jnp.full(Fp, -1, jnp.int32)
                packet[f"{kind}_shape"] = jnp.ones((Fp, 2), jnp.float32)
                flags[kind] = False
            else:
                stack, slot, shape, tangent, scale_off = st
                packet[f"{kind}_stack"] = jnp.asarray(stack)
                packet[f"{kind}_slot"] = jnp.asarray(
                    _pad_rows(slot[mtl], Fp) if F else slot[mtl])
                packet[f"{kind}_shape"] = jnp.asarray(_pad_rows(shape[mtl], Fp))
                packet[f"{kind}_scale_off"] = jnp.asarray(scale_off)
                flags[kind] = True
                if kind == "norm":
                    packet["norm_tangent"] = jnp.asarray(
                        _pad_rows(tangent[mtl], Fp))
        if "norm_tangent" not in packet:
            packet["norm_tangent"] = jnp.zeros(Fp, bool)

        # ---- texel windows for the in-kernel sampler: group kinds sharing
        # one per-face shape table (one texel-coordinate set per grid). Up
        # to TWO grids per model: the largest group drives the speculative
        # window path; a second group (e.g. a normal map sized differently
        # from the diffuse map) samples through a second per-face grid with
        # synchronous window DMA in the kernel. Kind/plane indices are
        # positions in the UNION tuple (group 1 kinds first).
        win_kinds: tuple = ()
        win2 = False
        win_grid = False
        num_windows = 0
        if model.uv is not None and F > 0:
            present = [k for k in ("kd", "norm", "ks")
                       if st_by_kind.get(k) is not None]
            groups: list = []
            for k in present:
                shp = st_by_kind[k][2][mtl]
                placed = False
                for g in groups:
                    if np.array_equal(st_by_kind[g[0]][2][mtl], shp):
                        g.append(k)
                        placed = True
                        break
                if not placed:
                    groups.append([k])

            def _grp_ok(g):
                # The per-face DMA window layout needs at least one full
                # window inside the map; the shared-cell grid handles any
                # shape (cells zero-pad, wrapped texel coords land in
                # exactly one cell at rel in [0, dim)).
                shp = st_by_kind[g[0]][2][mtl]
                return (shp[:, 0].min() >= _WIN_R
                        and shp[:, 1].min() >= _WIN_C)

            groups = sorted(groups, key=len, reverse=True)[:2]
            # Metadata first (a group none of the faces sample drops out),
            # THEN the union fixes plane/bit positions for both grids.
            # Prefer the shared-cell grid layout (VMEM-resident, no DMA in
            # the kernel) whenever every combo's texture fits the wordg
            # bit budget (<= 4096 texels/axis, raster_pallas.GRID_TH_MAX)
            # and the cell tables fit the VMEM byte budget; else fall back
            # to the per-face speculative-DMA window layout.
            use_grid = os.environ.get("TPU_RENDERER_WIN_GRID", "1") != "0"
            metas = []
            if use_grid:
                for group in groups:
                    shapes = st_by_kind[group[0]][2][mtl]  # (F, 2) float
                    meta = _grid_metadata(
                        uv[:F], shapes,
                        [st_by_kind[k][1][mtl] for k in group])
                    if meta is not None:
                        metas.append((group, shapes, meta))
                union_n = max(sum(len(g) for g, _, _ in metas), 1)
                total_cells = sum(m["total_cells"] for _, _, m in metas)
                use_grid = bool(metas) and all(
                    th_c <= 4096 and tw_c <= 4096
                    for _, _, m in metas
                    for _, th_c, tw_c in m["combos"]) and (
                    total_cells * _WIN_R * union_n * _WIN_C * 4
                    <= _GRID_BUDGET)
            if not use_grid:
                metas = []
                for group in groups:
                    if not _grp_ok(group):
                        continue
                    shapes = st_by_kind[group[0]][2][mtl]
                    meta = _window_metadata(
                        uv[:F], shapes,
                        [st_by_kind[k][1][mtl] for k in group])
                    if meta is not None:
                        metas.append((group, shapes, meta))
            union = [k for g, _, _ in metas for k in g]
            parts = []
            for gi, (group, shapes, meta) in enumerate(metas):
                pre = "win_" if gi == 0 else "win2_"
                bit0 = len(metas[0][0]) if gi else 0
                for name in ("nwr", "nwc", "rbase", "cbase"):
                    packet[f"{pre}{name}"] = jnp.asarray(
                        _pad_rows(meta[name], Fp))
                packet[f"{pre}kmask"] = jnp.asarray(
                    _pad_rows(meta["kmask"] << bit0, Fp))
                packet[f"{pre}wbase"] = jnp.asarray(
                    _pad_rows(meta["wbase"] + num_windows, Fp))
                packet[f"{pre}thw"] = jnp.asarray(
                    _pad_rows(shapes.astype(np.int32), Fp))
                stacks_slots = [(st_by_kind[k][0], st_by_kind[k][1][mtl])
                                if k in group else None for k in union]
                if use_grid:
                    packet[f"{pre}ngrid"] = jnp.asarray(
                        _pad_rows(meta["ngrid"], Fp))
                    parts.append(_build_grid_content(
                        stacks_slots, group, union, meta["combos"]))
                    num_windows += meta["total_cells"]
                else:
                    parts.append(_build_window_content(
                        stacks_slots, meta["w_face"], meta["w_r0"],
                        meta["w_c0"], shapes))
                    num_windows += len(meta["w_face"])
                if gi == 0:
                    win_kinds = tuple(union)
                else:
                    win2 = True
            win_grid = use_grid and bool(win_kinds)
            if parts:
                packet["windows"] = (parts[0] if len(parts) == 1
                                     else jnp.concatenate(parts, axis=0))
        if not win_kinds:
            for name in ("wbase", "nwr", "nwc", "rbase", "cbase", "kmask"):
                packet[f"win_{name}"] = jnp.zeros(Fp, jnp.int32)
            packet["win_thw"] = jnp.ones((Fp, 2), jnp.int32)
        if not win2:
            for name in ("wbase", "nwr", "nwc", "rbase", "cbase", "kmask"):
                packet[f"win2_{name}"] = jnp.zeros(Fp, jnp.int32)
            packet["win2_thw"] = jnp.ones((Fp, 2), jnp.int32)
        for pre in ("win_", "win2_"):
            if f"{pre}ngrid" not in packet:
                packet[f"{pre}ngrid"] = jnp.ones((Fp, 2), jnp.int32)

        cfg_args = dict(
            has_map_kd=flags["kd"], has_map_ks=flags["ks"],
            has_norm=flags["norm"], win_kinds=win_kinds,
            num_windows=num_windows, win2=win2, win_grid=win_grid,
        )
        packet["_config"] = ModelConfig(
            num_faces=Fp, clip=model.clip, depth_test=model.depth_test,
            shadowing=model.shadowing, has_vn=has_vn,
            has_uv=model.uv is not None, num_edges=et.num_edges,
            **cfg_args)
        # Cache the texture/window fields for instanced siblings. The pinned
        # source objects keep the id()-based key from aliasing a freed
        # object's address (same hazard note as _windows_all's cache).
        tex_fields = {k: v for k, v in packet.items()
                      if k not in _packet_base_keys and k != "_config"}
        cache[wkey] = (tex_fields, cfg_args,
                       (model.materials, model.uv, model._faces))
        self._packets[key] = packet
        return packet

    def _windows_all(self, packets):
        """Scene-wide texel-window table for the in-kernel sampler: each
        DISTINCT model window block row-padded to the scene's kind count and
        concatenated (window ids are global). Instanced models share their
        block by identity (see _pack_model's texture cache) — the returned
        offsets point every instance at the one shared copy. Assembled once
        per packet set — the content is static, and re-padding ~10k windows
        inside the frame program costs ~0.5 ms.

        Returns ``(table | None, offsets)`` with ``offsets[i]`` the global
        window base of packet i (0 for untextured models). Mixed window
        layouts (some models shared-cell grid, some per-face DMA): only the
        grid models' blocks enter the table — the DMA-layout models fall
        back to the XLA gather path (pipeline.sampler_excluded_models, which
        also neutralizes their per-face window metadata)."""
        from tpu_renderer.ops.pipeline import sampler_excluded_models

        excluded = sampler_excluded_models(
            [p["_config"] for p in packets])
        kept = [p for i, p in enumerate(packets) if i not in excluded]
        n_kinds = max((len(p["_config"].win_kinds) for p in kept),
                      default=0)
        if n_kinds == 0:
            return None, [0] * len(packets)
        # Cache keyed on the window arrays THEMSELVES (identity compare):
        # holding the references keeps them alive, so a rebuilt packet can
        # never alias a freed array's id() and serve stale windows.
        key_arrays = [p.get("windows") for p in packets]
        cached = getattr(self, "_windows_all_cache", None)
        if (cached is not None and cached[1] == n_kinds
                and len(cached[0]) == len(key_arrays)
                and all(a is b for a, b in zip(cached[0], key_arrays))):
            return cached[2], cached[3]
        parts = []
        offsets = []
        base_by_id = {}
        off = 0
        for i, p in enumerate(packets):
            if not p["_config"].win_kinds or i in excluded:
                offsets.append(0)
                continue
            w = p["windows"]
            prev = base_by_id.get(id(w))
            if prev is not None:
                offsets.append(prev)
                continue
            base_by_id[id(w)] = off
            offsets.append(off)
            off += p["_config"].num_windows
            if w.shape[1] < _WIN_R * n_kinds:
                w = jnp.pad(
                    w, ((0, 0), (0, _WIN_R * n_kinds - w.shape[1]), (0, 0)))
            parts.append(w)
        if parts:
            # _SPEC rows of tail padding: the sampler kernel prefetches each
            # face's speculative window set as one contiguous block DMA.
            from tpu_renderer.ops.raster_pallas import _SPEC
            parts.append(jnp.zeros((_SPEC,) + parts[0].shape[1:], jnp.int32))
            out = jnp.concatenate(parts, axis=0)
        else:
            out = None
        self._windows_all_cache = (key_arrays, n_kinds, out, offsets)
        return out, offsets

    @staticmethod
    def _cam_dyn(cam) -> dict:
        return {
            "position": jnp.asarray(cam.position, jnp.float32),
            "center": jnp.asarray(cam.center, jnp.float32),
            "up": jnp.asarray(cam.up, jnp.float32),
            "fovy": jnp.float32(cam.fovy),
            "near": jnp.float32(cam.near),
            "far": jnp.float32(cam.far),
        }

    def _light_dyn(self) -> dict:
        lt = self.light
        return {
            "position": jnp.asarray(lt.position, jnp.float32),
            "center": jnp.asarray(lt.center, jnp.float32),
            "color": jnp.asarray(lt.color, jnp.float32),
            "ambient": jnp.asarray(lt.ambient, jnp.float32),
            "specular_strength": jnp.float32(lt.specular_strength),
            "constant": jnp.float32(lt.constant),
            "linear": jnp.float32(lt.linear),
            "quadratic": jnp.float32(lt.quadratic),
        }

    def _background(self):
        from tpu_renderer.ops.cubemap import CubeMap

        if isinstance(self.skybox, CubeMap):
            return "cubemap", None
        if self.skybox is not None:
            return "color", jnp.asarray(np.asarray(self.skybox, np.float32))
        # Reference default purple-ish background (core.py:600).
        return "color", jnp.asarray([64 / 255, 0.5, 198 / 255], jnp.float32)

    # -------------------------------------------------------------- render

    def _prepare(self, resolution=None):
        """Pack the scene into (static SceneConfig, dynamic input pytree)."""
        import jax

        packets = [self._pack_model(m) for m in self.models]
        background, bg_color = self._background()

        on_tpu = jax.default_backend() == "tpu"
        backend = self.backend or ("pallas" if on_tpu else "xla")

        # Global window-table offsets (instanced models share one block, see
        # _windows_all) are static facts — baked into each ModelConfig so
        # _build_face_batch points every instance's faces at the shared copy.
        wa, woffs = self._windows_all(packets)
        import dataclasses as _dc
        mconfigs = tuple(
            _dc.replace(p["_config"], win_offset=o)
            for p, o in zip(packets, woffs))

        cfg = SceneConfig(
            backend=backend,
            tex_kernel=self.tex_kernel,
            pallas_interpret=backend == "pallas" and not on_tpu,
            resolution=resolution or self.resolution, system=self.system,
            subsystem=self.subsystem, shadows=self.shadows,
            shader=self.shader, background=background,
            cam_projection_type=self.camera.projection_type,
            backface_culling=self.camera.backface_culling,
            has_debug_camera=self.debug_camera is not None,
            dbg_projection_type=(self.debug_camera.projection_type
                                 if self.debug_camera else 0),
            light_type=self.light.light_type,
            models=mconfigs,
        )
        dyn = {
            "models": [{k: v for k, v in p.items() if not k.startswith("_")}
                       for p in packets],
            "camera": self._cam_dyn(self.camera),
            "light": self._light_dyn(),
        }
        if wa is not None:
            dyn["windows_all"] = wa
        if self.debug_camera is not None:
            dyn["debug_camera"] = self._cam_dyn(self.debug_camera)
        if background == "color":
            dyn["background_color"] = bg_color
        else:
            dyn["skybox"] = self.skybox.as_device_arrays()
        return cfg, dyn

    def render(self) -> np.ndarray:
        """Render one frame; returns (H, W, 3) uint8, same as core.py:587-640."""
        ss = self.supersample
        if ss > 1 and (self.shader in ("wireframe", "points")
                       or self.debug_camera is not None):
            # Supersampling composes with neither the debug shaders (their
            # pixel splats are resolution-exact, not shade-averaged) nor the
            # host-side frustum overlay (drawn at native resolution on the
            # pre-flip frame). Warn instead of silently dropping the kwarg.
            import warnings
            reason = ("wireframe/points shader" if self.shader in
                      ("wireframe", "points") else "debug-camera overlay")
            warnings.warn(
                f"supersample={ss} is ignored with a {reason}; rendering at "
                "native resolution", RuntimeWarning, stacklevel=2)
        if ss > 1 and self.shader not in ("wireframe", "points") \
                and self.debug_camera is None:
            h, w = self.resolution
            cfg, dyn = self._prepare(resolution=(h * ss, w * ss))
            from tpu_renderer.ops.pipeline import render_ssaa_jit

            out, zbuf, tid, stencil = render_ssaa_jit(cfg, dyn, ss)
            self.last_zbuf, self.last_tid, self.last_stencil = \
                zbuf, tid, stencil
            return np.asarray(out)

        cfg, dyn = self._prepare()
        if self.shader in ("wireframe", "points"):
            return self._render_debug_shader(cfg, dyn)
        if self.debug_camera is not None and self.debug_overlay:
            # Debug overlays draw on the pre-flip float frame (core.py:638),
            # then flip + gamma 0.8 + quantize on the host.
            from tpu_renderer.models.camera import camera_matrices
            from tpu_renderer.ops.overlay import draw_view_frustum
            from tpu_renderer.ops.pipeline import render_core_jit

            frame_f32, zbuf, tid, stencil = render_core_jit(cfg, dyn)
            frame = np.asarray(frame_f32).astype(np.float64)
            zb = np.asarray(zbuf).astype(np.float64)
            # Overlay matrices in f64 (x64 scope; ops.transforms._flt): the
            # frustum-cube corners sit exactly ON the clip planes whenever
            # debug camera == main camera, so the overlay's clip decisions
            # must follow the reference's f64 numpy arithmetic.
            import jax
            with jax.enable_x64(True):
                cam_m = {k: np.asarray(v) for k, v in
                         self.camera._matrices().items()}
                dbg_m = {k: np.asarray(v) for k, v in
                         self.debug_camera._matrices().items()}
            draw_view_frustum(frame, cam_m, dbg_m, self.camera.position,
                              self.camera.near, self.camera.far,
                              self.resolution, zb, self.system)
            self.last_zbuf, self.last_tid, self.last_stencil = zb, tid, stencil
            return (np.clip(frame[::-1] ** 0.8, 0, 1) * 255).astype(np.uint8)

        out, zbuf, tid, stencil = render_frame_jit(cfg, dyn)
        self.last_zbuf, self.last_tid, self.last_stencil = zbuf, tid, stencil
        return np.asarray(out)

    # ------------------------------------------------------------- stats

    def stats(self):
        """Per-model render statistics from the last render() — the batched
        equivalent of the reference's per-face Errors printout
        (core.py:634-636). Returns a list of dicts of ints; each dict also
        carries ``by_error``, the same discard counters keyed by the
        reference's :class:`tpu_renderer.Errors` flags (triangular.py:15-20).

        NOTE: this is a debug helper that runs a SECOND device pass — it
        re-packs the scene and recomputes the whole vertex stage
        (pipeline.face_statistics) against the cached visibility buffer.
        Don't call it inside a hot render loop.
        """
        if self.last_tid is None:
            raise RuntimeError("render() must run before stats()")
        from tpu_renderer.ops.errors import Errors
        from tpu_renderer.ops.pipeline import face_statistics

        cfg, dyn = self._prepare()
        raw = face_statistics(cfg, dyn, jnp.asarray(self.last_tid))
        out = []
        for s in raw:
            d = {k: int(v) for k, v in s.items()}
            d["by_error"] = {
                Errors.BACK_FACE_CULLING: d["backface_culled"],
                Errors.EMPTY_B: d["degenerate"],
                Errors.WRONG_MIN_MAX: d["offscreen"],
                # Fragment-level discards collapse in the batched pipeline
                # (pipeline.face_statistics).
                Errors.CLIPPED | Errors.EMPTY_Z: d["occluded_or_clipped"],
            }
            out.append(d)
        return out

    def _render_debug_shader(self, cfg, dyn) -> np.ndarray:
        """Wireframe / points shaders (reference triangular.py:269-283), on
        device: the Pallas DDA line kernel / scatter-max point splat
        (pipeline.render_debug_frame) replace the per-face host loops —
        O(faces) Python iteration mattered at 40k-face meshes."""
        from tpu_renderer.ops.pipeline import render_debug_frame

        out, zbuf, tid, stencil = render_debug_frame(cfg, dyn, self.shader)
        self.last_zbuf, self.last_tid, self.last_stencil = zbuf, tid, stencil
        return np.asarray(out)

    def _render_debug_shader_host(self, cfg, dyn) -> np.ndarray:
        """Host-loop reference implementation of the wireframe / points
        shaders (the round-2 path): kept as the comparison oracle for
        tests/test_overlay.py::test_device_debug_shaders_match_host."""
        import dataclasses

        from tpu_renderer.ops.overlay import draw_points, draw_wireframe
        from tpu_renderer.ops.pipeline import SHADER_GOURAUD, render_core_jit

        cfg2 = dataclasses.replace(cfg, shader=SHADER_GOURAUD)
        _, zbuf, tid, stencil = render_core_jit(cfg2, dyn)
        zb = np.asarray(zbuf).astype(np.float64)
        self.last_zbuf, self.last_tid, self.last_stencil = zb, tid, stencil

        h, w = self.resolution
        if cfg.background == "color":
            frame = np.broadcast_to(
                np.asarray(dyn["background_color"], np.float64),
                (h, w, 3)).copy()
        else:
            from tpu_renderer.ops.cubemap import fill_frame_from_skybox
            frame = np.asarray(fill_frame_from_skybox(
                dyn["skybox"], self.camera._matrices(),
                self.resolution)).astype(np.float64)

        mvp = np.asarray(self.camera.MVP, np.float64)
        vp = np.asarray(self.camera.viewport, np.float64)
        near, far = self.camera.near, self.camera.far
        tris, normals = [], []
        for m in self.models:
            v = m.vertices.astype(np.float64) @ mvp
            v = v / v[:, [3]]
            v = v @ vp
            # The reference linearizes vertex z before its (alternate)
            # wireframe/points shaders run (triangular.py:96, then :269/:277)
            # — the z test below compares against the linearized z-buffer.
            v[:, 2] = (2 * near * far) / (far + near - v[:, 2] * (far - near))
            fv = m.face_array[:, :, 0]
            tris.append(v[fv][:, :, :3])
            world = m.vertices[:, :3].astype(np.float64)
            n = np.cross(world[fv[:, 1]] - world[fv[:, 0]],
                         world[fv[:, 2]] - world[fv[:, 0]])
            norm = np.linalg.norm(n, axis=1, keepdims=True)
            normals.append(n / np.where(norm == 0, 1, norm))
        tris = np.concatenate(tris)
        normals = np.concatenate(normals)

        if self.shader == "wireframe":
            draw_wireframe(frame, zb, tris)
        else:
            draw_points(frame, tris, self.camera.position, normals)
        return (np.clip(frame[::-1] ** 0.8, 0, 1) * 255).astype(np.uint8)
