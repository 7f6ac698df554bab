"""The whole-frame device program: one jitted computation per frame.

Replaces the reference's host-side render orchestration (Scene.render,
core.py:587-640 — three Python loops over faces plus buffer mutation) with a
single traced pipeline:

    vertex stage (per model, batched matmuls)      ops/vertex.py
    -> global face batch (all models concatenated)
    -> visibility buffer (z + winning face id)     ops/raster_xla.py / pallas
    -> shadow stencil (signed crossing counts)     ops/shadow.py
    -> deferred shading (pixel-parallel)           ops/shading.py
    -> background + vertical flip + gamma 0.8 + uint8 quantize (core.py:640)

Static configuration (resolution, handedness, subsystem, shader, per-model
flags, texture presence) lives in a hashable ``SceneConfig``; everything that
can change per frame (camera/light parameters, vertex positions, textures) is a
traced argument, so camera orbits and animated models never recompile.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_renderer.models.camera import camera_matrices
from tpu_renderer.ops import shading as sh
from tpu_renderer.ops.lightning import Lightning
from tpu_renderer.ops.transforms import normalize
from tpu_renderer.ops.vertex import gather_faces, transform_vertices

__all__ = ["SceneConfig", "ModelConfig", "render_frame", "render_core",
           "face_statistics", "SHADER_GENERAL", "SHADER_FLAT",
           "SHADER_GOURAUD", "SHADER_PBR", "SHADER_WIREFRAME",
           "SHADER_POINTS"]

SHADER_GENERAL = "general"
SHADER_FLAT = "flat"
SHADER_GOURAUD = "gouraud"
SHADER_PBR = "pbr"
SHADER_WIREFRAME = "wireframe"     # host-side debug shader (Scene.render)
SHADER_POINTS = "points"           # host-side debug shader (Scene.render)


@dataclass(frozen=True)
class ModelConfig:
    """Static per-model facts baked into the compiled program."""
    num_faces: int                 # padded face count
    clip: bool                     # per-pixel clip test (reference Model.clip)
    depth_test: bool               # z-buffer writes (reference Model.depth_test)
    shadowing: bool                # casts shadow volumes
    has_vn: bool                   # vertex normals present
    has_uv: bool
    has_map_kd: bool
    has_map_ks: bool
    has_norm: bool
    num_edges: int = 0             # padded silhouette-edge count
    #: Texture kinds ('kd' | 'norm' | 'ks') sampled by the in-kernel
    #: windowed sampler (raster_pallas.sample_textures_pallas); kind k reads
    #: sampled plane k. Union of both shape groups, group 1 first.
    #: Empty = XLA gather path only.
    win_kinds: Tuple[str, ...] = ()
    num_windows: int = 0           # rows of this model's window-content table
    #: A second window grid exists (kinds whose texture shape differs from
    #: group 1's, e.g. a normal map sized unlike the diffuse map); the
    #: kernels compile the group-2 sampling pass + per-kind write gating.
    win2: bool = False
    #: Window table uses the shared-cell grid layout (grid-aligned cells of
    #: the whole texture, VMEM-resident in the kernels — no speculative
    #: DMA). All textured models in a scene must agree (scene falls back to
    #: the XLA gather path on a mix). num_windows counts cells in this mode.
    win_grid: bool = False
    #: Global base of this model's window block in the scene-wide table.
    #: Instanced copies of one mesh share a block (Scene._windows_all), so
    #: this is NOT simply the running sum of num_windows. -1 = unset
    #: (direct render_core callers without a Scene): accumulate num_windows
    #: in model order, matching the inline windows assembly.
    win_offset: int = -1


@dataclass(frozen=True)
class SceneConfig:
    """Static scene facts: the jit specialization key."""
    resolution: Tuple[int, int]    # (height, width)
    system: int                    # SYSTEM.LH (-1) / SYSTEM.RH (+1)
    subsystem: int
    shadows: bool
    shader: str
    background: str                # 'color' | 'cubemap'
    cam_projection_type: int
    backface_culling: bool
    has_debug_camera: bool
    dbg_projection_type: int
    light_type: Lightning
    models: Tuple[ModelConfig, ...]
    chunk: int = 8
    backend: str = "xla"           # 'xla' | 'pallas'
    pallas_interpret: bool = False  # Pallas interpreter mode (CPU testing)
    #: Windowed in-kernel texture sampling (Pallas + general shader only).
    #: None = auto (on for frames past 512²,  where it beats the XLA gather).
    tex_kernel: "bool | None" = None


def _cam_matrices(cfg: SceneConfig, cam, projection_type):
    return camera_matrices(
        cam["position"], cam["center"], cam["up"], cam["fovy"], cam["near"],
        cam["far"], projection_type=projection_type, system=cfg.system,
        subsystem=cfg.subsystem, resolution=cfg.resolution)


def sampler_excluded_models(models):
    """Indices of textured models the in-kernel windowed sampler skips.

    The sampler runs ONE window-table layout per scene: the shared-cell
    grid (default) or the per-face DMA windows. When a scene mixes layouts
    (e.g. one model's texture exceeds the grid budget — scene.py
    _GRID_BUDGET — while the others fit), the grid models KEEP the sampler
    and only the DMA-layout models fall back to the per-pixel XLA gather:
    their faces' window metadata is neutralized in _build_face_batch, their
    blocks are dropped from the scene window table (Scene._windows_all),
    and _shade_gbuffer shades them through the gather branch. Uniform
    scenes return the empty set (everything sampled)."""
    texm = [(i, mc) for i, mc in enumerate(models) if mc.win_kinds]
    grids = [mc.win_grid for _, mc in texm]
    if not texm or all(grids) or not any(grids):
        return frozenset()
    return frozenset(i for i, mc in texm if not mc.win_grid)


def _build_face_batch(cfg: SceneConfig, dyn, cam_m, dbg_mvp, tris_idx=0):
    """Vertex stage + per-face gathers for every model, concatenated.

    ``tris_idx`` supports triangle sharding over a mesh axis: face arrays
    arrive pre-sharded, and global face ids are shard-major
    (tris_idx * G_local + local index) so they index the all-gathered
    attribute arrays directly. Depth ties between equal-z faces on different
    shards then resolve shard-major instead of strictly model-major — a
    sub-pixel-rare deviation.
    """
    height, width = cfg.resolution
    raster_parts = []
    attr_parts = []
    win_offset = 0
    excluded = sampler_excluded_models(cfg.models)
    for m_i, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        verts = md["verts"]
        va = transform_vertices(verts, cam_m["MVP"], cam_m["viewport"],
                                dyn["camera"]["near"], dyn["camera"]["far"])
        vid = md["vid"]
        f = gather_faces(va, vid, height, width, cfg.backface_culling)
        F = vid.shape[0]                    # local (possibly sharded) count

        world = f["world"]                              # (F, 3, 3)
        fn_raw = jnp.cross(world[:, 1] - world[:, 0], world[:, 2] - world[:, 0])
        face_normal = normalize(fn_raw)                 # (F, 3) world normal

        if mc.has_vn:
            vn = md["vn"]
        else:
            # Faces without vertex normals shade with the face normal
            # (reference Face.get_normals fallback, core.py:186-187).
            vn = jnp.broadcast_to(face_normal[:, None, :], (F, 3, 3))

        raster = {
            "sx": f["sx"], "sy": f["sy"], "szlin": f["szlin"],
            "inv_w": f["inv_w"], "aff": f["aff"], "clip": f["clip"],
            "denom": f["denom"], "bbox": f["bbox"],
            "valid": f["valid"] & md["pad_valid"],
            "clip_en": jnp.full((F,), mc.clip),
            "z_write": jnp.full((F,), mc.depth_test),
        }
        if cfg.has_debug_camera:
            clip_dbg = jnp.matmul(verts, dbg_mvp,
                                  precision="highest")[vid]
            raster["clip_dbg"] = clip_dbg

        # Windowed-sampler metadata (raster_pallas.sample_textures_pallas):
        # window ids are global across models, like gids. The optional
        # second shape-group grid (scene.py) shares the global id space —
        # its block sits right after group 1's inside the model's region.
        if mc.win_offset >= 0:
            win_offset = mc.win_offset
        if m_i in excluded:
            # Mixed-layout fallback: this model's windows are not in the
            # scene table — neutralize its face metadata (the same encoding
            # untextured models carry) so the kernel never visits windows
            # for its faces; _shade_gbuffer gathers its texels instead.
            zeros = jnp.zeros_like(md["win_wbase"])
            ones2 = jnp.ones_like(md["win_thw"])
            for kname in ("wbase", "wnwr", "wnwc", "wrbase", "wcbase",
                          "wkmask", "wbase2", "wnwr2", "wnwc2", "wrbase2",
                          "wcbase2", "wkmask2"):
                raster[kname] = zeros
            for kname in ("wthw", "wthw2", "wngrid", "wngrid2"):
                raster[kname] = ones2
        else:
            raster["wbase"] = md["win_wbase"] + win_offset
            raster["wnwr"] = md["win_nwr"]
            raster["wnwc"] = md["win_nwc"]
            raster["wrbase"] = md["win_rbase"]
            raster["wcbase"] = md["win_cbase"]
            raster["wkmask"] = md["win_kmask"]
            raster["wthw"] = md["win_thw"]
            raster["wbase2"] = md["win2_wbase"] + win_offset
            raster["wnwr2"] = md["win2_nwr"]
            raster["wnwc2"] = md["win2_nwc"]
            raster["wrbase2"] = md["win2_rbase"]
            raster["wcbase2"] = md["win2_cbase"]
            raster["wkmask2"] = md["win2_kmask"]
            raster["wthw2"] = md["win2_thw"]
            raster["wngrid"] = md["win_ngrid"]
            raster["wngrid2"] = md["win2_ngrid"]
            win_offset += mc.num_windows

        attrs = {
            "sx": f["sx"], "sy": f["sy"], "inv_w": f["inv_w"],
            "szlin": f["szlin"], "aff": f["aff"],
            "world": world, "vn": vn, "face_normal": face_normal,
            "uv": md["uv"], "kd": md["kd"], "ks": md["ks"], "ns": md["ns"],
            "kd_slot": md["kd_slot"], "ks_slot": md["ks_slot"],
            "norm_slot": md["norm_slot"], "norm_tangent": md["norm_tangent"],
            "kd_shape": md["kd_shape"], "ks_shape": md["ks_shape"],
            "norm_shape": md["norm_shape"],
            "model_id": jnp.full((F,), len(raster_parts), jnp.int32),
            "pm": md["pm"], "pr": md["pr"], "ka": md["ka"],
        }
        raster_parts.append(raster)
        attr_parts.append(attrs)

    cat = lambda parts: jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    raster, attrs = cat(raster_parts), cat(attr_parts)
    g_local = raster["sx"].shape[0]
    raster["gid"] = jnp.arange(g_local, dtype=jnp.int32) + tris_idx * g_local
    return raster, attrs


def _unpack_texel(packed, scale_off):
    """RGB-packed u32/i32 texels -> float RGB under the stack's (scale,
    offset) dequantization affine (models/scene.py _texture_stack)."""
    r = (packed & 0xFF).astype(jnp.float32)
    g = ((packed >> 8) & 0xFF).astype(jnp.float32)
    b = ((packed >> 16) & 0xFF).astype(jnp.float32)
    rgb = jnp.stack([r, g, b], axis=-1) / 255.0
    return rgb * scale_off[0] + scale_off[1]


def _sample_stack(stack, slot, row, col, scale_off):
    """Gather one RGB-packed u32 texel per pixel and unpack to float RGB.

    One u32 gather + shift/mask is ~5x cheaper than an f32[..., 3] slice
    gather on TPU (gathers cost per indexed element).
    """
    packed = stack[jnp.clip(slot, 0).astype(jnp.int32), row, col]
    return _unpack_texel(packed, scale_off)


def _wrap_index(x, dim):
    """Truncate-to-int then numpy-negative-wrap, in pure float arithmetic.

    Matches the reference's ``.astype(int)`` + fancy-index wrap
    (core.py:141-143) for any index in (-dim, dim) — TPUs have no integer
    divide, so ``% dim`` with a per-pixel divisor is catastrophically slow;
    trunc + floor-mod on the VPU is a handful of cheap ops.
    """
    i = jnp.trunc(x)
    wrapped = i - dim * jnp.floor(i / dim)
    return wrapped.astype(jnp.int32)


def _stack_uv_index(pb, uv, shape_hw):
    """Reference get_UV (core.py:138-143) with per-pixel texture shapes.

    shape_hw: (H, W, 2) float32 real (TH, TW) of each pixel's material map.
    Returns integer (row, col) with numpy-style negative wrap.
    """
    iu = jnp.sum(pb * uv[..., 0], axis=-1)
    iv = jnp.sum(pb * uv[..., 1], axis=-1)
    th = shape_hw[..., 0]
    tw = shape_hw[..., 1]
    col = _wrap_index(jnp.clip(iu, max=1.0) * (tw - 1), tw)
    row = _wrap_index((1.0 - jnp.clip(iv, max=1.0)) * (th - 1), th)
    return row, col


def _shade(cfg: SceneConfig, dyn, tid, stencil, attrs, cam_m, row0=0):
    """Deferred shading of the whole frame from the visibility buffer."""
    height, width = tid.shape[0], cfg.resolution[1]
    fid = jnp.clip(tid, 0)
    bg = tid < 0

    g = lambda name: attrs[name][fid]
    sx, sy, inv_w = g("sx"), g("sy"), g("inv_w")
    bar, pb = sh.pixel_barycentric(g("aff"), inv_w, row0)

    world = g("world")                              # (H, W, 3, 3)
    frag_world = jnp.einsum("...k,...kc->...c", pb, world)

    uv = g("uv")                                    # (H, W, 3, 2)
    model_id = g("model_id")

    # ---- object color: per-face Kd, overridden by each model's diffuse stack.
    color = g("kd")
    for m, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        if not mc.has_map_kd:
            continue
        row, col = _stack_uv_index(pb, uv, g("kd_shape"))
        sampled = _sample_stack(md["kd_stack"], g("kd_slot"), row, col,
                                md["kd_scale_off"])
        mask = (model_id == m) & (g("kd_slot") >= 0)
        color = jnp.where(mask[..., None], sampled, color)

    # ---- normals: vertex-normal interpolation, overridden by normal maps.
    vn = g("vn")                                    # (H, W, 3, 3)
    normal = normalize(jnp.einsum("...k,...kc->...c", pb, vn))
    for m, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        if not mc.has_norm:
            continue
        row, col = _stack_uv_index(pb, uv, g("norm_shape"))
        sampled = _sample_stack(md["norm_stack"], g("norm_slot"), row, col,
                                md["norm_scale_off"])
        tangent_n = sh.tangent_basis_normal(sampled, pb, world, uv, vn)
        mapped = jnp.where(g("norm_tangent")[..., None], tangent_n, sampled)
        mask = (model_id == m) & (g("norm_slot") >= 0)
        normal = jnp.where(mask[..., None], normalize(mapped), normal)

    # ---- specular factor: Ks * 255 or specular-map red channel * 255
    # (reference Face.get_specular, core.py:145-153).
    specular_light = g("ks") * 255.0
    for m, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        if not mc.has_map_ks:
            continue
        row, col = _stack_uv_index(pb, uv, g("ks_shape"))
        sampled = _sample_stack(md["ks_stack"], g("ks_slot"), row, col,
                                md["ks_scale_off"])
        mask = (model_id == m) & (g("ks_slot") >= 0)
        specular_light = jnp.where(mask[..., None],
                                   sampled[..., 0:1] * 255.0, specular_light)

    light = dict(dyn["light"])
    light["light_type"] = cfg.light_type
    light["direction"] = normalize(
        light["position"] - light["center"]).ravel()

    if cfg.shader == SHADER_GENERAL:
        pix = {
            "color": color, "normal": normal, "frag_world": frag_world,
            "specular_light": specular_light, "ns": g("ns")[..., None],
        }
        shadows_mask = (stencil != 0) if cfg.shadows else None
        rgb = sh.shade_general(pix, light, dyn["camera"]["position"],
                               shadows_mask=shadows_mask)
    elif cfg.shader == SHADER_FLAT:
        rgb = sh.shade_flat(g("face_normal"), light)
    elif cfg.shader == SHADER_GOURAUD:
        rgb = sh.shade_gouraud(bar, vn, light)
    elif cfg.shader == SHADER_PBR:
        # The reference's pbr shader runs after rasterize replaced vertex z
        # with linearized depth (triangular.py:96, 220-266): positions here are
        # post-viewport (x, y, z_lin).
        szlin_pos = jnp.stack([sx, sy, g("szlin")], axis=-1)
        pix = {
            "normal_raw": normalize(jnp.einsum("...k,...kc->...c", bar, vn)),
            "screen_pos": jnp.einsum("...k,...kc->...c", bar, szlin_pos),
            # roughness stays rank-(H, W): the GGX terms combine it with
            # (H, W) dot products; metallic broadcasts against RGB.
            "metallic": g("pm")[..., None], "roughness": g("pr"),
            "ao": g("ka"),
        }
        rgb = sh.shade_pbr(pix, light, dyn["camera"]["position"])
    else:
        raise ValueError(f"unknown shader {cfg.shader!r}")

    # ---- background (reference core.py:595-600).
    if cfg.background == "color":
        background = jnp.broadcast_to(dyn["background_color"],
                                      (height, width, 3))
    else:
        from tpu_renderer.ops.cubemap import fill_frame_from_skybox
        background = fill_frame_from_skybox(
            dyn["skybox"], cam_m, (height, width), row0)
    return jnp.where(bg[..., None], background, rgb)


def _shade_gbuffer(cfg: SceneConfig, dyn, tid, stencil, gb, cam_m, row0=0,
                   samp=None, samp_mask=None):
    """Deferred shading from the kernel-interpolated G-buffer.

    Same lighting semantics as :func:`_shade`, but every per-face attribute
    arrives pre-interpolated from the Pallas kernel
    (raster_pallas.visibility_gbuffer_pallas). Texture fetches come from the
    windowed sampler planes (``samp``/``samp_mask``,
    raster_pallas.sample_textures_pallas) when available, falling back to the
    XLA per-pixel gather for kinds the sampler doesn't cover.
    """
    from tpu_renderer.ops import raster_pallas as rp

    height, width = tid.shape[0], cfg.resolution[1]
    bg = tid < 0

    ch = lambda c: gb[c]
    vec = lambda c: jnp.moveaxis(gb[c:c + 3], 0, -1)

    frag_world = vec(rp.GB_WORLD)
    iu, iv = ch(rp.GB_IU), ch(rp.GB_IV)
    model_id = ch(rp.GB_MODEL)

    def tex_index(th, tw):
        col = _wrap_index(jnp.clip(iu, max=1.0) * (tw - 1), tw)
        row = _wrap_index((1.0 - jnp.clip(iv, max=1.0)) * (th - 1), th)
        return row, col

    excluded = sampler_excluded_models(cfg.models)

    def kernel_sampled(m, mc, md, kind):
        """Sampled RGB + mask from the windowed sampler, or None (models a
        mixed window layout excluded from the sampler gather instead)."""
        if samp is None or m in excluded or kind not in mc.win_kinds:
            return None
        k = mc.win_kinds.index(kind)
        rgb = _unpack_texel(samp[k], md[f"{kind}_scale_off"])
        return rgb, ((samp_mask >> k) & 1) > 0

    color = vec(rp.GB_KD)
    for m, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        if not mc.has_map_kd:
            continue
        ks = kernel_sampled(m, mc, md, "kd")
        if ks is not None:
            sampled, sel = ks
            mask = (model_id == m) & sel
        else:
            row, col = tex_index(ch(rp.GB_KD_SLOT + 1), ch(rp.GB_KD_SLOT + 2))
            slot = ch(rp.GB_KD_SLOT)
            sampled = _sample_stack(md["kd_stack"], slot, row, col,
                                    md["kd_scale_off"])
            mask = (model_id == m) & (slot >= 0)
        color = jnp.where(mask[..., None], sampled, color)

    n_base = normalize(vec(rp.GB_N))
    normal = n_base
    for m, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        if not mc.has_norm:
            continue
        ks = kernel_sampled(m, mc, md, "norm")
        if ks is not None:
            sampled, sel = ks
            mask = (model_id == m) & sel
        else:
            row, col = tex_index(ch(rp.GB_NORM_SLOT + 1),
                                 ch(rp.GB_NORM_SLOT + 2))
            slot = ch(rp.GB_NORM_SLOT)
            sampled = _sample_stack(md["norm_stack"], slot, row, col,
                                    md["norm_scale_off"])
            mask = (model_id == m) & (slot >= 0)
        tangent_n = (normalize(vec(rp.GB_TAN)) * sampled[..., 0:1] +
                     normalize(vec(rp.GB_BIT)) * sampled[..., 1:2] +
                     n_base * sampled[..., 2:3])
        is_tangent = ch(rp.GB_NORM_SLOT + 3) > 0.5
        mapped = jnp.where(is_tangent[..., None], tangent_n, sampled)
        normal = jnp.where(mask[..., None], normalize(mapped), normal)

    specular_light = vec(rp.GB_KS) * 255.0
    for m, (mc, md) in enumerate(zip(cfg.models, dyn["models"])):
        if not mc.has_map_ks:
            continue
        ks = kernel_sampled(m, mc, md, "ks")
        if ks is not None:
            sampled, sel = ks
            mask = (model_id == m) & sel
        else:
            row, col = tex_index(ch(rp.GB_KS_SLOT + 1), ch(rp.GB_KS_SLOT + 2))
            slot = ch(rp.GB_KS_SLOT)
            sampled = _sample_stack(md["ks_stack"], slot, row, col,
                                    md["ks_scale_off"])
            mask = (model_id == m) & (slot >= 0)
        specular_light = jnp.where(mask[..., None],
                                   sampled[..., 0:1] * 255.0, specular_light)

    light = dict(dyn["light"])
    light["light_type"] = cfg.light_type
    light["direction"] = normalize(
        light["position"] - light["center"]).ravel()

    pix = {
        "color": color, "normal": normal, "frag_world": frag_world,
        "specular_light": specular_light, "ns": ch(rp.GB_NS)[..., None],
    }
    shadows_mask = (stencil != 0) if cfg.shadows else None
    rgb = sh.shade_general(pix, light, dyn["camera"]["position"],
                           shadows_mask=shadows_mask)

    if cfg.background == "color":
        background = jnp.broadcast_to(dyn["background_color"],
                                      (height, width, 3))
    else:
        from tpu_renderer.ops.cubemap import fill_frame_from_skybox
        background = fill_frame_from_skybox(
            dyn["skybox"], cam_m, (height, width), row0)
    return jnp.where(bg[..., None], background, rgb)


def _background(cfg: SceneConfig, dyn, cam_m, height, width, row0):
    if cfg.background == "color":
        return jnp.broadcast_to(dyn["background_color"], (height, width, 3))
    from tpu_renderer.ops.cubemap import fill_frame_from_skybox
    return fill_frame_from_skybox(dyn["skybox"], cam_m, (height, width), row0)


def _shade_slim(cfg: SceneConfig, dyn, tid, gb, cam_m, row0=0):
    """Deferred shading from the slim kernel G-buffer (flat/gouraud/pbr).

    The non-general shaders read no textures (reference triangular.py:
    174-182, 220-266): lighting consumes only the screen-barycentric-
    interpolated normal — plus screen position and Pm/Pr/Ka for PBR — so the
    kernel forwards 3-11 channels (raster_pallas._SLIM_CHANNELS) and the
    per-pixel attribute gathers of :func:`_shade` disappear entirely.
    """
    height, width = tid.shape[0], cfg.resolution[1]
    bg = tid < 0

    light = dict(dyn["light"])
    light["light_type"] = cfg.light_type
    light["direction"] = normalize(
        light["position"] - light["center"]).ravel()

    vec = lambda c: jnp.moveaxis(gb[c:c + 3], 0, -1)
    if cfg.shader == SHADER_FLAT:
        rgb = sh.shade_flat(vec(0), light)
    elif cfg.shader == SHADER_GOURAUD:
        rgb = sh.shade_gouraud_n(vec(0), light)
    else:                                           # SHADER_PBR
        pix = {
            "normal_raw": normalize(vec(0)),
            "screen_pos": vec(3),
            "metallic": gb[6][..., None], "roughness": gb[7],
            "ao": vec(8),
        }
        rgb = sh.shade_pbr(pix, light, dyn["camera"]["position"])

    background = _background(cfg, dyn, cam_m, height, width, row0)
    return jnp.where(bg[..., None], background, rgb)


def _split_use(cfg, faces, env):
    """Should the Pallas path split visibility and G-buffer into two kernels
    with the phase1_keep z-interval prune between them?

    The split pays a full extra visit pass, so it only wins when many
    faces LOSE every pixel to overdraw. MEASURED on the 100k-face crowd
    (tools/exp_crowd_budget.py, round 5): with backface culling the
    phase-1 keep rate is 96-97% at both camera heights — the culled
    losers were the overdraw — and the split costs ~1 ms/frame (87.4 vs
    86.2 fused); with culling off half the faces lose everywhere and the
    prune is what makes 100k-face scenes tractable. Default ("1"):
    split iff the mesh is multi-chunk AND culling is off. Env
    TPU_RENDERER_SPLIT: 0 = never, 2 = force.
    """
    from tpu_renderer.ops import raster_pallas as rp
    if env == "2":
        return True
    return (env != "0" and faces["sx"].shape[0] > rp.FACE_CHUNK
            and not cfg.backface_culling)


def render_core(cfg: SceneConfig, dyn, *, local_height=None, row0=0,
                axis_rows=None, axis_tris=None):
    """Render the (possibly row/triangle-sharded) frame BEFORE flip/quantize.

    Single chip: ``render_core(cfg, dyn)`` computes the whole frame.

    Under ``shard_map`` over a ('rows', 'tris') mesh: each shard rasterizes its
    face subset over its row block; z-buffers combine with ``pmin`` (depth is
    an associative min-reduce, SURVEY.md §5.8), winning ids with a
    z-match + ``pmax`` argmin-style combine, stencil counts with ``psum``
    (signed crossing counts commute), and shading attributes ``all_gather``
    over the triangle axis. Collectives ride ICI; no host round-trips.

    Returns (frame f32 (local_H, W, 3), zbuf, tid, stencil).
    """
    height, width = cfg.resolution
    if local_height is None:
        local_height = height
    sign = cfg.system

    cam_m = _cam_matrices(cfg, dyn["camera"], cfg.cam_projection_type)
    dbg_mvp = None
    if cfg.has_debug_camera:
        dbg_mvp = _cam_matrices(cfg, dyn["debug_camera"],
                                cfg.dbg_projection_type)["MVP"]

    if not cfg.models:
        # Empty scene: background only (the reference renders its fill color).
        zbuf = jnp.full((local_height, width), jnp.inf * sign, jnp.float32)
        tid = jnp.full((local_height, width), -1, jnp.int32)
        stencil = jnp.zeros((local_height, width), jnp.int32)
        if cfg.background == "color":
            frame = jnp.broadcast_to(dyn["background_color"],
                                     (local_height, width, 3))
        else:
            from tpu_renderer.ops.cubemap import fill_frame_from_skybox
            frame = fill_frame_from_skybox(dyn["skybox"], cam_m,
                                           (local_height, width), row0)
        return frame, zbuf, tid, stencil

    tris_idx = jax.lax.axis_index(axis_tris) if axis_tris else 0
    n_tris = jax.lax.axis_size(axis_tris) if axis_tris else 1
    faces, attrs = _build_face_batch(cfg, dyn, cam_m, dbg_mvp,
                                     tris_idx=tris_idx)

    # The Pallas tile-binned kernels are the production TPU path — single
    # chip AND sharded (tile grids shift by row0; per-shard buffers merge
    # with pmin/pmax/psum). The XLA streaming path is the portable oracle.
    use_pallas = cfg.backend == "pallas"
    sharded = axis_tris is not None or axis_rows is not None

    # Every device shader gets its attributes forward-interpolated by the
    # kernel — per-pixel table gathers are pathologically slow on TPU. The
    # general shader uses the full 32-channel G-buffer (+ windowed texture
    # sampling); flat/gouraud/pbr use the 3-11 channel slim layouts.
    use_gbuffer = use_pallas and cfg.shader == SHADER_GENERAL
    slim_layout = (cfg.shader if use_pallas and cfg.shader in
                   (SHADER_FLAT, SHADER_GOURAUD, SHADER_PBR) else None)
    gbuffer = None

    # In-kernel windowed texture sampling: on where it beats the per-pixel
    # XLA gather (~13 ms/Mpx); the visit count is resolution-independent, so
    # small frames keep the gather.
    # Auto mode keys on the GLOBAL frame size so the sampler decision does
    # not silently flip with the shard count (per-visit cost is resolution-
    # independent, so the global frame is the right economic unit).
    from tpu_renderer.ops import raster_pallas as rp
    use_tex_kernel = (cfg.tex_kernel if cfg.tex_kernel is not None
                      else height * width >= 512 * 512)
    samp = samp_mask = None
    # Window-table layout must be uniform across the models the sampler
    # covers (one shared table, one kernel mode): all shared-cell grid
    # (VMEM-resident, the default) or all per-face DMA windows. A mix
    # (e.g. one model's texture exceeds the grid budget) keeps the sampler
    # for the grid-layout models and drops ONLY the odd ones to the XLA
    # gather path (sampler_excluded_models) — bit-identical either way.
    excluded = sampler_excluded_models(cfg.models)
    _texm = [mc for i, mc in enumerate(cfg.models)
             if mc.win_kinds and i not in excluded]
    n_kinds = max((len(mc.win_kinds) for mc in _texm), default=0)
    win_grid = bool(_texm) and all(mc.win_grid for mc in _texm)
    two_groups = any(mc.win2 for i, mc in enumerate(cfg.models)
                     if i not in excluded)

    from tpu_renderer.ops.raster_xla import visibility_pass, zbuffer_pass
    rows_only = axis_tris is None
    if slim_layout and (not sharded or rows_only):
        # Slim fused kernel: z + ids + the few channels flat/gouraud/pbr
        # read, no texture tables, no sampler. Multi-chunk scenes split the
        # phases with the z-interval prune exactly like the general-shader
        # path below.
        from tpu_renderer.ops.raster_pallas import (face_bins,
                                                    visibility_gbuffer_pallas)
        bins = face_bins(faces, local_height, width, row0=row0,
                         with_debug=cfg.has_debug_camera)
        _split_env = os.environ.get("TPU_RENDERER_SPLIT", "1")
        if _split_use(cfg, faces, _split_env):
            from tpu_renderer.ops.raster_pallas import (phase1_keep,
                                                        visibility_pallas)
            zb_sign, tid = visibility_pallas(
                faces, local_height, width, sign,
                with_debug=cfg.has_debug_camera,
                interpret=cfg.pallas_interpret, bins=bins[:2], row0=row0)
            keep = phase1_keep(faces, zb_sign, local_height, width, sign,
                               row0=row0)
            bins1 = face_bins(faces, local_height, width, row0=row0,
                              with_debug=cfg.has_debug_camera, keep=keep)
            gbuffer = visibility_gbuffer_pallas(
                faces, attrs, local_height, width, sign,
                with_debug=cfg.has_debug_camera,
                interpret=cfg.pallas_interpret,
                bins=bins1[:2], gb_layout=slim_layout, row0=row0,
                tid_in=tid)
        else:
            zb_sign, tid, gbuffer = visibility_gbuffer_pallas(
                faces, attrs, local_height, width, sign,
                with_debug=cfg.has_debug_camera,
                interpret=cfg.pallas_interpret,
                bins=bins[:2], gb_layout=slim_layout, row0=row0)
    elif use_gbuffer and (not sharded or rows_only):
        # Row-only sharding runs the SAME fused kernel as single-chip: each
        # shard owns its frame rows completely (tile grids shift by row0),
        # so no cross-shard merge is needed between the z and G-buffer
        # phases and the in-kernel windowed sampler stays on.
        from tpu_renderer.ops.raster_pallas import (face_bins,
                                                    sample_textures_pallas,
                                                    visibility_gbuffer_pallas)
        from tpu_renderer.ops import raster_pallas as rp
        bins = face_bins(faces, local_height, width, row0=row0,
                         with_debug=cfg.has_debug_camera)
        # The in-kernel sampler rides its per-face scalars in SMEM (word2);
        # meshes past SMEM_FACE_CAP (raster_pallas) fall back to the XLA
        # gather path rather than overflow scalar memory.
        sampler_on = (n_kinds > 0 and use_tex_kernel
                      and faces["sx"].shape[0] <= rp.SMEM_FACE_CAP)
        # With the windowed sampler active, every windowed kind skips the
        # XLA gather, so phase 1 needn't interpolate the slot/shape table
        # channels — unless some model has a texture kind the sampler
        # doesn't cover (including models excluded by a mixed layout).
        needs_tables = (not sampler_on) or any(
            (mc.has_map_kd and "kd" not in mc.win_kinds)
            or (mc.has_norm and "norm" not in mc.win_kinds)
            or (mc.has_map_ks and "ks" not in mc.win_kinds)
            for mc in cfg.models) or bool(excluded)
        windows = None
        if sampler_on:
            # Window content blocks, row-padded to the scene-wide kind count
            # (models carry 16 rows per kind they sample). Scene._prepare
            # pre-assembles the concatenation (static content — re-padding it
            # per frame costs ~0.5 ms at diablo scale); assemble inline only
            # for direct render_core callers.
            windows = dyn.get("windows_all")
            if windows is None:
                parts = []
                for m_i, (mc, md) in enumerate(zip(cfg.models,
                                                   dyn["models"])):
                    if not mc.win_kinds or m_i in excluded:
                        continue
                    w = md["windows"]
                    if w.shape[1] < rp.WIN_R * n_kinds:
                        w = jnp.pad(
                            w, ((0, 0), (0, rp.WIN_R * n_kinds - w.shape[1]),
                                (0, 0)))
                    parts.append(w)
                # _SPEC tail rows: the sampler prefetches speculative window
                # sets as one contiguous block DMA (see Scene._windows_all).
                parts.append(jnp.zeros((rp._SPEC,) + tuple(parts[0].shape[1:]),
                                       jnp.int32))
                windows = jnp.concatenate(parts, axis=0)
        # Texture sampling runs fused inside phase 1 (windows != None):
        # winner masks, slab scans, and in-register iu/iv are shared instead
        # of re-derived by a third kernel pass.
        #
        # Multi-chunk scenes (> FACE_CHUNK faces) SPLIT the two phases into
        # separate kernels with an XLA z-interval prune between them: at
        # high triangle counts most faces lose every pixel to overdraw, and
        # a losing phase-1 visit is pure scalar-bound overhead. Visibility
        # resolves first (visibility_pallas — the same kernel the sharded
        # path runs), then phase1_keep drops every face whose sign-space z
        # range over its bbox misses the final z-buffer's range there, and
        # the G-buffer pass runs on the re-binned survivors with the winner
        # ids as an input block (tid_in). Single-chunk scenes keep the
        # fused call: nearly every face wins pixels, so the prune would
        # only add its own cost.
        _split_env = os.environ.get("TPU_RENDERER_SPLIT", "1")
        split = _split_use(cfg, faces, _split_env)
        common = dict(
            with_debug=cfg.has_debug_camera, interpret=cfg.pallas_interpret,
            with_tex_tables=needs_tables, windows=windows,
            n_kinds=n_kinds if windows is not None else 0, row0=row0,
            two_groups=two_groups, win_grid=win_grid)
        if split:
            from tpu_renderer.ops.raster_pallas import (phase1_keep,
                                                        visibility_pallas)
            zb_sign, tid = visibility_pallas(
                faces, local_height, width, sign,
                with_debug=cfg.has_debug_camera,
                interpret=cfg.pallas_interpret, bins=bins[:2], row0=row0)
            keep = phase1_keep(faces, zb_sign, local_height, width, sign,
                               row0=row0)
            bins1 = face_bins(faces, local_height, width, row0=row0,
                              with_debug=cfg.has_debug_camera, keep=keep)
            outs = visibility_gbuffer_pallas(
                faces, attrs, local_height, width, sign,
                bins=bins1[:2], tid_in=tid, **common)
            if sampler_on:
                gbuffer, samp, samp_mask = outs
            else:
                gbuffer = outs
        else:
            outs = visibility_gbuffer_pallas(
                faces, attrs, local_height, width, sign,
                bins=bins[:2], **common)
            if sampler_on:
                zb_sign, tid, gbuffer, samp, samp_mask = outs
            else:
                zb_sign, tid, gbuffer = outs
    elif use_pallas and sharded:
        # Sharded Pallas: per-shard z/id kernels in global coordinates
        # (bit-identical pixel math; tile grids shift by row0), buffers
        # merged with XLA collectives over ICI.
        #
        # Tris-sharded mode pays 4 kernel passes where single-chip pays 1
        # (SURVEY §5.8): vis-z -> pmin -> tid re-claim -> pmax -> G-buffer
        # -> psum -> sampler -> psum. The merge points make this
        # irreducible: winner ids are only meaningful against the GLOBAL
        # z-buffer, which exists only after the pmin, and the G-buffer can
        # only interpolate against the global ids after the pmax — each
        # collective is a data dependency no kernel fusion can cross.
        # When axis_tris is set, pass 1 runs with want_tid=False: local
        # winner ids are meaningless before the pmin merge (tidpass_pallas
        # re-claims them against the global buffer), so the kernel skips
        # the tid output plane and its per-visit store (~1/3 of pass 1's
        # stores, SURVEY §5.8).
        from tpu_renderer.ops.raster_pallas import (face_bins, gbuffer_pallas,
                                                    tidpass_pallas,
                                                    visibility_pallas)
        bins = face_bins(faces, local_height, width, row0=row0,
                         with_debug=cfg.has_debug_camera)
        zb_local, tid_local = visibility_pallas(
            faces, local_height, width, sign,
            with_debug=cfg.has_debug_camera, interpret=cfg.pallas_interpret,
            bins=bins[:2], row0=row0, want_tid=axis_tris is None)
        if axis_tris:
            zb_sign = jax.lax.pmin(zb_local, axis_tris)
            # Re-claim against the merged buffer (a shard's local winner can
            # be beaten by another shard's geometry; non-z-writing faces can
            # claim at depths the local buffer never reached), then
            # last-wins across shard-major global ids.
            tid = tidpass_pallas(
                faces, zb_sign, local_height, width, sign,
                with_debug=cfg.has_debug_camera,
                interpret=cfg.pallas_interpret, bins=bins[:2], row0=row0)
            tid = jax.lax.pmax(tid, axis_tris)
        else:
            zb_sign, tid = zb_local, tid_local
        if use_gbuffer or slim_layout:
            gbuffer = gbuffer_pallas(
                faces, attrs, tid, local_height, width,
                with_debug=cfg.has_debug_camera,
                interpret=cfg.pallas_interpret, bins=bins[:2], row0=row0,
                gb_layout=slim_layout or "general")
            if axis_tris:
                # Each pixel's channels come from exactly one shard (global
                # ids are unique): zero-filled partials sum to the merge.
                gbuffer = jax.lax.psum(gbuffer, axis_tris)
            if use_gbuffer and n_kinds > 0 and use_tex_kernel \
                    and faces["sx"].shape[0] <= rp.SMEM_FACE_CAP:
                # Windowed sampling over the merged buffers: each shard
                # samples only the pixels its own faces won (win = tid ==
                # global id), so zero-filled partial samp/mask planes psum
                # to the full-frame result.
                from tpu_renderer.ops.raster_pallas import (
                    GB_IU, GB_IV, sample_textures_pallas)
                windows = dyn.get("windows_all")
                if windows is not None:
                    samp, samp_mask = sample_textures_pallas(
                        faces, bins[:2], windows, tid, gbuffer[GB_IU],
                        gbuffer[GB_IV], local_height, width, n_kinds,
                        interpret=cfg.pallas_interpret,
                        two_groups=two_groups, win_grid=win_grid)
                    if axis_tris:
                        samp = jax.lax.psum(samp, axis_tris)
                        samp_mask = jax.lax.psum(samp_mask, axis_tris)
    elif use_pallas:
        from tpu_renderer.ops.raster_pallas import visibility_pallas
        zb_sign, tid = visibility_pallas(
            faces, local_height, width, sign,
            with_debug=cfg.has_debug_camera, interpret=cfg.pallas_interpret)
    else:
        zb_sign = zbuffer_pass(faces, local_height, width, sign, cfg.chunk,
                               row0)
    if axis_tris and not use_pallas:
        zb_sign = jax.lax.pmin(zb_sign, axis_tris)
    if not use_pallas:
        tid = visibility_pass(faces, zb_sign, local_height, width, sign,
                              cfg.chunk, row0)
        if axis_tris:
            # Last-wins across shards: ids are shard-major, so pmax picks the
            # highest-id claimant among shards passing the final z-test.
            tid = jax.lax.pmax(tid, axis_tris)
    if axis_tris and not (use_gbuffer or slim_layout):
        # Gather every shard's attributes so shading can index global ids.
        attrs = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, axis_tris).reshape(
                (-1,) + a.shape[1:]),
            attrs)
    zbuf = zb_sign * sign

    if cfg.shadows:
        from tpu_renderer.ops.shadow import prepare_quads, shadow_stencil
        if use_pallas:
            from tpu_renderer.ops.raster_pallas import (pack_quads,
                                                        stencil_pallas)
            prepared = prepare_quads(cfg, dyn, cam_m, axis_name=axis_tris,
                                     shard_idx=tris_idx)
            if prepared is None:
                stencil = jnp.zeros((local_height, width), jnp.int32)
            else:
                # With axis_tris, prepare_quads returned PER-SHARD tables
                # (each shard clipped/projected only its slice of the global
                # silhouette-first order); partial stencils psum below.
                screen, counts, ok, n_sil, sil_cap = prepared
                near = dyn["camera"]["near"]
                far = dyn["camera"]["far"]

                def _stencil_for(scr, cnt, okk):
                    qdata, qi = pack_quads(scr, cnt, okk, height, width,
                                           near, far)
                    return stencil_pallas(qdata, qi, None, local_height,
                                          width, sign, near, far,
                                          interpret=cfg.pallas_interpret,
                                          row0=row0, zb_sign=zb_sign)

                if sil_cap is not None:
                    # prepare_quads compacted silhouettes into rows [:c]
                    # (per shard) for the smallest cap level c with
                    # n_sil <= c * n_shards: pack + bin + rasterize only
                    # that prefix (the quad table is ~5x the silhouette
                    # count, and binning/packing/bin-table cost scales with
                    # rows — the crowd scene's n_sil fits cap1, 40% fewer
                    # rows than the outer cap). The full-table branch
                    # covers pathological frames.
                    n_sh = jax.lax.axis_size(axis_tris) if axis_tris else 1
                    branch = lambda _: _stencil_for(screen, counts, ok)
                    for cap_k in reversed(sil_cap):
                        branch = (lambda ck, big: lambda _: jax.lax.cond(
                            n_sil <= ck * n_sh,
                            lambda __: _stencil_for(screen[:ck],
                                                    counts[:ck], ok[:ck]),
                            big, None))(cap_k, branch)
                    stencil = branch(None)
                else:
                    stencil = _stencil_for(screen, counts, ok)
                if axis_tris:
                    stencil = jax.lax.psum(stencil, axis_tris)
        elif axis_tris:
            stencil = shadow_stencil(
                cfg, dyn, cam_m, zbuf, row0=row0, axis_name=axis_tris,
                shard_idx=tris_idx, quad_slice=None)
            stencil = jax.lax.psum(stencil, axis_tris)
        else:
            stencil = shadow_stencil(cfg, dyn, cam_m, zbuf, row0=row0)
    else:
        stencil = jnp.zeros((local_height, width), jnp.int32)

    if use_gbuffer:
        frame = _shade_gbuffer(cfg, dyn, tid, stencil, gbuffer, cam_m,
                               row0=row0, samp=samp, samp_mask=samp_mask)
    elif slim_layout and gbuffer is not None:
        frame = _shade_slim(cfg, dyn, tid, gbuffer, cam_m, row0=row0)
    else:
        frame = _shade(cfg, dyn, tid, stencil, attrs, cam_m, row0=row0)
    return frame, zbuf, tid, stencil


def render_frame(cfg: SceneConfig, dyn):
    """The per-frame device program. Returns (frame_u8, zbuf, tid, stencil)."""
    frame, zbuf, tid, stencil = render_core(cfg, dyn)
    # Vertical flip + gamma 0.8 + quantize (reference core.py:640).
    out = (jnp.clip(frame[::-1] ** 0.8, 0.0, 1.0) * 255).astype(jnp.uint8)
    return out, zbuf, tid, stencil


render_frame_jit = jax.jit(render_frame, static_argnames=("cfg",))


@partial(jax.jit, static_argnames=("cfg", "kind"))
def render_debug_frame(cfg: SceneConfig, dyn, kind):
    """Wireframe / points shaders, fully on device (reference
    triangular.py:269-283). Replaces the per-face host loops of
    overlay.draw_wireframe / draw_points with one compiled program:

    - the normal pipeline resolves the z-buffer (shading discarded),
    - every REAL face (no culling/validity masks — the host shaders iterate
      all of model.face_array) re-runs the vertex stage,
    - wireframe: a Pallas DDA line kernel (raster_pallas.lines_pallas) marks
      pixels where any edge's DDA point passes the strict ``zbuf - z > 0``
      test; one color makes the host's sequential splat order-free,
    - points: endpoint splats resolve write order with a scatter-max over
      the write index (last-wins, parity bit = red/blue), the documented
      TPU-friendly alternative to serialized scatters.

    Returns (frame_u8, zbuf, tid, stencil) like render_frame.
    """
    import dataclasses

    assert kind in (SHADER_WIREFRAME, SHADER_POINTS)
    cfg2 = dataclasses.replace(cfg, shader=SHADER_GOURAUD)
    _, zbuf, tid, stencil = render_core(cfg2, dyn)
    height, width = cfg.resolution
    cam_m = _cam_matrices(cfg, dyn["camera"], cfg.cam_projection_type)
    background = _background(cfg, dyn, cam_m, height, width, 0)

    sxs, sys_, szs, fns, valids = [], [], [], [], []
    for mc, md in zip(cfg.models, dyn["models"]):
        va = transform_vertices(md["verts"], cam_m["MVP"], cam_m["viewport"],
                                dyn["camera"]["near"], dyn["camera"]["far"])
        vid = md["vid"]
        screen = va["screen"][vid]
        sxs.append(screen[..., 0])
        sys_.append(screen[..., 1])
        szs.append(va["zlin"][vid])
        world = md["verts"][vid][..., :3]
        n = jnp.cross(world[:, 1] - world[:, 0], world[:, 2] - world[:, 0])
        nn = jnp.linalg.norm(n, axis=1, keepdims=True)
        fns.append(n / jnp.where(nn == 0, 1.0, nn))
        valids.append(md["pad_valid"])
    sx = jnp.concatenate(sxs)
    sy = jnp.concatenate(sys_)
    sz = jnp.concatenate(szs)
    fn = jnp.concatenate(fns)
    valid = jnp.concatenate(valids)

    interpret = cfg.pallas_interpret or jax.default_backend() != "tpu"
    if kind == SHADER_WIREFRAME:
        from tpu_renderer.ops.raster_pallas import lines_pallas, pack_lines
        ia = jnp.array([0, 1, 2])
        ib = jnp.array([1, 2, 0])
        p0 = jnp.stack([sx[:, ia], sy[:, ia], sz[:, ia]], -1).reshape(-1, 3)
        p1 = jnp.stack([sx[:, ib], sy[:, ib], sz[:, ib]], -1).reshape(-1, 3)
        ldata, lbbox, coeffs = pack_lines(p0, p1, height, width)
        mask = lines_pallas(ldata, lbbox, jnp.repeat(valid, 3), coeffs,
                            zbuf, height, width, interpret=interpret)
        color = jnp.asarray([64 / 255, 64 / 255, 128 / 255], jnp.float32)
        frame = jnp.where((mask > 0)[..., None], color, background)
    else:
        # Backface cull against the camera direction (triangular.py:277-283:
        # cam_dir = -position normalized; keep normal . cam_dir > 0).
        pos = dyn["camera"]["position"]
        cam_dir = -pos / jnp.maximum(jnp.linalg.norm(pos), 1e-30)
        keep = valid & (jnp.sum(fn * cam_dir, axis=-1) > 0)
        # Write sequence per face: (v0 R)(v1 B)(v1 R)(v2 B)(v2 R)(v0 B) —
        # last write wins; resolve with a scatter-max over the write index
        # whose parity is the color.
        vsel = jnp.array([0, 1, 1, 2, 2, 0])
        ci = sx[:, vsel].astype(jnp.int32)           # trunc, like .astype
        ri = sy[:, vsel].astype(jnp.int32)
        inb = (ri >= 0) & (ri < height) & (ci >= 0) & (ci < width)
        ok = keep[:, None] & inb
        order = jnp.arange(ok.size, dtype=jnp.int32).reshape(ok.shape)
        lin = jnp.where(ok, ri * width + ci, -1)
        win = jnp.full(height * width, -1, jnp.int32).at[
            lin.reshape(-1)].max(order.reshape(-1), mode="drop")
        win = win.reshape(height, width)
        rgb = jnp.where(((win & 1) == 1)[..., None],
                        jnp.asarray([0.0, 0.0, 1.0]),
                        jnp.asarray([1.0, 0.0, 0.0]))
        frame = jnp.where((win >= 0)[..., None], rgb, background)

    out = (jnp.clip(frame[::-1] ** 0.8, 0.0, 1.0) * 255).astype(jnp.uint8)
    return out, zbuf, tid, stencil


@partial(jax.jit, static_argnames=("cfg",))
def render_core_jit(cfg, dyn):
    """Pre-flip float frame + buffers — for host-side debug overlays."""
    return render_core(cfg, dyn)


@partial(jax.jit, static_argnames=("cfg", "ss"))
def render_ssaa_jit(cfg, dyn, ss):
    """Supersampled render: cfg.resolution is already ss-scaled; box-filter
    the float frame down by ss before flip/gamma/quantize."""
    frame, zbuf, tid, stencil = render_core(cfg, dyn)
    hh, ww = frame.shape[0], frame.shape[1]
    frame = frame.reshape(hh // ss, ss, ww // ss, ss, 3).mean(axis=(1, 3))
    out = (jnp.clip(frame[::-1] ** 0.8, 0.0, 1.0) * 255).astype(jnp.uint8)
    return out, zbuf, tid, stencil


@partial(jax.jit, static_argnames=("cfg",))
def face_statistics(cfg: SceneConfig, dyn, tid):
    """Per-model face counters, the batched equivalent of the reference's
    per-face Errors tally (core.py:624-636, triangular.py:15-20).

    Returns a list (one dict per model) of device scalars:
    total, rendered (faces owning >= 1 pixel in the visibility buffer),
    backface_culled, degenerate (EMPTY_B), offscreen (WRONG_MIN_MAX /
    empty clamped bbox), and occluded_or_clipped (the remainder — the
    reference's CLIPPED / EMPTY_Z outcomes are fragment-level and collapse
    here).
    """
    height, width = cfg.resolution
    cam_m = _cam_matrices(cfg, dyn["camera"], cfg.cam_projection_type)

    # Which faces own at least one pixel.
    g_total = sum(md["vid"].shape[0] for md in dyn["models"])
    owned = jnp.zeros(g_total + 1, jnp.int32).at[
        jnp.clip(tid, -1) + 0].add(jnp.where(tid >= 0, 1, 0), mode="drop")

    stats = []
    offset = 0
    for mc, md in zip(cfg.models, dyn["models"]):
        verts = md["verts"]
        va = transform_vertices(verts, cam_m["MVP"], cam_m["viewport"],
                                dyn["camera"]["near"], dyn["camera"]["far"])
        vid = md["vid"]
        F = vid.shape[0]
        screen = va["screen"][vid]
        sx, sy, sz = screen[..., 0], screen[..., 1], screen[..., 2]

        from tpu_renderer.ops.vertex import screen_normal_z
        from tpu_renderer.ops.transforms import bound_box_batch
        nz = screen_normal_z(sx, sy, sz)
        real = md["pad_valid"]
        culled = real & (nz < 0) if cfg.backface_culling else jnp.zeros(F, bool)

        v0x, v0y = sx[:, 1] - sx[:, 0], sy[:, 1] - sy[:, 0]
        v1x, v1y = sx[:, 2] - sx[:, 0], sy[:, 2] - sy[:, 0]
        denom = ((v0x * v0x + v0y * v0y) * (v1x * v1x + v1y * v1y) -
                 (v0x * v1x + v0y * v1y) ** 2)
        degenerate = real & ~culled & (denom == 0)

        _, box_valid = bound_box_batch(jnp.stack([sx, sy], -1), height, width)
        offscreen = real & ~culled & ~degenerate & ~box_valid

        rendered = real & (owned[offset:offset + F] > 0)
        leftover = real & ~culled & ~degenerate & ~offscreen & ~rendered
        stats.append({
            "total": real.sum(),
            "rendered": rendered.sum(),
            "backface_culled": culled.sum(),
            "degenerate": degenerate.sum(),
            "offscreen": offscreen.sum(),
            "occluded_or_clipped": leftover.sum(),
        })
        offset += F
    return stats
