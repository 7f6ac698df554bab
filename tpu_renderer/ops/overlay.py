"""Debug overlays: view-frustum wireframe and world-axes, host-side.

Parity with the reference's ``obj/frustums.py`` and ``obj/axes.py``. These are
debug visualizations drawn onto the rendered float frame + z-buffer after the
device pipeline finishes (the reference also runs them on the host frame,
core.py:638-639); they never touch the hot path.

``draw_view_frustum`` renders the debug camera's frustum as a red wireframe
cube transformed by inv(MVP), each face clipped against the *main* camera's
frustum, with dashed lines for back faces while the camera is outside the
frustum (the reference's ``arange // 13 & 1`` dash trick, frustums.py:78-82)
and the +-1 pixel half-blend anti-aliasing.
"""
from __future__ import annotations

import numpy as np

from tpu_renderer.ops.frustum import clipping

__all__ = ["Frustum", "draw_view_frustum", "draw_axis"]


class Frustum:
    """NDC cube geometry (reference frustums.py:7-43).

    Vertices are the 8 clip-space corners; ``faces`` index the 6 quads with
    outward-consistent winding.
    """

    vertices = np.array([
        [-1.0, -1.0, 1.0, 1.0],   # 0 near-ish corners (z = +1)
        [1.0, -1.0, 1.0, 1.0],    # 1
        [-1.0, 1.0, 1.0, 1.0],    # 2
        [1.0, 1.0, 1.0, 1.0],     # 3
        [-1.0, 1.0, -1.0, 1.0],   # 4 far-ish corners (z = -1)
        [1.0, 1.0, -1.0, 1.0],    # 5
        [-1.0, -1.0, -1.0, 1.0],  # 6
        [1.0, -1.0, -1.0, 1.0],   # 7
    ])

    edges = np.array([(0, 1), (1, 3), (3, 2), (2, 0), (5, 4), (7, 5), (6, 7),
                      (4, 6), (2, 4), (3, 5), (1, 7), (0, 6)])

    triangles = np.array([(4, 6, 7), (7, 5, 4), (0, 6, 4), (4, 2, 0),
                          (7, 1, 3), (3, 5, 7), (0, 2, 3), (3, 1, 0),
                          (4, 5, 3), (3, 2, 4), (6, 0, 7), (7, 0, 1)])

    faces = np.array([(2, 4, 5, 3), (0, 1, 7, 6), (0, 2, 3, 1),
                      (5, 4, 6, 7), (3, 5, 7, 1), (4, 2, 0, 6)])


def _linearize(z, near, far):
    return (2 * near * far) / (far + near - z * (far - near))


def draw_view_frustum(frame, camera_m, debug_m, camera_position, near, far,
                      resolution, z_buffer, sign):
    """Wireframe of the debug camera's frustum (reference frustums.py:46-103).

    frame: (H, W, 3) float frame (pre-flip); z_buffer: (H, W); both numpy,
    modified in place. camera_m / debug_m: host matrix dicts (MVP, viewport,
    frustum_planes).
    """
    from tpu_renderer.ops.lines import bresenham_line

    dbg_mvp = np.asarray(debug_m["MVP"], np.float64)
    world = Frustum.vertices @ np.linalg.inv(dbg_mvp)
    world = world / world[:, [3]]
    planes = np.asarray(camera_m["frustum_planes"], np.float64)
    color = np.array((1.0, 0.0, 0.0))

    test = np.append(np.asarray(camera_position, np.float64), 1) @ dbg_mvp
    inside_frustum = (-test[3] < test[0] < test[3] and
                      -test[3] < test[1] < test[3] and
                      -test[3] < test[2] < test[3])

    mvp = np.asarray(camera_m["MVP"], np.float64)
    viewport = np.asarray(camera_m["viewport"], np.float64)
    h, w_res = resolution

    for face in world[Frustum.faces]:
        face = clipping(face, planes)
        if face.shape[0] < 3:
            continue
        face = np.asarray(face, np.float64) @ mvp
        face = face / face[:, [3]]
        face = face @ viewport

        a, b, c = face[0, :3], face[1, :3], face[2, :3]
        n = np.cross(b - a, c - a)

        face[:, 2] = _linearize(face[:, 2], near, far)
        count = len(face)
        for i in range(count):
            pxls = bresenham_line(face[i], face[(i + 1) % count])
            if n[2] > 0 and not inside_frustum:
                # Dashed back-face edges: odd chunks of 13 pixels.
                mask = np.bitwise_and(np.arange(len(pxls)) // 13, 1,
                                      dtype=np.int8).view(np.bool_)
                pxls = pxls[mask]
            if not len(pxls):
                continue
            y, x, z, _ = pxls.T
            x = x.astype(np.int32) - 1
            y = y.astype(np.int32) - 1
            keep = ((z_buffer[x, y] - z) * sign >= 0)
            x, y, z = x[keep], y[keep], z[keep]
            z_buffer[x, y] = z
            frame[x, y] = color
            clip_x, clip_y = h - 1, w_res - 1
            for off in (-1, 1):
                xs = np.clip(x + off, 0, clip_x)
                ys = np.clip(y + off, 0, clip_y)
                z_buffer[xs, y] = z
                z_buffer[x, ys] = z
                frame[xs, y] = frame[xs, y] * 0.5 + color / 2
                frame[x, ys] = frame[x, ys] * 0.5 + color / 2


def draw_axis(frame, camera_m, z_buffer, sign, font_path=None):
    """World +-X/Y/Z axes with colored lines and text labels
    (reference axes.py:8-69, disabled by default there, core.py:639).

    Returns the frame (values in [0, 1], same contract as the reference which
    round-trips through a PIL image).
    """
    from PIL import Image, ImageDraw, ImageFont

    from tpu_renderer.ops.lines import bresenham_line

    mvp = np.asarray(camera_m["MVP"], np.float64)
    viewport = np.asarray(camera_m["viewport"], np.float64)

    def transformer(vert):
        vert = np.asarray(vert, np.float64) @ mvp
        vert = vert / vert[..., [3]]
        return vert @ viewport

    axes = {
        "x": (transformer([[-1, 0, 0, 1], [1, 0, 0, 1]]), (255, 0, 0),
              transformer([1.05, 0, 0, 1]), transformer([-1.2, 0, 0, 1])),
        "y": (transformer([[0, -1, 0, 1], [0, 1, 0, 1]]), (0, 255, 0),
              transformer([0, 1.05, 0, 1]), transformer([0, -1.2, 0, 1])),
        "z": (transformer([[0, 0, -1, 1], [0, 0, 1, 1]]), (0, 0, 255),
              transformer([-0.05, 0, 1.05, 1]), transformer([-0.05, 0, -1.2, 1])),
    }

    image = Image.fromarray((frame * 255).astype(np.uint8))
    draw = ImageDraw.Draw(image)
    try:
        font = ImageFont.truetype(
            font_path or "/usr/share/fonts/truetype/freefont/FreeSans.ttf", 20)
        font = ImageFont.TransposedFont(font, Image.Transpose.FLIP_TOP_BOTTOM)
    except OSError:
        font = ImageFont.load_default()

    for name, (_, col, pos_label, neg_label) in axes.items():
        draw.text((pos_label[0], pos_label[1]), f"+{name.upper()}",
                  font=font, fill=col)
        draw.text((neg_label[0], neg_label[1]), f"-{name.upper()}",
                  font=font, fill=col)

    out = np.array(image)
    for name, (segment, col, _, _) in axes.items():
        for yy, xx, zz in bresenham_line(segment[0, :3], segment[1, :3]):
            for i in range(3):
                xi = max(0, min(out.shape[0] - 4, int(xx)))
                yi = max(0, min(out.shape[1] - 4, int(yy)))
                if (z_buffer[xi + i, yi + i] - 1 / zz) * sign > 0:
                    out[xi + i, yi + i] = col
                    z_buffer[xi + i, yi + i] = zz
    return out / 255


def draw_wireframe(frame, z_buffer, screen_faces,
                   color=(64 / 255, 64 / 255, 128 / 255)):
    """Wireframe shading (reference triangular.py:269-274): DDA edges with the
    reference's raw z (pre-linearization) against the linearized z-buffer —
    a quirk kept verbatim. frame/z_buffer modified in place.

    screen_faces: (F, 3, 3) post-viewport vertex xyz per face. The reference
    writes color (64, 64, 128) into the float frame (255-scale quirk); we
    scale to [0, 1] so quantization doesn't blow out.
    """
    from tpu_renderer.ops.lines import bresenham_line

    h, w = z_buffer.shape
    color = np.asarray(color)
    for tri in screen_faces:
        for i in range(3):
            p1, p2 = tri[i], tri[(i + 1) % 3]
            for yy, xx, zz in bresenham_line(p1, p2):
                xi, yi = int(xx), int(yy)
                if 0 < xi < h - 1 and 0 < yi < w - 1 and \
                        (z_buffer[xi, yi] - zz) > 0:
                    frame[xi, yi] = color
                    z_buffer[xi, yi] = zz
    return frame


def draw_points(frame, screen_faces, camera_position, world_normals):
    """Vertex-point shading (reference triangular.py:277-283): each edge's
    endpoints in red/blue, faces backface-culled against the camera direction.
    frame modified in place; colors are [0, 1]-scaled."""
    h, w = frame.shape[:2]
    cam_dir = -np.asarray(camera_position, np.float64)
    n = np.linalg.norm(cam_dir)
    cam_dir = cam_dir / (n if n else 1.0)
    for tri, normal in zip(screen_faces, world_normals):
        if normal @ cam_dir <= 0:
            continue
        pts = tri.astype(np.int32)
        for i in range(3):
            p1, p2 = pts[i], pts[(i + 1) % 3]
            if 0 <= p1[1] < h and 0 <= p1[0] < w:
                frame[p1[1], p1[0]] = (1.0, 0, 0)
            if 0 <= p2[1] < h and 0 <= p2[0] < w:
                frame[p2[1], p2[0]] = (0, 0, 1.0)
    return frame
