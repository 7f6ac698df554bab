"""Scene-graph objects: PositionedObject, Camera, Light.

Same constructor surface as the reference (core.py:355-524) with the transform
math factored into pure, jit-traceable functions so a camera orbit can be
animated *inside* a compiled render step.

Fixed reference quirks (SURVEY.md §2): no ``cached_property`` on lookat/MVP
(core.py:415-421 — moving the reference camera after first use has no effect);
no shared mutable default Camera/Light arguments.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu_renderer.constants import PROJECTION_TYPE, SYSTEM
from tpu_renderer.ops import transforms as T
from tpu_renderer.ops.frustum import (extract_frustum_planes,
                                      extract_frustum_planes_host)
from tpu_renderer.ops.lightning import Lightning

__all__ = ["PositionedObject", "Camera", "Light", "camera_matrices"]


def camera_matrices(position, center, up, fovy, near, far, *,
                    projection_type, system, subsystem, resolution,
                    x_offset=0, y_offset=0, host=False):
    """All view/projection matrices for a camera-like object, traceably.

    Replicates the reference mixin's composition (core.py:394-429): the
    look-at *rotate* part is built with arguments (center, position)
    (core.py:406-409 — so forward = normalize(position - center)); MVP =
    translate @ rotate @ projection; aspect = width / height. ``resolution``,
    ``projection_type``, ``system`` and ``subsystem`` must be static.

    ``host=True`` composes with numpy instead of XLA (non-traceable). Under
    a ``jax.enable_x64(True)`` scope the individual builders are already
    bit-identical to the reference's f64 numpy matrices; numpy's ``@``
    makes the *composed* MVP and the frustum planes bit-identical too (XLA's
    f64 dot sums in a different order, and the debug-overlay clip decisions
    are sign-sensitive at the last ulp — the frustum-cube corners lie
    exactly ON the clip planes whenever debug camera == main camera).

    Returns dict with lookat, projection, MVP, viewport, frustum_planes.
    """
    height, width = resolution
    aspect = width / height
    rotate_fn = (T.look_at_rotate_lh if system == SYSTEM.LH
                 else T.look_at_rotate_rh)
    rot = rotate_fn(center, position, up)
    proj_fn = T.perspectives[subsystem][projection_type][system]
    projection = proj_fn(fovy, aspect, near, far)
    if host:
        rot = np.asarray(rot)
        projection = np.asarray(projection)
        lookat = np.asarray(T.looka_at_translate(position)) @ rot
        mvp = lookat @ projection
        planes = np.asarray(extract_frustum_planes_host(mvp))
    else:
        lookat = T.matmul(T.looka_at_translate(position), rot)
        mvp = T.matmul(lookat, projection)
        planes = extract_frustum_planes(mvp)
    viewport = T.ViewPort(resolution, far, near, x_offset=x_offset,
                          y_offset=y_offset)
    if host:
        viewport = np.asarray(viewport)
    return {
        "lookat": lookat,
        "projection": projection,
        "MVP": mvp,
        "viewport": viewport,
        "frustum_planes": planes,
    }


class PositionedObject:
    """Anything with a position and a look-at center (reference core.py:355-370)."""

    def __init__(self, position, center=(0, 0, 0)):
        self.scene = None
        self.position = np.asarray(position, dtype=np.float32)
        self.center = np.asarray(center, dtype=np.float32)

    @property
    def direction(self):
        return np.asarray(
            T.normalize(self.position - self.center)).ravel().astype(np.float32)

    def direction_to(self, other):
        return np.asarray(T.normalize(self.direction - np.asarray(other)))

    def set_position(self, new_position):
        self.position = np.asarray(new_position, dtype=np.float32)
        return self


class _TransformMixin:
    """View/projection properties shared by Camera and Light
    (reference TransformationMatrixMixin, core.py:373-429)."""

    def _init_transform(self, x_offset=0, y_offset=0,
                        projection_type=PROJECTION_TYPE.PERSPECTIVE,
                        up=(0, 1, 0), near=0.001, far=6, fovy=90):
        self.up = np.asarray(up, dtype=np.float32)
        self.projection_type = projection_type
        # ORTHOGRAPHIC forces near = |position| (reference core.py:387).
        # Norm in f64: the reference computes it on an f64 position; an
        # f32 norm shifts every ortho depth by ~1e-7 relative.
        self.near = (float(np.linalg.norm(
                         np.asarray(self.position, np.float64)))
                     if projection_type == PROJECTION_TYPE.ORTHOGRAPHIC
                     else near)
        self.far = far
        self.fovy = fovy
        self.x_offset = x_offset
        self.y_offset = y_offset

    def _matrices(self):
        # Host-facing (overlays, properties, tests): numpy composition.
        # The device pipeline builds its own matrices (pipeline._cam_matrices
        # -> camera_matrices(host=False)) inside jit.
        scene = self.scene
        if scene is None:
            raise RuntimeError("object is not bound to a Scene")
        return camera_matrices(
            self.position, self.center, self.up, self.fovy, self.near, self.far,
            projection_type=self.projection_type, system=scene.system,
            subsystem=scene.subsystem, resolution=scene.resolution,
            x_offset=self.x_offset, y_offset=self.y_offset, host=True)

    @property
    def projection(self):
        return np.asarray(self._matrices()["projection"])

    @property
    def rotate(self):
        fn = (T.look_at_rotate_lh if self.scene.system == SYSTEM.LH
              else T.look_at_rotate_rh)
        return np.asarray(fn(self.center, self.position, self.up))

    @property
    def translate(self):
        return np.asarray(T.looka_at_translate(self.position))

    @property
    def lookat(self):
        return np.asarray(self._matrices()["lookat"])

    @property
    def MVP(self):
        return np.asarray(self._matrices()["MVP"])

    @property
    def frustum_planes(self):
        return np.asarray(self._matrices()["frustum_planes"])

    @property
    def viewport(self):
        return np.asarray(self._matrices()["viewport"])


class Camera(PositionedObject, _TransformMixin):
    """Reference-compatible camera (core.py:432-441)."""

    def __init__(self, position, center=(0, 0, 0), show=False,
                 backface_culling=True, **kwargs):
        super().__init__(position, center)
        self._init_transform(**kwargs)
        self.show = show
        self.backface_culling = backface_culling


class Light(PositionedObject, _TransformMixin):
    """Point / directional / spot light (reference core.py:444-524).

    The transform mixin is kept "for shadow mapping" like the reference
    (core.py:445-447).
    """

    def __init__(self, position, light_type=Lightning.POINT_LIGHTNING,
                 center=(0, 0, 0), color=(1.0, 1.0, 1.0), ambient_strength=0,
                 diffuse=1, specular_strength=0.5, show=False,
                 constant=1, linear=0.14, quadratic=0.07, **kwargs):
        super().__init__(position, center)
        self.color = np.asarray(color, dtype=np.float32)
        self.light_type = light_type
        self.ambient = np.asarray(ambient_strength * self.color, np.float32)
        self.show = show
        self.diffuse = diffuse
        self.specular_strength = specular_strength
        self.constant = constant
        self.linear = linear
        self.quadratic = quadratic
        self._init_transform(**kwargs)

    @staticmethod
    def reflect(I, N):  # noqa: E741 — reference naming (core.py:493-495)
        I = jnp.asarray(I)
        N = jnp.asarray(N)
        return T.normalize(I - 2.0 * jnp.sum(N * I, axis=1)[..., None] * N)

    @staticmethod
    def smoothstep(edge0, edge1, x_array):
        """Hermite smoothstep (reference core.py:497-515), used for spot cones."""
        x = jnp.clip((jnp.asarray(x_array) - edge0) / (edge1 - edge0), 0.0, 1.0)
        return x * x * (3 - 2 * x)

    def attenuation(self, fragment_position):
        """1 / (c + d*(l + q*d)) point-light falloff (reference core.py:517-524)."""
        distance = jnp.linalg.norm(
            jnp.asarray(self.position) - jnp.asarray(fragment_position), axis=1)
        denom = self.constant + distance * (self.linear + self.quadratic * distance)
        return (1.0 / denom)[..., None]
