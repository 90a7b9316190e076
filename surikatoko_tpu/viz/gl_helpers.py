"""SE3 <-> OpenGL-style 4x4 matrices and axes conversions.

Equivalent of reference opengl-helpers.{h,cpp}: column-major 4x4 from an
SE3, and the Hartley-Zisserman (x-right, y-down, z-forward) <-> OpenGL
(x-right, y-up, z-backward) axes flip.
"""

from __future__ import annotations

import numpy as np

from surikatoko_tpu.geom.se3 import SE3

# diag(1,-1,-1): flips y and z between HZ camera axes and OpenGL eye axes
HZ_FROM_GL = np.diag([1.0, -1.0, -1.0])


def se3_to_gl_mat44(t: SE3) -> np.ndarray:
    """Column-major flat [16] OpenGL modelview from an SE3 (reference
    SE3TransformToOpenGL)."""
    m = np.eye(4)
    m[:3, :3] = np.asarray(t.R)
    m[:3, 3] = np.asarray(t.t)
    return m.T.reshape(-1)  # OpenGL is column-major


def gl_from_hz_camera(cfw: SE3) -> np.ndarray:
    """OpenGL eye matrix for a Hartley-Zisserman camera-from-world pose."""
    R = HZ_FROM_GL @ np.asarray(cfw.R)
    t = HZ_FROM_GL @ np.asarray(cfw.t)
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = t
    return m.T.reshape(-1)
