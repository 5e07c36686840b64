"""3D math conventions, as batched JAX array ops.

Behavioral parity target: reference ``src/vector_math.h`` / ``src/vector_math.cpp``.
The reference stores matrices column-major (``M[col][row]``) and transforms
column vectors (``v' = M * v``). Here matrices are plain ``(..., 4, 4)`` arrays
in standard row-major math notation with the *same semantics*: ``v' = M @ v``
with translation in the last column. Every constructor below reproduces the
reference formulas exactly (transposed from its column-major storage).

Key conventions replicated:

- rotations take **degrees** (vector_math.cpp:189-229)
- ``look_at`` builds a +Z-forward view matrix (vector_math.cpp:231-245)
- ``perspective`` is the Vulkan-style **reversed-Z** projection with Y negation:
  near plane maps to depth 1, far plane to depth 0 (vector_math.cpp:247-260)
- ``spherical_to_cartesian`` per vector_math.cpp:284-292

All functions accept batched inputs (leading axes broadcast) and run under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# TPU f32 matmuls default to reduced (bf16-pass) precision; geometry math
# must be true f32, so every matrix product here pins HIGHEST precision.
_HIGHEST = lax.Precision.HIGHEST

EPSILON32 = 1.19209290e-07  # vector_math.h epsilon32 (FLT_EPSILON)
PI32 = 3.14159265358979323846
TWO_PI32 = 2.0 * PI32
HALF_PI32 = 0.5 * PI32


def deg_to_rad(degrees):
    """Degrees to radians (vector_math.h degToRad)."""
    return jnp.asarray(degrees) * (PI32 / 180.0)


def rad_to_deg(radians):
    return jnp.asarray(radians) * (180.0 / PI32)


# ---------------------------------------------------------------------------
# Vectors
# ---------------------------------------------------------------------------

def dot(a, b, axis: int = -1, keepdims: bool = False):
    """Vector dot product along ``axis``."""
    return jnp.sum(jnp.asarray(a) * jnp.asarray(b), axis=axis, keepdims=keepdims)


def cross(a, b):
    """3D cross product (vector_math.cpp:64-71)."""
    return jnp.cross(jnp.asarray(a), jnp.asarray(b))


def length_sq(v, axis: int = -1, keepdims: bool = False):
    return dot(v, v, axis=axis, keepdims=keepdims)


def length(v, axis: int = -1, keepdims: bool = False):
    return jnp.sqrt(length_sq(v, axis=axis, keepdims=keepdims))


def normalize(v, axis: int = -1):
    """v / |v| — like Float3::normalize (vector_math.cpp:30-34).

    The reference divides with no epsilon guard; we match that (0-vectors
    produce inf/nan exactly like the reference would).
    """
    v = jnp.asarray(v)
    return v / length(v, axis=axis, keepdims=True)


def normalize_safe(v, axis: int = -1, eps: float = 1e-20):
    """Normalize with a tiny guard; for internal pipeline use where the
    reference's rasterizer hardware would never feed a zero vector."""
    v = jnp.asarray(v)
    return v * jnp.reciprocal(jnp.maximum(length(v, axis=axis, keepdims=True), eps))


def spherical_to_cartesian(r, theta, phi):
    """Spherical (r, theta=elevation, phi=azimuth) → cartesian.

    Matches vector_math.cpp:284-292:
      x = r cosθ cosφ, y = r sinθ, z = r cosθ sinφ
    """
    r = jnp.asarray(r)
    cos_t = jnp.cos(theta)
    return jnp.stack(
        [r * cos_t * jnp.cos(phi), r * jnp.sin(theta), r * cos_t * jnp.sin(phi)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Matrices — (..., 4, 4), v' = M @ v, translation in last column
# ---------------------------------------------------------------------------

def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def translate(delta):
    """Translation matrix (vector_math.cpp:156-165)."""
    delta = jnp.asarray(delta, dtype=jnp.float32)
    batch = delta.shape[:-1]
    m = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), batch + (4, 4))
    return m.at[..., :3, 3].set(delta)


def scale(s):
    """Scale matrix; scalar or 3-vector (vector_math.cpp:167-187)."""
    s = jnp.asarray(s, dtype=jnp.float32)
    if s.ndim == 0:
        s = jnp.stack([s, s, s])
    d = jnp.concatenate([s, jnp.ones(s.shape[:-1] + (1,), dtype=s.dtype)], axis=-1)
    return d[..., :, None] * jnp.eye(4, dtype=jnp.float32)


def _rot(c, s, axis: int):
    """Build rotation about a principal axis from cos/sin (batched scalars)."""
    c = jnp.asarray(c, dtype=jnp.float32)
    s = jnp.asarray(s, dtype=jnp.float32)
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    if axis == 0:  # X (vector_math.cpp:189-201): row-major [[1,0,0],[0,c,-s],[0,s,c]]
        rows = [[o, z, z, z], [z, c, -s, z], [z, s, c, z], [z, z, z, o]]
    elif axis == 1:  # Y (vector_math.cpp:203-215): [[c,0,-s],[0,1,0],[s,0,c]]
        rows = [[c, z, -s, z], [z, o, z, z], [s, z, c, z], [z, z, z, o]]
    else:  # Z (vector_math.cpp:217-229): [[c,-s,0],[s,c,0],[0,0,1]]
        rows = [[c, -s, z, z], [s, c, z, z], [z, z, o, z], [z, z, z, o]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def rotate_x(degrees):
    r = deg_to_rad(degrees)
    return _rot(jnp.cos(r), jnp.sin(r), 0)


def rotate_y(degrees):
    r = deg_to_rad(degrees)
    return _rot(jnp.cos(r), jnp.sin(r), 1)


def rotate_z(degrees):
    r = deg_to_rad(degrees)
    return _rot(jnp.cos(r), jnp.sin(r), 2)


def look_at(eye, target, up_axis=(0.0, 1.0, 0.0)):
    """View matrix (vector_math.cpp:231-245).

    forward = normalize(target - eye); right = normalize(up × forward);
    up = forward × right. View space looks down **+Z**.
    """
    eye = jnp.asarray(eye, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    up_axis = jnp.asarray(up_axis, dtype=jnp.float32)
    fwd = normalize(target - eye)
    right = normalize(cross(up_axis, fwd))
    up = normalize(cross(fwd, right))
    rows = jnp.stack([right, up, fwd], axis=-2)  # (...,3,3): world→view rotation
    trans = -jnp.einsum("...ij,...j->...i", rows, eye)
    m = jnp.concatenate([rows, trans[..., :, None]], axis=-1)  # (...,3,4)
    last = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], dtype=jnp.float32), m.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([m, last], axis=-2)


def perspective(fov_degrees, aspect, near, far):
    """Vulkan-style reversed-Z perspective (vector_math.cpp:247-260).

    d = 1/tan(fov/2). Row-major:
      [[d/aspect, 0,  0,            0          ],
       [0,        -d, 0,            0          ],
       [0,        0,  -n/(f-n),     n*f/(f-n)  ],
       [0,        0,  1,            0          ]]

    After the w-divide, z_ndc = (n*f/(f-n) - n*z_view/(f-n)) / z_view:
    z_view = n → 1, z_view = f → 0. The negated [1][1] flips Y for the
    Vulkan y-down framebuffer; we keep it so image row 0 is the top.
    """
    d = 1.0 / jnp.tan(deg_to_rad(fov_degrees) * 0.5)
    f_sub_n = far - near
    d = jnp.asarray(d, dtype=jnp.float32)
    z = jnp.zeros_like(d)
    o = jnp.ones_like(d)
    rows = [
        [d / aspect, z, z, z],
        [z, -d, z, z],
        [z, z, (-near / f_sub_n) * o, (near * far / f_sub_n) * o],
        [z, z, o, z],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def orthographic(left, right, bottom, top, near, far):
    """Reversed-Z orthographic projection with the same conventions as
    :func:`perspective` (Y negated for the y-down framebuffer, z_ndc = 1 at
    ``near`` and 0 at ``far``, w = 1). Used by the shadow pass for
    directional lights — an additive capability over the reference."""
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    bottom = jnp.asarray(bottom, jnp.float32)
    top = jnp.asarray(top, jnp.float32)
    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    z = jnp.zeros_like(left)
    o = jnp.ones_like(left)
    sx = 2.0 / (right - left)
    sy = 2.0 / (top - bottom)
    rows = [
        [sx, z, z, -(right + left) / (right - left)],
        [z, -sy, z, (top + bottom) / (top - bottom)],
        [z, z, -o / (far - near), far / (far - near)],
        [z, z, z, o],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def matmul(a, b):
    """Matrix product (vector_math.cpp:262-272) at full f32 precision."""
    return jnp.matmul(jnp.asarray(a), jnp.asarray(b), precision=_HIGHEST)


def inverse(m):
    """Analytic 4×4 inverse by cofactor expansion — the same algorithm as the
    reference (Mat4::inverse, vector_math.cpp:115-134). Batched over leading
    axes; pure elementwise ops, so no MXU precision loss and it vectorizes
    over per-instance model matrices.
    """
    m = jnp.asarray(m)

    def minor_det(r: int, c: int):
        rows = [i for i in range(4) if i != r]
        cols = [j for j in range(4) if j != c]
        a = m[..., rows[0], cols[0]]
        b = m[..., rows[0], cols[1]]
        cc = m[..., rows[0], cols[2]]
        d = m[..., rows[1], cols[0]]
        e = m[..., rows[1], cols[1]]
        f = m[..., rows[1], cols[2]]
        g = m[..., rows[2], cols[0]]
        h = m[..., rows[2], cols[1]]
        i = m[..., rows[2], cols[2]]
        return a * (e * i - f * h) - b * (d * i - f * g) + cc * (d * h - e * g)

    cof = jnp.stack(
        [
            jnp.stack(
                [((-1.0) ** (r + c)) * minor_det(r, c) for c in range(4)], axis=-1
            )
            for r in range(4)
        ],
        axis=-2,
    )
    det = jnp.sum(m[..., 0, :] * cof[..., 0, :], axis=-1)
    adjugate = jnp.swapaxes(cof, -1, -2)
    return adjugate / det[..., None, None]


def transpose(m):
    return jnp.swapaxes(jnp.asarray(m), -1, -2)


def transform_points(m, pts):
    """Apply (...,4,4) matrix to (...,N,3) points (w=1). Returns (...,N,4).

    Implemented as a single matmul so batches of vertices ride the MXU.
    """
    pts = jnp.asarray(pts)
    m = jnp.asarray(m)
    ones = jnp.ones(pts.shape[:-1] + (1,), dtype=pts.dtype)
    p4 = jnp.concatenate([pts, ones], axis=-1)
    return jnp.matmul(p4, transpose(m), precision=_HIGHEST)


def transform_dirs(m, dirs):
    """Apply the upper-left 3×3 of (...,4,4) (or a (...,3,3)) to directions."""
    m = jnp.asarray(m)
    if m.shape[-1] == 4:
        m = m[..., :3, :3]
    return jnp.matmul(jnp.asarray(dirs), transpose(m), precision=_HIGHEST)


def normal_matrix(inv_model):
    """Normal matrix = transpose(mat3(InvModel)) — gbuffer.vert:24."""
    return transpose(jnp.asarray(inv_model)[..., :3, :3])


def compose(*ms):
    """Left-to-right application order matching reference chains like
    ``translate(t) * rotateY(a) * rotateX(b) * scale(s)`` (scene.cpp:180-184)."""
    out = jnp.asarray(ms[0])
    for m in ms[1:]:
        out = jnp.matmul(out, jnp.asarray(m), precision=_HIGHEST)
    return out
