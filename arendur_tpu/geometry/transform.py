"""4x4 transforms in the reference's cgmath layout.

The reference serializes cgmath ``Matrix4f`` as four length-4 arrays,
one per *column* (ref: examples/cornellbox/cb.json "transform"
entries).  We store exactly that JSON layout as a [4, 4] array, which
makes application a *row-vector* product:

    p' = [px, py, pz, 1] @ M,  followed by a homogeneous divide.

(cgmath's ``transform_point`` is ``Point3::from_homogeneous(M * p_h)``
which performs the divide; the Cornell-box mesh transform genuinely has
a projective term, so the divide is load-bearing for parity.)

Composition: ``compose(a, b) == a @ b`` applies ``a`` first, then ``b``.
Normals transform through the inverse transpose
(ref: src/geometry/transform.rs:53-58).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Small geometry matmuls must stay exact f32 on TPU (the MXU's default
# precision is bf16-ish, which visibly distorts ray origins).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def identity4(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def matmul4(first, then):
    """Compose two transforms: apply `first`, then `then`."""
    return _mm(first, then)


def transform_point(m, p):
    """Apply m to points p [..., 3], with homogeneous divide.

    m may be a single [4,4] or batched [..., 4, 4] against p [..., 3].
    Implemented as broadcast multiply+sum (not matmul): a contraction
    of length 3 never tiles onto the MXU, and the 6-pass HIGHEST f32
    emulation makes tiny batched matmuls ~10x slower than the exact
    same arithmetic on the VPU."""
    out = (p[..., :, None] * m[..., :3, :3]).sum(-2) + m[..., 3, :3]
    w = (p * m[..., :3, 3]).sum(-1) + m[..., 3, 3]
    return out / w[..., None]


def transform_point_row16(m, p):
    """Row-vector point transform by per-lane [N,16] flattened
    matrices (cgmath row-layout), homogeneous divide included.
    Column math instead of [N,4,4] vmaps: shared with the Pallas
    kernels, where 3-D arrays don't lower."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    ox = x * m[:, 0] + y * m[:, 4] + z * m[:, 8] + m[:, 12]
    oy = x * m[:, 1] + y * m[:, 5] + z * m[:, 9] + m[:, 13]
    oz = x * m[:, 2] + y * m[:, 6] + z * m[:, 10] + m[:, 14]
    w = x * m[:, 3] + y * m[:, 7] + z * m[:, 11] + m[:, 15]
    inv = 1.0 / jnp.where(jnp.abs(w) < 1e-20, 1.0, w)
    return jnp.stack([ox * inv, oy * inv, oz * inv], -1)


def transform_vector_row16(m, v):
    """Direction transform (no translation, no divide) by per-lane
    [N,16] flattened matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([
        x * m[:, 0] + y * m[:, 4] + z * m[:, 8],
        x * m[:, 1] + y * m[:, 5] + z * m[:, 9],
        x * m[:, 2] + y * m[:, 6] + z * m[:, 10]], -1)


def transform_vector(m, v):
    """Apply m to direction vectors (no translation, no divide);
    m may be batched (see transform_point)."""
    return (v[..., :, None] * m[..., :3, :3]).sum(-2)


def transform_norm(m, n):
    """Apply m to normals via the inverse-transpose of the 3x3 block."""
    inv = jnp.linalg.inv(m[..., :3, :3])
    return (n[..., :, None] * jnp.swapaxes(inv, -1, -2)).sum(-2)


def inverse4(m):
    return jnp.linalg.inv(m)


def translate(v, dtype=jnp.float32):
    m = jnp.eye(4, dtype=dtype)
    return m.at[3, :3].set(jnp.asarray(v, dtype))


def scale_mat(sx, sy, sz, dtype=jnp.float32):
    return jnp.diag(jnp.asarray([sx, sy, sz, 1.0], dtype))


def perspective_matrix(fov, znear, zfar, dtype=jnp.float32):
    """Perspective view->screen matrix (ref: perspective.rs:93-107).

    Row-layout storage of cgmath columns; composition is
    persp @ scale(inv_tan, inv_tan, 1).
    """
    f = float(zfar)
    n = float(znear)
    persp = np.array(
        [[1.0, 0.0, 0.0, 0.0],
         [0.0, 1.0, 0.0, 0.0],
         [0.0, 0.0, f / (f - n), 1.0],
         [0.0, 0.0, -f * n / (f - n), 0.0]], dtype=np.float32)
    inv_tan = 1.0 / np.tan(0.5 * float(fov))
    scale = np.diag(np.array([inv_tan, inv_tan, 1.0, 1.0], dtype=np.float32))
    # host-side NumPy: camera construction must not touch the device
    return (persp @ scale).astype(np.float32)


def look_at(eye, to, up):
    """World->view matrix (ref: perspective.rs:109-121 look_from)."""
    eye = np.asarray(eye, np.float32)
    to = np.asarray(to, np.float32)
    up = np.asarray(up, np.float32)
    fwd = to - eye
    fwd = fwd / np.linalg.norm(fwd)
    s = np.cross(up, fwd)
    s = s / np.linalg.norm(s)
    u = np.cross(fwd, s)
    m = np.array(
        [[s[0], u[0], fwd[0], 0.0],
         [s[1], u[1], fwd[1], 0.0],
         [s[2], u[2], fwd[2], 0.0],
         [-eye @ s, -eye @ u, -eye @ fwd, 1.0]], dtype=np.float32)
    # row i of the array above is already cgmath column i, i.e. our storage layout
    return m
