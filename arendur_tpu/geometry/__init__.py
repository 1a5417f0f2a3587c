"""Math/geometry core (ref: src/geometry/).

Vectors are plain jnp arrays with a trailing axis of size 3 (SoA over
leading axes); 4x4 transforms are [..., 4, 4] row-vector matrices
matching cgmath's convention used by the reference (point * M, with
translation in the last row).
"""

from arendur_tpu.geometry import vec, transform, frame

from arendur_tpu.geometry.vec import (
    dot, cross, normalize, length, length2, distance, distance2, lerp,
    vec3, to_f32,
)
from arendur_tpu.geometry.transform import (
    transform_point, transform_vector, transform_norm, matmul4,
    translate, scale_mat, identity4, inverse4, perspective_matrix,
    look_at,
)
