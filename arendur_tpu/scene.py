"""Scene: unified SoA geometry pools + materials + lights
(ref: src/renderer/scene.rs, src/component/).

The reference's scene is a trait-object graph (BVH of Composables).
The TPU scene is two flat device pools — triangles (world-space SoA)
and analytic spheres (local frame + baked transforms) — plus material
and light tables.  Primitive ids: [0, T) triangles, [T, T+S) spheres.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from arendur_tpu.geometry.vec import cross, dot, normalize
from arendur_tpu.shapes import triangle as tri
from arendur_tpu.shapes import sphere as sph
from arendur_tpu.materials import MaterialTable, make_material_table
from arendur_tpu.sampling.distribution import (
    Distribution1D, build_distribution_1d)
from arendur_tpu.accel import bvh as bvhmod
from arendur_tpu.shapes import mxu_intersect as mxi

import os

# light types
L_AREA_SPHERE = 0
L_AREA_TRI = 1
L_POINT = 2
L_SPOT = 3
L_DISTANT = 4


@struct.dataclass
class LightTable:
    ltype: jnp.ndarray     # [L] int32
    prim: jnp.ndarray      # [L] int32: sphere idx / tri idx for area
    emission: jnp.ndarray  # [L,3] radiance (area) / intensity (point)
    pos: jnp.ndarray       # [L,3] position (point/spot) or direction (distant)
    aux: jnp.ndarray       # [L,3] spot axis
    params: jnp.ndarray    # [L,4] cos_total/cos_falloff (spot), wradius
    # [L] atlas texture id of the area-light emission profile (-1 =
    # constant).  The reference evaluates the profile texture at the
    # hit/sample point (component/shape.rs:91-130,
    # shape/triangle.rs:541-626); `emission` holds the constant factor.
    emission_tex: jnp.ndarray = None
    # host-static set of light types present (set at build()): inside
    # a jit trace the array leaves are tracers, so the per-type pruning
    # cannot be re-derived from them
    types_present: tuple = struct.field(pytree_node=False, default=None)

    @property
    def count(self):
        return self.ltype.shape[0]


def light_types_present(lights: LightTable):
    """Host-static set of light types in the scene (None if unknown).
    Lets NEE emit only the per-type branches that can actually occur —
    masked SIMD work is only free if never emitted.  Prefers the
    static field baked at build(); falls back to reading the array
    (works on NumPy leaves, not on tracers)."""
    if getattr(lights, "types_present", None) is not None:
        return lights.types_present
    try:
        return tuple(sorted(int(t) for t in
                            np.unique(np.asarray(lights.ltype))))
    except Exception:
        return None


def light_pack(scene):
    """One packed [L, C] row per light + static column index map.

    Every per-light attribute NEE needs — including the area light's
    resolved geometry (its triangle's vertices / its sphere's baked
    transforms) — lives in one row, so sampling a light is ONE
    wavefront gather instead of ~20 (each gather is a full HBM round
    trip on TPU).  The prim -> geometry resolution gathers run over
    [L] rows of host-constant tables, so XLA constant-folds them at
    compile time.  Blocks for light types absent from the scene are
    omitted (static pruning via light_types_present).

    Returns (pack [L, C], idx: name -> (lo, hi), present)."""
    lights = scene.lights
    present = light_types_present(lights)
    L = lights.ltype.shape[0]
    cols, idx = [], {}
    ofs = 0

    def add(name, arr, width=None):
        nonlocal ofs
        arr = jnp.asarray(arr)
        arr = arr.astype(jnp.float32)
        if arr.ndim == 1:
            arr = arr[:, None]
        arr = arr.reshape(L, -1)
        idx[name] = (ofs, ofs + arr.shape[1])
        cols.append(arr)
        ofs += arr.shape[1]

    has = lambda t: present is None or t in present
    add("ltype", lights.ltype)
    add("emission", lights.emission)
    add("pos", lights.pos)
    add("aux", lights.aux)
    add("params", lights.params)
    if lights.emission_tex is not None:
        add("emission_tex", lights.emission_tex)
    prim = jnp.maximum(jnp.asarray(lights.prim), 0)
    if (has(L_AREA_TRI) and scene.n_tris > 0):
        tp = jnp.minimum(prim, scene.n_tris - 1)
        add("tri_v0", jnp.asarray(scene.tri_v0)[tp])
        add("tri_v1", jnp.asarray(scene.tri_v1)[tp])
        add("tri_v2", jnp.asarray(scene.tri_v2)[tp])
        add("tri_n0", jnp.asarray(scene.tri_n0)[tp])
        add("tri_n1", jnp.asarray(scene.tri_n1)[tp])
        add("tri_n2", jnp.asarray(scene.tri_n2)[tp])
        add("tri_uv0", jnp.asarray(scene.tri_uv0)[tp])
        add("tri_uv1", jnp.asarray(scene.tri_uv1)[tp])
        add("tri_uv2", jnp.asarray(scene.tri_uv2)[tp])
    if has(L_AREA_SPHERE):
        sp = jnp.minimum(prim, scene.spheres.count - 1)
        add("s_o2w", jnp.asarray(scene.spheres.o2w)[sp].reshape(L, 16))
        add("s_w2o", jnp.asarray(scene.spheres.w2o)[sp].reshape(L, 16))
        add("s_radius", jnp.asarray(scene.spheres.radius)[sp])
        add("s_zmin", jnp.asarray(scene.spheres.zmin)[sp])
        add("s_zmax", jnp.asarray(scene.spheres.zmax)[sp])
        add("s_thetamin", jnp.asarray(scene.spheres.thetamin)[sp])
        add("s_thetamax", jnp.asarray(scene.spheres.thetamax)[sp])
        add("s_phimax", jnp.asarray(scene.spheres.phimax)[sp])
    return jnp.concatenate(cols, axis=1), idx, present


def emission_tex_factor(lights: LightTable, lidx, uv, textures=None):
    """Emission-profile texture factor at uv [N,2] (white when the
    light has no profile texture).  Ref: the per-hit texture lookup in
    component/shape.rs:115-129, shape/triangle.rs:541-626."""
    li = jnp.maximum(lidx, 0)
    if textures is None or lights.emission_tex is None:
        return jnp.ones(uv.shape[:-1] + (3,), jnp.float32)
    from arendur_tpu.texturing.texture import eval_rgb
    tex_id = lights.emission_tex[li]
    return eval_rgb(textures, tex_id, uv,
                    jnp.ones(uv.shape[:-1] + (3,), jnp.float32))


def light_emission(lights: LightTable, lidx, uv, textures=None):
    """Emitted radiance of light lidx [N] at surface uv [N,2]:
    constant part x emission-profile texture.  One packed gather."""
    li = jnp.maximum(lidx, 0)
    if textures is None or lights.emission_tex is None:
        return jnp.asarray(lights.emission)[li]
    pk = jnp.concatenate(
        [jnp.asarray(lights.emission),
         jnp.asarray(lights.emission_tex).astype(jnp.float32)[:, None]],
        axis=1)
    row = pk[li]
    em = row[:, 0:3]
    from arendur_tpu.texturing.texture import eval_rgb
    return em * eval_rgb(textures, row[:, 3].astype(jnp.int32), uv,
                         jnp.ones_like(em))


@struct.dataclass
class InstancedMesh:
    """One mesh kept in LOCAL space, placed I times by per-instance
    transforms (ref: component/transformed.rs:20 TransformedComposable
    — object-to-world instancing; geometry memory does not scale with
    the instance count).  Rays are transformed into mesh space per
    instance (t is preserved: the direction is transformed by the
    linear part, unnormalized), tested against the SHARED cluster
    tables, and the winning hit's shading frame is transformed back
    (normals via inverse-transpose, transformed.rs:54-62)."""
    cw: jnp.ndarray       # [C,16,4K] cluster determinant weights (local)
    cbox: jnp.ndarray     # [C,8] cluster AABBs (local)
    remap: jnp.ndarray    # [C*K] slot -> local tri id
    attr: jnp.ndarray     # [T,26] packed v/n/uv/mat/light rows (local)
    o2w: jnp.ndarray      # [I,4,4] row-vector convention
    w2o: jnp.ndarray      # [I,4,4]
    nrm: jnp.ndarray      # [I,3,3] inverse-transpose linear part

    @property
    def n_instances(self):
        return self.o2w.shape[0]


@struct.dataclass
class SceneData:
    tri_v0: jnp.ndarray
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_n0: jnp.ndarray
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_uv0: jnp.ndarray
    tri_uv1: jnp.ndarray
    tri_uv2: jnp.ndarray
    tri_mat: jnp.ndarray
    tri_light: jnp.ndarray
    spheres: sph.SphereSoA
    materials: MaterialTable
    lights: LightTable
    bvh: Optional[bvhmod.BVH] = None
    # cluster-culled MXU intersector tables (accel/clusters.py):
    # tri_cw [C,16,4K] per-cluster determinant weights, tri_cbox [C,8]
    # cluster AABBs, tri_remap [C*K] slot -> original triangle id
    tri_cw: Optional[jnp.ndarray] = None
    tri_cbox: Optional[jnp.ndarray] = None
    tri_remap: Optional[jnp.ndarray] = None
    # instanced meshes (shared local-space geometry, per-instance
    # transforms; ref: component/transformed.rs:20)
    inst: tuple = ()
    light_distribution: Distribution1D = None

    @property
    def n_tris(self):
        return self.tri_v0.shape[0]


@struct.dataclass
class Hit:
    """Wavefront surface-interaction record (SoA SurfaceInteraction,
    ref: geometry/interaction.rs)."""
    hit: jnp.ndarray       # [N] bool
    t: jnp.ndarray         # [N]
    prim: jnp.ndarray      # [N] int32, -1 = miss
    pos: jnp.ndarray       # [N,3]
    pos_err: jnp.ndarray   # [N,3]
    ng: jnp.ndarray        # [N,3] geometric normal
    ns: jnp.ndarray        # [N,3] shading normal
    dpdu: jnp.ndarray      # [N,3]
    dpdv: jnp.ndarray      # [N,3]
    uv: jnp.ndarray        # [N,2]
    mat_id: jnp.ndarray    # [N] int32
    light_id: jnp.ndarray  # [N] int32 (-1 if not emissive)


class SceneBuilder:
    """Host-side accumulation of geometry + materials + lights,
    frozen into a SceneData pytree (the arencli parse_input analogue)."""

    def __init__(self):
        self.tv0: List[np.ndarray] = []
        self.tv1: List[np.ndarray] = []
        self.tv2: List[np.ndarray] = []
        self.tn0: List[np.ndarray] = []
        self.tn1: List[np.ndarray] = []
        self.tn2: List[np.ndarray] = []
        self.tuv0: List[np.ndarray] = []
        self.tuv1: List[np.ndarray] = []
        self.tuv2: List[np.ndarray] = []
        self.tmat: List[np.ndarray] = []
        self.tlight: List[np.ndarray] = []
        self.sphere_rows = []
        self.material_rows = []
        self.light_rows = []
        self.instanced = []   # add_instanced_mesh records
        from arendur_tpu.texturing.texture import AtlasBuilder
        self.atlas = AtlasBuilder()   # image textures (obj/JSON maps)
        self.tex_cache = {}           # (path, gamma) -> texture id

    def build_textures(self):
        """Freeze the image-texture atlas (None if no textures)."""
        return self.atlas.build()

    def add_material(self, **kw) -> int:
        self.material_rows.append(kw)
        return len(self.material_rows) - 1

    def add_mesh(self, vertices, faces, mat_id: int, normals=None,
                 uvs=None, transform=None, emission=None,
                 emission_tex: int = -1, emission_tex_mean=1.0):
        """Add a triangle mesh.  vertices [V,3], faces [F,3] int.
        transform: optional 4x4 (row-layout, projective divide applied
        like the reference's from_model_transformed)."""
        v = np.asarray(vertices, np.float32)
        f = np.asarray(faces, np.int64)
        if transform is not None:
            m = np.asarray(transform, np.float32)
            h = v @ m[:3, :3] + m[3, :3]
            w = v @ m[:3, 3] + m[3, 3]
            v = h / w[:, None]
            if normals is not None:
                inv = np.linalg.inv(m[:3, :3])
                normals = np.asarray(normals, np.float32) @ inv.T
        p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        nf = len(f)
        if normals is not None:
            nn = np.asarray(normals, np.float32)
            n0, n1, n2 = nn[f[:, 0]], nn[f[:, 1]], nn[f[:, 2]]
        else:
            face_n = np.cross(p1 - p0, p2 - p0)
            norm = np.linalg.norm(face_n, axis=-1, keepdims=True)
            face_n = face_n / np.maximum(norm, 1e-20)
            n0 = n1 = n2 = face_n
        if uvs is not None:
            uu = np.asarray(uvs, np.float32)
            uv0, uv1, uv2 = uu[f[:, 0]], uu[f[:, 1]], uu[f[:, 2]]
        else:
            # per-triangle default uvs (ref: triangle.rs:292-296)
            uv0 = np.tile(np.array([0.0, 0.0], np.float32), (nf, 1))
            uv1 = np.tile(np.array([1.0, 0.0], np.float32), (nf, 1))
            uv2 = np.tile(np.array([1.0, 1.0], np.float32), (nf, 1))
        light_ids = np.full(nf, -1, np.int32)
        if emission is not None:
            base_tri = sum(len(a) for a in self.tv0)
            for i in range(nf):
                light_ids[i] = len(self.light_rows)
                self.light_rows.append(dict(
                    ltype=L_AREA_TRI, prim=base_tri + i,
                    emission=tuple(emission),
                    emission_tex=emission_tex,
                    tex_mean=emission_tex_mean))
        self.tv0.append(p0)
        self.tv1.append(p1)
        self.tv2.append(p2)
        self.tn0.append(n0)
        self.tn1.append(n1)
        self.tn2.append(n2)
        self.tuv0.append(uv0)
        self.tuv1.append(uv1)
        self.tuv2.append(uv2)
        self.tmat.append(np.full(nf, mat_id, np.int32))
        self.tlight.append(light_ids)

    def add_instanced_mesh(self, groups, transforms):
        """Add a mesh placed by MULTIPLE instance transforms sharing
        one copy of the geometry (ref: component/transformed.rs:20).

        groups: list of dicts with keys vertices [V,3], faces [F,3],
        mat_id, optional normals/uvs — the (object, material) groups of
        one source mesh (e.g. one .obj file), kept in LOCAL space.
        transforms: [I,4,4] per-instance object-to-world matrices
        (row-vector convention).  Emissive instanced groups are not
        supported (area lights bake world-space geometry)."""
        v0s, v1s, v2s, n0s, n1s, n2s = [], [], [], [], [], []
        uv0s, uv1s, uv2s, mats_ = [], [], [], []
        for g in groups:
            v = np.asarray(g["vertices"], np.float32)
            f = np.asarray(g["faces"], np.int64)
            p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
            nf = len(f)
            normals = g.get("normals")
            if normals is not None and len(normals):
                nn = np.asarray(normals, np.float32)
                n0, n1, n2 = nn[f[:, 0]], nn[f[:, 1]], nn[f[:, 2]]
            else:
                fn = np.cross(p1 - p0, p2 - p0)
                fn = fn / np.maximum(
                    np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
                n0 = n1 = n2 = fn
            uvs = g.get("uvs")
            if uvs is not None and len(uvs):
                uu = np.asarray(uvs, np.float32)
                uv0, uv1, uv2 = uu[f[:, 0]], uu[f[:, 1]], uu[f[:, 2]]
            else:
                uv0 = np.tile(np.array([0., 0.], np.float32), (nf, 1))
                uv1 = np.tile(np.array([1., 0.], np.float32), (nf, 1))
                uv2 = np.tile(np.array([1., 1.], np.float32), (nf, 1))
            v0s.append(p0); v1s.append(p1); v2s.append(p2)
            n0s.append(n0); n1s.append(n1); n2s.append(n2)
            uv0s.append(uv0); uv1s.append(uv1); uv2s.append(uv2)
            mats_.append(np.full(nf, g["mat_id"], np.float32))
        cat = lambda L: np.concatenate(L, 0)
        attr = np.concatenate([
            cat(v0s), cat(v1s), cat(v2s), cat(n0s), cat(n1s), cat(n2s),
            cat(uv0s), cat(uv1s), cat(uv2s), cat(mats_)[:, None],
            np.full((sum(len(m) for m in mats_), 1), -1.0, np.float32),
        ], axis=1)
        ts = np.stack([np.asarray(t, np.float32) for t in transforms])
        self.instanced.append(dict(attr=attr, transforms=ts))

    def add_sphere(self, radius, zmin, zmax, phimax, mat_id: int,
                   transform=None, emission=None,
                   emission_tex: int = -1, emission_tex_mean=1.0):
        o2w = (np.eye(4, dtype=np.float32) if transform is None
               else np.asarray(transform, np.float32))
        light_id = -1
        if emission is not None:
            light_id = len(self.light_rows)
            self.light_rows.append(dict(
                ltype=L_AREA_SPHERE, prim=len(self.sphere_rows),
                emission=tuple(emission),
                emission_tex=emission_tex,
                tex_mean=emission_tex_mean))
        self.sphere_rows.append(dict(
            o2w=o2w, radius=radius, zmin=zmin, zmax=zmax, phimax=phimax,
            mat_id=mat_id, light_id=light_id))

    def add_point_light(self, pos, intensity):
        self.light_rows.append(dict(
            ltype=L_POINT, prim=-1, emission=tuple(intensity),
            pos=tuple(pos)))

    def add_spot_light(self, pos, direction, intensity, cos_total,
                       cos_falloff):
        self.light_rows.append(dict(
            ltype=L_SPOT, prim=-1, emission=tuple(intensity),
            pos=tuple(pos), aux=tuple(direction),
            params=(cos_total, cos_falloff, 0.0, 0.0)))

    def add_distant_light(self, direction, radiance, world_radius=None):
        """world_radius=None (default) resolves to the scene's bounding
        sphere at build() time (ref: distantlight.rs:43-50
        set_world_bounds from components.bbox_parent().bsphere());
        passing a number pins it explicitly."""
        self.light_rows.append(dict(
            ltype=L_DISTANT, prim=-1, emission=tuple(radiance),
            pos=tuple(direction),
            params=(-1.0 if world_radius is None else float(world_radius),
                    0.0, 0.0, 0.0)))

    def _world_bsphere(self):
        """Scene bounding sphere over every world-space primitive
        (the bbox_parent().bsphere() preprocess of
        distantlight.rs:43-50): triangles, transformed spheres, and
        instanced meshes (local bbox corners through each transform)."""
        pts = []
        for lst in (self.tv0, self.tv1, self.tv2):
            for a in lst:
                if len(a):
                    pts.append(np.min(a, 0))
                    pts.append(np.max(a, 0))
        for row in self.sphere_rows:
            m = np.asarray(row["o2w"], np.float32)
            c = m[3, :3]
            r = float(row["radius"]) * float(
                np.linalg.norm(m[:3, :3], 2))
            pts.append(c - r)
            pts.append(c + r)
        for rec in self.instanced:
            a = rec["attr"]
            v = np.concatenate([a[:, 0:3], a[:, 3:6], a[:, 6:9]], 0)
            lo, hi = v.min(0), v.max(0)
            corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                                for y in (lo[1], hi[1])
                                for z in (lo[2], hi[2])], np.float32)
            for t in rec["transforms"]:
                m = np.asarray(t, np.float32)
                w = corners @ m[:3, :3] + m[3, :3]
                pts.append(w.min(0))
                pts.append(w.max(0))
        if not pts:
            return np.zeros(3, np.float32), 1.0
        lo = np.min(np.stack(pts), 0)
        hi = np.max(np.stack(pts), 0)
        center = 0.5 * (lo + hi)
        radius = float(np.linalg.norm(hi - center))
        return center.astype(np.float32), max(radius, 1e-6)

    # -- freeze -----------------------------------------------------------

    def _light_power(self, row, tri_areas, sphere_areas) -> float:
        """Power for the light-selection distribution
        (ref: scene.rs:36-44; area power = mean*area*pi,
        component/shape.rs:160-167)."""
        # pure-NumPy luminance: scene parse must not touch the device
        e = np.asarray(row["emission"], np.float32) \
            * float(row.get("tex_mean", 1.0))
        lum = float(e @ np.asarray([0.212671, 0.715160, 0.072169],
                                   np.float32))
        lt = row["ltype"]
        if lt == L_AREA_SPHERE:
            return lum * sphere_areas[row["prim"]] * np.pi
        if lt == L_AREA_TRI:
            return lum * tri_areas[row["prim"]] * np.pi
        if lt == L_POINT:
            return lum * 4.0 * np.pi
        if lt == L_SPOT:
            ct, cf = row["params"][0], row["params"][1]
            # ref: pointlights.rs SpotLight::power
            return lum * 2.0 * np.pi * (1 - 0.5 * (cf - ct))
        if lt == L_DISTANT:
            wr = row["params"][0]
            return lum * np.pi * wr * wr
        return lum

    def build(self, use_bvh: bool = False,
              intersector: str = "cluster") -> SceneData:
        """intersector selects the production triangle-intersection
        structure (the honest ``--intersector`` CLI switch):

        * "cluster" (default): SAH-cluster-culled MXU tables
          (accel/clusters.py; Pallas kernel on TPU, plain-XLA matmul
          on CPU);
        * "bvh": per-ray stack BVH traversal (accel/bvh.py);
        * "naive": brute-force watertight wavefront (shapes/triangle).

        use_bvh=True additionally builds the BVH object (test oracle)
        without making it the production path.
        """
        if intersector == "mxu":          # legacy alias
            intersector = "cluster"
        cat = lambda lst, d: (np.concatenate(lst, 0) if lst
                              else np.zeros((0,) + d, np.float32))
        v0 = cat(self.tv0, (3,))
        v1 = cat(self.tv1, (3,))
        v2 = cat(self.tv2, (3,))
        tri_areas = 0.5 * np.linalg.norm(
            np.cross(v1 - v0, v2 - v0), axis=-1) if len(v0) else np.zeros(0)

        # resolve distant-light world bounds from the scene's bounding
        # sphere BEFORE the degenerate placeholder sphere is appended
        # (ref: distantlight.rs:43-50 set_world_bounds via
        # bbox_parent().bsphere()).  aux carries world_center.
        if any(r["ltype"] == L_DISTANT for r in self.light_rows):
            wc, wrad = self._world_bsphere()
            resolved = []
            for row in self.light_rows:
                if row["ltype"] == L_DISTANT:
                    row = dict(row)
                    p = row.get("params", (-1.0, 0, 0, 0))
                    wr = p[0] if p[0] > 0.0 else wrad
                    row["params"] = (wr, 0.0, 0.0, 0.0)
                    row["aux"] = tuple(float(x) for x in wc)
                resolved.append(row)
            self.light_rows = resolved

        # spheres
        ns = len(self.sphere_rows)
        if ns == 0:
            # one degenerate far-away sphere keeps shapes static
            self.sphere_rows.append(dict(
                o2w=np.diag([1, 1, 1, 1]).astype(np.float32) +
                np.array([[0, 0, 0, 0]] * 3 + [[1e8, 1e8, 1e8, 0]],
                         np.float32),
                radius=1e-6, zmin=-1e-6, zmax=1e-6, phimax=2 * np.pi,
                mat_id=0, light_id=-1))
        so2w, sw2o, srad, szmin, szmax, stmin, stmax, sphim = \
            [], [], [], [], [], [], [], []
        smat, slight, sphere_areas = [], [], []
        for row in self.sphere_rows:
            r, zn, zx, tmin, tmax_, pm = sph.make_sphere_params(
                row["radius"], row["zmin"], row["zmax"], row["phimax"])
            so2w.append(row["o2w"])
            sw2o.append(np.linalg.inv(row["o2w"]))
            srad.append(r)
            szmin.append(zn)
            szmax.append(zx)
            stmin.append(tmin)
            stmax.append(tmax_)
            sphim.append(pm)
            smat.append(row["mat_id"])
            slight.append(row["light_id"])
            sphere_areas.append(pm * r * (zx - zn))
        # NOTE: scene leaves stay as NumPy arrays so jit closures bake
        # them into the executable as constants — a single upload at
        # compile time instead of dozens of small device transfers
        # (which are seconds each through the axon tunnel).
        spheres = sph.SphereSoA(
            o2w=np.stack(so2w),
            w2o=np.stack(sw2o),
            radius=np.asarray(srad, np.float32),
            zmin=np.asarray(szmin, np.float32),
            zmax=np.asarray(szmax, np.float32),
            thetamin=np.asarray(stmin, np.float32),
            thetamax=np.asarray(stmax, np.float32),
            phimax=np.asarray(sphim, np.float32),
            mat_id=np.asarray(smat, np.int32),
            light_id=np.asarray(slight, np.int32),
            phi_full=bool((np.asarray(sphim, np.float32)
                           >= 2.0 * np.pi - 1e-5).all()))

        # lights
        nl = max(1, len(self.light_rows))
        lt = np.zeros(nl, np.int32)
        lprim = np.full(nl, -1, np.int32)
        lem = np.zeros((nl, 3), np.float32)
        lpos = np.zeros((nl, 3), np.float32)
        laux = np.zeros((nl, 3), np.float32)
        lpar = np.zeros((nl, 4), np.float32)
        letex = np.full(nl, -1, np.int32)
        powers = np.zeros(nl, np.float32)
        for i, row in enumerate(self.light_rows):
            lt[i] = row["ltype"]
            lprim[i] = row.get("prim", -1)
            lem[i] = row["emission"]
            lpos[i] = row.get("pos", (0, 0, 0))
            laux[i] = row.get("aux", (0, 0, 1))
            lpar[i] = row.get("params", (0, 0, 0, 0))
            letex[i] = row.get("emission_tex", -1)
            powers[i] = self._light_power(row, tri_areas, sphere_areas)
        lights = LightTable(
            ltype=lt, prim=lprim, emission=lem, pos=lpos,
            aux=laux, params=lpar, emission_tex=letex,
            types_present=tuple(sorted(set(int(t) for t in lt))))

        if not self.material_rows:
            self.material_rows.append(dict(mtype=0, kd=(0.5, 0.5, 0.5)))

        catf = lambda lst, d, dt=np.float32: (
            np.concatenate(lst, 0).astype(dt) if lst
            else np.zeros((0,) + d, dt))
        bvh = None
        if (use_bvh or intersector == "bvh") and len(v0) > 0:
            bvh = bvhmod.build_bvh(v0, v1, v2)
        cw = cbox = remap = None
        if intersector == "cluster" and len(v0) > 0:
            from arendur_tpu.accel.clusters import build_clusters
            tabs = build_clusters(v0, v1, v2)
            cw, cbox, remap = (tabs["w_chunks"], tabs["cbox"],
                               tabs["remap"])
        inst = []
        for rec in self.instanced:
            from arendur_tpu.accel.clusters import build_clusters
            a = rec["attr"]
            itabs = build_clusters(a[:, 0:3], a[:, 3:6], a[:, 6:9])
            ts = rec["transforms"]
            lin = ts[:, :3, :3]
            inst.append(InstancedMesh(
                cw=itabs["w_chunks"], cbox=itabs["cbox"],
                remap=itabs["remap"], attr=a,
                o2w=ts, w2o=np.stack([np.linalg.inv(t) for t in ts]),
                nrm=np.stack([np.linalg.inv(m).T for m in lin])))
        return SceneData(
            bvh=bvh, inst=tuple(inst),
            tri_cw=cw, tri_cbox=cbox, tri_remap=remap,
            tri_v0=v0, tri_v1=v1, tri_v2=v2,
            tri_n0=catf(self.tn0, (3,)),
            tri_n1=catf(self.tn1, (3,)),
            tri_n2=catf(self.tn2, (3,)),
            tri_uv0=catf(self.tuv0, (2,)),
            tri_uv1=catf(self.tuv1, (2,)),
            tri_uv2=catf(self.tuv2, (2,)),
            tri_mat=catf(self.tmat, (), np.int32),
            tri_light=catf(self.tlight, (), np.int32),
            spheres=spheres,
            materials=make_material_table(self.material_rows),
            lights=lights,
            light_distribution=build_distribution_1d(
                powers if len(powers) else [1.0]))


# ---------------------------------------------------------------------------
# full-scene intersection
# ---------------------------------------------------------------------------

_GAMMA7 = 7.0 * 2.0 ** -24 / (1.0 - 7.0 * 2.0 ** -24)


def _kernel_spheres() -> bool:
    """ARENDUR_SPHERES=kernel folds the analytic-sphere tests into the
    Pallas intersect kernels.  Default OFF: measured end-to-end the
    in-kernel block costs ~1.5-1.8 ms/launch while the XLA sphere ops
    it replaces fuse into neighbouring work for ~free (DESIGN.md
    §9.5) — kernelizing only pays for fusion-breaking ops."""
    return os.environ.get("ARENDUR_SPHERES", "xla") == "kernel"


def _pallas_interpret() -> bool:
    """ARENDUR_PALLAS_INTERPRET=1: run the intersect kernels in
    interpret mode (CPU parity tests of the TPU-forced paths)."""
    return os.environ.get("ARENDUR_PALLAS_INTERPRET", "0") == "1"


def _use_pallas_intersect() -> bool:
    """Use the fused Pallas closest/any-hit kernel on real TPU backends;
    ARENDUR_INTERSECT=pallas|mxu forces a path (mxu = plain-XLA matmul,
    used by CPU tests and the virtual-mesh dryrun)."""
    forced = os.environ.get("ARENDUR_INTERSECT", "auto")
    if forced == "pallas":
        return True
    if forced != "auto":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probing only
        return False


def _bary_from_vertices(o, d, v0, v1, v2):
    """Recompute the winning triangle's barycentrics from its vertices
    (Moller form of the determinant math in mxu_intersect.py): an O(N)
    per-ray pass replacing O(N*T) extraction sweeps in the kernel."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    tvec = o - v0
    u = dot(tvec, pvec) * inv
    v = dot(d, cross(tvec, e1)) * inv
    return 1.0 - u - v, u


def tri_shading_from_row(trow, b0, b1):
    """Shading info from a packed [N,26] attribute row + barycentrics
    (shared by the world-space pool, instanced meshes, and the Pallas
    bounce mega-kernel)."""
    v0 = trow[:, 0:3]
    v1 = trow[:, 3:6]
    v2 = trow[:, 6:9]
    b2 = 1.0 - b0 - b1
    pos = b0[:, None] * v0 + b1[:, None] * v1 + b2[:, None] * v2
    perr = _GAMMA7 * (
        jnp.abs(b0[:, None] * v0) + jnp.abs(b1[:, None] * v1)
        + jnp.abs(b2[:, None] * v2))
    uv0 = trow[:, 18:20]
    uv1 = trow[:, 20:22]
    uv2 = trow[:, 22:24]
    uv = b0[:, None] * uv0 + b1[:, None] * uv1 + b2[:, None] * uv2
    dpdu, dpdv = tri.tri_dpduv(v0, v1, v2, uv0, uv1, uv2)
    ns_raw = normalize(
        b0[:, None] * trow[:, 9:12] + b1[:, None] * trow[:, 12:15]
        + b2[:, None] * trow[:, 15:18])
    return pos, perr, uv, dpdu, dpdv, ns_raw


def tri_pack(scene: "SceneData"):
    """[T,26] packed per-triangle attribute rows (v0 v1 v2 n0 n1 n2
    uv0 uv1 uv2 mat light) — ONE gather resolves a hit."""
    if scene.n_tris == 0:
        return jnp.zeros((1, 26), jnp.float32)
    return jnp.concatenate([
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_n0, scene.tri_n1, scene.tri_n2,
        scene.tri_uv0, scene.tri_uv1, scene.tri_uv2,
        jnp.asarray(scene.tri_mat).astype(jnp.float32)[:, None],
        jnp.asarray(scene.tri_light).astype(jnp.float32)[:, None],
    ], axis=1)


def intersect_raw(scene: SceneData, o, d, tmax=None, n_alive=None):
    """Raw closest-hit for the bounce mega-kernel: geometry resolution
    only, NO shading-info construction (that runs in-kernel).

    Returns dict(t, hit, is_sphere, s_idx, p_local, trow [N,26]).
    Cluster-intersector scenes without instanced meshes only (the
    integrator's mega eligibility guarantees this)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    # ray geometry is detached by design (detached-sampling estimator,
    # DESIGN §5; visibility/geometry discontinuities carry no gradient,
    # SURVEY §7 M5).  Also load-bearing: the Pallas intersect kernels
    # have no JVP rule, so a tangent-carrying ray input (e.g. via the
    # shade kernel's custom_vjp outputs under value_and_grad) would
    # fail to trace.
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), jnp.inf, jnp.float32)
    from arendur_tpu.shapes import pallas_intersect as pli
    ksph = _kernel_spheres()
    tab = sph.kernel_table(scene.spheres) if ksph else None
    if scene.tri_cw is not None:
        t_k, slot = pli.intersect_clusters(
            scene.tri_cw, scene.tri_cbox, o, d, tmax,
            n_alive=n_alive, sph_tab=tab,
            full_phi=scene.spheres.phi_full,
            interpret=_pallas_interpret())
        t_tri = jnp.where(slot >= 0, t_k, jnp.inf)
        tri_idx = jnp.where(slot >= 0,
                            scene.tri_remap[jnp.maximum(slot, 0)], -1)
    else:
        # empty world pool (pure-instanced scene); the in-kernel
        # sphere test needs the cluster kernel, so force the XLA
        # sphere path below
        ksph = False
        t_tri = jnp.full((n,), jnp.inf, jnp.float32)
        tri_idx = jnp.full((n,), -1, jnp.int32)
    trow = tri_pack(scene)[jnp.maximum(tri_idx, 0)]
    tri_hit = tri_idx >= 0

    # --- instanced meshes: same per-instance batched kernel launch as
    # sc.intersect, but the winning instance's LOCAL attribute row is
    # transformed to a WORLD-SPACE trow (vertices by o2w, normals by
    # the inverse-transpose) so the bounce mega-kernel's shading-info
    # construction works verbatim on it (VERDICT r4 item 3: instanced
    # hit-info resolved by baking per-instance transforms into the
    # rows the kernel already consumes).
    for im in scene.inst:
        I = im.o2w.shape[0]
        w2o = im.w2o
        ol = (jnp.einsum('nj,ijk->ink', o, w2o[:, :3, :3])
              + w2o[:, None, 3, :3]).reshape(I * n, 3)
        dl = jnp.einsum('nj,ijk->ink', d, w2o[:, :3, :3]) \
            .reshape(I * n, 3)
        bound_b = jnp.tile(jnp.minimum(tmax, t_tri), I)
        t_f, slot_f = pli.intersect_clusters(
            im.cw, im.cbox, ol, dl, bound_b,
            n_alive=n_alive, period=n,
            interpret=_pallas_interpret())
        li_f = jnp.where(slot_f >= 0,
                         im.remap[jnp.maximum(slot_f, 0)], -1)
        t_im = jnp.where(li_f >= 0, t_f, jnp.inf).reshape(I, n)
        inst_best = jnp.argmin(t_im, axis=0)
        t_i = jnp.take_along_axis(t_im, inst_best[None, :], 0)[0]
        li = jnp.take_along_axis(
            li_f.reshape(I, n), inst_best[None, :], 0)[0]
        hit_i = (li >= 0) & (t_i < t_tri) & jnp.isfinite(t_i)
        o2w_b = im.o2w[inst_best]
        nrm_b = im.nrm[inst_best]
        irow = im.attr[jnp.maximum(li, 0)]
        lin = o2w_b[:, :3, :3]
        tp = lambda p: jnp.einsum('nj,njk->nk', p, lin) \
            + o2w_b[:, 3, :3]
        tn = lambda v: jnp.einsum('nj,njk->nk', v, nrm_b)
        trow_w = jnp.concatenate([
            tp(irow[:, 0:3]), tp(irow[:, 3:6]), tp(irow[:, 6:9]),
            tn(irow[:, 9:12]), tn(irow[:, 12:15]), tn(irow[:, 15:18]),
            irow[:, 18:25],
            # instanced triangles are never scene lights (sc.intersect
            # forces light_id=-1 the same way, transformed.rs has no
            # per-instance light registration)
            jnp.full((n, 1), -1.0, jnp.float32)], axis=1)
        m26 = hit_i[:, None]
        trow = jnp.where(m26, trow_w, trow)
        t_tri = jnp.where(hit_i, t_i, t_tri)
        tri_hit = tri_hit | hit_i

    if ksph:
        sph_hit = slot <= -2
        t_sph = jnp.where(sph_hit, t_k, jnp.inf)
        s_idx = jnp.where(sph_hit, -(slot + 2), 0)
        use_sphere = sph_hit & (t_sph <= t_tri)
        w2o16 = jnp.asarray(scene.spheres.w2o).reshape(-1, 16)
        srow = jnp.concatenate(
            [w2o16, jnp.asarray(scene.spheres.radius)[:, None]],
            axis=1)[s_idx]
        from arendur_tpu.lighting.nee import _tp16, _tv16
        ol = _tp16(srow[:, 0:16], o)
        dl = _tv16(srow[:, 0:16], d)
        p_local = sph.refine_p_local(ol, dl, t_sph, srow[:, 16])
        t_best = jnp.where(use_sphere, t_sph, t_tri)
    else:
        sp = sph.intersect_spheres(scene.spheres, o, d,
                                   jnp.minimum(tmax, t_tri))
        use_sphere = sp["hit"]
        s_idx = jnp.maximum(sp["sphere_idx"], 0)
        p_local = sp["p_local"]
        t_best = jnp.where(use_sphere, sp["t"], t_tri)
    hit = tri_hit | use_sphere
    return dict(t=jnp.where(hit, t_best, jnp.inf), hit=hit,
                is_sphere=use_sphere, s_idx=s_idx, p_local=p_local,
                trow=trow)


def intersect(scene: SceneData, o, d, tmax=None, n_alive=None) -> Hit:
    """Closest-hit of N rays against the whole scene, with full
    shading info (the wavefront Composable::intersect_ray +
    SurfaceInteraction construction).

    n_alive: optional traced scalar — rays at positions >= n_alive
    (the integrator compacts dead lanes to the back) are reported as
    misses and skipped by the cluster kernel.
    """
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    # detached ray geometry (see intersect_raw): no-op on real paths
    # (directions are sampled under stop_gradient), required so the
    # Pallas kernels never see tangent-carrying operands
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    n = o.shape[0]
    if tmax is None:
        tmax = jnp.full((n,), jnp.inf, jnp.float32)

    ksph = False          # spheres folded into the pallas kernel?
    if scene.tri_cw is not None:
        k = scene.tri_cw.shape[-1] // 4
        if _use_pallas_intersect():
            from arendur_tpu.shapes import pallas_intersect as pli
            # optionally test analytic spheres INSIDE the closest-hit
            # kernel (slot <= -2 encodes sphere -(slot+2))
            ksph = _kernel_spheres()
            tab = sph.kernel_table(scene.spheres) if ksph else None
            t_k, slot = pli.intersect_clusters(
                scene.tri_cw, scene.tri_cbox, o, d, tmax,
                n_alive=n_alive, sph_tab=tab,
                full_phi=scene.spheres.phi_full,
                interpret=_pallas_interpret())
            t_tri = jnp.where(slot >= 0, t_k, jnp.inf)
            if ksph:
                sph_hit_k = slot <= -2
                t_sph_k = jnp.where(sph_hit_k, t_k, jnp.inf)
                s_idx_k = jnp.where(sph_hit_k, -(slot + 2), 0)
        else:
            t_tri, slot, _, _ = mxi.intersect_mxu(
                scene.tri_cw, o, d, tmax,
                scene.tri_cw.shape[0] * k, chunk=k)
        tri_idx = jnp.where(slot >= 0,
                            scene.tri_remap[jnp.maximum(slot, 0)], -1)
        b0 = b1 = None   # recomputed below from the packed vertices
    elif scene.bvh is not None:
        t_tri, tri_idx, b0, b1 = bvhmod.intersect_bvh(
            scene.bvh, scene.tri_v0, scene.tri_v1, scene.tri_v2,
            o, d, tmax)
    else:
        t_tri, tri_idx, b0, b1 = tri.intersect_scene_tris(
            o, d, tmax, scene.tri_v0, scene.tri_v1, scene.tri_v2)

    # --- triangle shading info: one packed row gather ----------------
    # Per-attribute gathers cost one HBM round trip EACH on the
    # wavefront; packing [T,26] makes the winning triangle's whole
    # attribute row a single gather (v0 v1 v2 n0 n1 n2 uv0 uv1 uv2
    # mat light), the SoA equivalent of the reference touching one
    # TriangleInstance (triangle.rs:260).
    ti = jnp.maximum(tri_idx, 0)
    tpack = jnp.concatenate([
        scene.tri_v0, scene.tri_v1, scene.tri_v2,            # 0:9
        scene.tri_n0, scene.tri_n1, scene.tri_n2,            # 9:18
        scene.tri_uv0, scene.tri_uv1, scene.tri_uv2,         # 18:24
        scene.tri_mat.astype(jnp.float32)[:, None],          # 24
        scene.tri_light.astype(jnp.float32)[:, None],        # 25
    ], axis=1) if scene.n_tris > 0 else jnp.zeros((1, 26), jnp.float32)
    trow = tpack[ti]
    v0 = trow[:, 0:3]
    v1 = trow[:, 3:6]
    v2 = trow[:, 6:9]
    if b0 is None:
        b0, b1 = _bary_from_vertices(o, d, v0, v1, v2)
    tri_hit = tri_idx >= 0
    t_tri = jnp.where(tri_hit, t_tri, jnp.inf)

    pos_tri, perr_tri, uv_tri, dpdu_tri, dpdv_tri, ns_raw = \
        tri_shading_from_row(trow, b0, b1)
    ng_tri = normalize(cross(dpdu_tri, dpdv_tri))
    # orient shading normal to agree with geometric
    # (ref: interaction.rs:167-181 with orient_norm_by_shading=true)
    flip = dot(ns_raw, ng_tri) < 0.0
    ns_tri = jnp.where(flip[:, None], -ns_raw, ns_raw)
    mat_tri = trow[:, 24].astype(jnp.int32)
    light_tri = trow[:, 25].astype(jnp.int32)
    prim_tri = tri_idx

    # --- instanced meshes: shared local-space tables, per-instance ray
    # transform (ref: component/transformed.rs:54-62; t is invariant
    # because the direction is transformed by the linear part only).
    # All I instances are intersected in ONE [I*N]-lane kernel launch
    # (rays batched through every transform), so the HLO op count is
    # flat in the instance count; only the winning instance's hit is
    # resolved per lane afterwards.
    prim_base = scene.n_tris + scene.spheres.count
    n = o.shape[0]
    for im in scene.inst:
        I = im.o2w.shape[0]
        T_m = im.attr.shape[0]
        w2o = im.w2o                       # [I,4,4] row-vector layout
        ol = (jnp.einsum('nj,ijk->ink', o, w2o[:, :3, :3])
              + w2o[:, None, 3, :3]).reshape(I * n, 3)
        dl = jnp.einsum('nj,ijk->ink', d, w2o[:, :3, :3]) \
            .reshape(I * n, 3)
        cur_bound = jnp.minimum(tmax, t_tri)
        bound_b = jnp.tile(cur_bound, I)
        if _use_pallas_intersect():
            from arendur_tpu.shapes import pallas_intersect as pli
            t_f, slot_f = pli.intersect_clusters(
                im.cw, im.cbox, ol, dl, bound_b,
                n_alive=n_alive, period=n,
                interpret=_pallas_interpret())
        else:
            ki = im.cw.shape[-1] // 4
            t_f, slot_f, _, _ = mxi.intersect_mxu(
                im.cw, ol, dl, bound_b,
                im.cw.shape[0] * ki, chunk=ki)
        li_f = jnp.where(slot_f >= 0,
                         im.remap[jnp.maximum(slot_f, 0)], -1)
        t_im = jnp.where(li_f >= 0, t_f, jnp.inf).reshape(I, n)
        # winning instance per lane (closest over the I blocks)
        inst_best = jnp.argmin(t_im, axis=0)
        t_i = jnp.take_along_axis(t_im, inst_best[None, :], 0)[0]
        li = jnp.take_along_axis(
            li_f.reshape(I, n), inst_best[None, :], 0)[0]
        hit_i = (li >= 0) & (t_i < t_tri) & jnp.isfinite(t_i)
        # winning instance's transforms + local ray (per-lane gathers
        # over the tiny [I,...] tables)
        w2o_b = w2o[inst_best]             # [N,4,4]
        o2w_b = im.o2w[inst_best]
        nrm_b = im.nrm[inst_best]
        ol_b = jnp.einsum('nj,njk->nk', o, w2o_b[:, :3, :3]) \
            + w2o_b[:, 3, :3]
        dl_b = jnp.einsum('nj,njk->nk', d, w2o_b[:, :3, :3])
        irow = im.attr[jnp.maximum(li, 0)]
        b0i, b1i = _bary_from_vertices(
            ol_b, dl_b, irow[:, 0:3], irow[:, 3:6], irow[:, 6:9])
        pos_l, perr_l, uv_i, dpdu_l, dpdv_l, ns_l = \
            tri_shading_from_row(irow, b0i, b1i)
        lin = o2w_b[:, :3, :3]
        pos_w = jnp.einsum('nj,njk->nk', pos_l, lin) + o2w_b[:, 3, :3]
        dpdu_w = jnp.einsum('nj,njk->nk', dpdu_l, lin)
        dpdv_w = jnp.einsum('nj,njk->nk', dpdv_l, lin)
        ng_w = normalize(cross(dpdu_w, dpdv_w))
        ns_w = normalize(jnp.einsum('nj,njk->nk', ns_l, nrm_b))
        flip_i = dot(ns_w, ng_w) < 0.0
        ns_w = jnp.where(flip_i[:, None], -ns_w, ns_w)
        perr_w = jnp.einsum('nj,njk->nk', perr_l, jnp.abs(lin)) \
            + 1e-7 * jnp.abs(pos_w)
        m = hit_i[:, None]
        sel1 = lambda a, b: jnp.where(hit_i, a, b)
        sel3 = lambda a, b: jnp.where(m, a, b)
        t_tri = sel1(t_i, t_tri)
        tri_hit = tri_hit | hit_i
        pos_tri = sel3(pos_w, pos_tri)
        perr_tri = sel3(perr_w, perr_tri)
        uv_tri = sel3(uv_i, uv_tri)
        dpdu_tri = sel3(dpdu_w, dpdu_tri)
        dpdv_tri = sel3(dpdv_w, dpdv_tri)
        ng_tri = sel3(ng_w, ng_tri)
        ns_tri = sel3(ns_w, ns_tri)
        mat_tri = sel1(irow[:, 24].astype(jnp.int32), mat_tri)
        light_tri = sel1(jnp.full_like(mat_tri, -1), light_tri)
        prim_tri = sel1(prim_base + li, prim_tri)
        prim_base += T_m

    if ksph:
        # sphere results came from the closest-hit kernel; the sphere
        # wins ties (<=) exactly like the old tmax-clamped XLA test
        use_sphere = sph_hit_k & (t_sph_k <= t_tri)
        t = jnp.where(use_sphere, t_sph_k, t_tri)
        s_idx = jnp.maximum(s_idx_k, 0)
        # reconstruct the winning sphere's local hit point (same
        # refinement ops as the in-kernel accept, sphere.refine_p_local)
        w2o16 = jnp.asarray(scene.spheres.w2o).reshape(-1, 16)
        srow = jnp.concatenate(
            [w2o16, jnp.asarray(scene.spheres.radius)[:, None]],
            axis=1)[s_idx]
        from arendur_tpu.lighting.nee import _tp16, _tv16
        ol = _tp16(srow[:, 0:16], o)
        dl = _tv16(srow[:, 0:16], d)
        p_local = sph.refine_p_local(ol, dl, t_sph_k, srow[:, 16])
    else:
        sp = sph.intersect_spheres(scene.spheres, o, d,
                                   jnp.minimum(tmax, t_tri))
        use_sphere = sp["hit"]  # closer than t_tri via tmax clamp
        t = jnp.where(use_sphere, sp["t"], t_tri)
        s_idx = jnp.maximum(sp["sphere_idx"], 0)
        p_local = sp["p_local"]
    any_hit = tri_hit | use_sphere

    # --- sphere shading info ---
    pos_s, ng_s, uv_s, dpdu_s, dpdv_s, perr_s = sph.sphere_hit_info(
        scene.spheres, s_idx, p_local)
    mat_s = scene.spheres.mat_id[s_idx]
    light_s = scene.spheres.light_id[s_idx]

    pick3 = lambda a, b: jnp.where(use_sphere[:, None], a, b)
    pick1 = lambda a, b: jnp.where(use_sphere, a, b)
    prim = jnp.where(
        any_hit,
        pick1(scene.n_tris + s_idx, prim_tri),
        -1).astype(jnp.int32)

    # miss lanes get a benign default interaction so no garbage (or
    # overflow-to-inf) values flow into downstream shading math — a
    # finite-primal requirement for NaN-free reverse-mode
    hm = any_hit[:, None]
    zaxis = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    xaxis = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    return Hit(
        hit=any_hit,
        t=jnp.where(any_hit, t, jnp.inf),
        prim=prim,
        pos=jnp.where(hm, pick3(pos_s, pos_tri), 0.0),
        pos_err=jnp.where(hm, pick3(perr_s, perr_tri), 0.0),
        ng=jnp.where(hm, pick3(ng_s, ng_tri), zaxis),
        ns=jnp.where(hm, pick3(ng_s, ns_tri), zaxis),
        dpdu=jnp.where(hm, pick3(dpdu_s, dpdu_tri), xaxis),
        dpdv=jnp.where(hm, pick3(dpdv_s, dpdv_tri), cross(zaxis, xaxis)),
        uv=jnp.where(hm, pick3(uv_s, uv_tri), 0.0),
        mat_id=jnp.where(any_hit, pick1(mat_s, mat_tri), 0).astype(
            jnp.int32),
        light_id=jnp.where(any_hit, pick1(light_s, light_tri),
                           -1).astype(jnp.int32))


def occluded(scene: SceneData, o, d, tmax, n_alive=None) -> jnp.ndarray:
    """Any-hit query for shadow rays."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    # boolean result: gradients are zero by definition; sg keeps the
    # Pallas any-hit kernel off the JVP path (see intersect_raw)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    tmax = jax.lax.stop_gradient(tmax)
    ksph = False
    if scene.tri_cw is not None:
        k = scene.tri_cw.shape[-1] // 4
        if _use_pallas_intersect():
            from arendur_tpu.shapes import pallas_intersect as pli
            ksph = _kernel_spheres()
            blocked_t = pli.occluded_clusters(
                scene.tri_cw, scene.tri_cbox, o, d, tmax,
                n_alive=n_alive,
                sph_tab=sph.kernel_table(scene.spheres) if ksph
                else None,
                full_phi=scene.spheres.phi_full,
                interpret=_pallas_interpret())
        else:
            blocked_t = mxi.occluded_mxu(
                scene.tri_cw, o, d, tmax,
                scene.tri_cw.shape[0] * k, chunk=k)
    elif scene.bvh is not None:
        t_tri, tri_idx, _, _ = bvhmod.intersect_bvh(
            scene.bvh, scene.tri_v0, scene.tri_v1, scene.tri_v2,
            o, d, tmax)
        blocked_t = tri_idx >= 0
    else:
        blocked_t = tri.occluded_tris(
            o, d, tmax, scene.tri_v0, scene.tri_v1, scene.tri_v2)
    # instances batched into one [I*N]-lane any-hit launch (op count
    # flat in I, like intersect)
    n = o.shape[0]
    for im in scene.inst:
        I = im.o2w.shape[0]
        w2o = im.w2o
        ol = (jnp.einsum('nj,ijk->ink', o, w2o[:, :3, :3])
              + w2o[:, None, 3, :3]).reshape(I * n, 3)
        dl = jnp.einsum('nj,ijk->ink', d, w2o[:, :3, :3]) \
            .reshape(I * n, 3)
        tmax_b = jnp.tile(tmax, I)
        if _use_pallas_intersect():
            from arendur_tpu.shapes import pallas_intersect as pli
            blk = pli.occluded_clusters(
                im.cw, im.cbox, ol, dl, tmax_b,
                n_alive=n_alive, period=n,
                interpret=_pallas_interpret())
        else:
            ki = im.cw.shape[-1] // 4
            blk = mxi.occluded_mxu(
                im.cw, ol, dl, tmax_b, im.cw.shape[0] * ki, chunk=ki)
        blocked_t = blocked_t | jnp.any(blk.reshape(I, n), axis=0)
    if ksph:
        return blocked_t
    sp = sph.intersect_spheres(scene.spheres, o, d, tmax)
    return blocked_t | sp["hit"]


@jax.custom_jvp
def _nextafter(p, q):
    return jnp.nextafter(p, q)


@_nextafter.defjvp
def _nextafter_jvp(primals, tangents):
    # nextafter is identity + one ulp: derivative w.r.t. p is 1
    # (jax ships no differentiation rule; without this the ulp nudge
    # breaks reverse-mode whenever the ray origin carries a tangent)
    p, q = primals
    dp, _ = tangents
    return jnp.nextafter(p, q), dp


def offset_ray_origin(pos, pos_err, n, dir):
    """Robust spawn-point offsetting (ref: interaction.rs:45-72):
    shift along +/-n by the error bound, then nudge one ulp."""
    edn = dot(jnp.abs(n), pos_err, keepdims=True)
    offset = edn * n
    offset = jnp.where(dot(dir, n, keepdims=True) <= 0.0, -offset, offset)
    p = pos + offset
    up = _nextafter(p, jnp.full_like(p, jnp.inf))
    down = _nextafter(p, jnp.full_like(p, -jnp.inf))
    return jnp.where(offset > 0.0, up, jnp.where(offset < 0.0, down, p))
