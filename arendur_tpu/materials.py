"""Material table -> BSDF slot construction (ref: src/material/).

The reference's ``Material::compute_scattering`` evaluates textures at
the hit and arena-allocates bxdfs.  Here materials are rows of a SoA
parameter table; ``compute_scattering`` gathers the hit's row,
evaluates its textures, and writes the bxdf slot table following each
material's recipe:

* Matte       -> LambertianR (sigma==0) or Oren-Nayar   (matte.rs:38-65)
* Plastic     -> AshikhminShirley(Beckmann)             (plastic.rs:39-64)
* Glass       -> FresnelBxdf + TS-R/TS-T (Trowbridge)   (glass.rs:41-81)
* Translucent -> AshikhminShirley(TR)*d + LambertianT*(1-d)
                                                        (translucent.rs:41-75)

Slots are packed contiguously so the mixture sampler's "idx-th
matching slot" logic is well-defined.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from arendur_tpu.bxdf import microfacet as mf
from arendur_tpu.bxdf.slots import BsdfSlots, make_bsdf_frame, MAX_SLOTS
from arendur_tpu.bxdf.types import (
    T_NONE, T_LAMBERT_R, T_LAMBERT_T, T_OREN_NAYAR, T_FRESNEL_SPEC,
    T_TS_R, T_TS_T, T_ASHIKHMIN, D_BECKMANN, D_TROWBRIDGE, KIND_OF_TYPE)

M_MATTE = 0
M_PLASTIC = 1
M_GLASS = 2
M_TRANSLUCENT = 3


@struct.dataclass
class MaterialTable:
    """M materials as SoA rows.  Colors are constant-texture values;
    *_tex fields hold image-texture ids (-1 = constant) for the
    texture milestone."""
    mtype: jnp.ndarray      # [M] int32
    kd: jnp.ndarray         # [M,3] diffuse / kd
    ks: jnp.ndarray         # [M,3] specular
    sigma: jnp.ndarray      # [M] matte roughness (Oren-Nayar sigma)
    roughness: jnp.ndarray  # [M]
    eta: jnp.ndarray        # [M] ior (glass)
    dissolve: jnp.ndarray   # [M]
    kd_tex: jnp.ndarray     # [M] int32
    ks_tex: jnp.ndarray     # [M] int32
    sigma_tex: jnp.ndarray  # [M] int32
    bump_tex: jnp.ndarray   # [M] int32


def make_material_table(rows) -> MaterialTable:
    """rows: list of dicts with keys mtype, kd, ks, sigma, roughness,
    eta, dissolve (+ optional *_tex ids)."""
    def col(key, default, dt=np.float32):
        # NumPy leaves: baked as jit constants (see scene.py note)
        return np.asarray([r.get(key, default) for r in rows], dt)
    return MaterialTable(
        mtype=col("mtype", M_MATTE, np.int32),
        kd=col("kd", (0.0, 0.0, 0.0)),
        ks=col("ks", (0.0, 0.0, 0.0)),
        sigma=col("sigma", 0.0),
        roughness=col("roughness", 0.0),
        eta=col("eta", 1.5),
        dissolve=col("dissolve", 1.0),
        kd_tex=col("kd_tex", -1, np.int32),
        ks_tex=col("ks_tex", -1, np.int32),
        sigma_tex=col("sigma_tex", -1, np.int32),
        bump_tex=col("bump_tex", -1, np.int32),
    )


def apply_bump(textures, bump_tex, uv, ns, ng, dpdu, dpdv,
               duvdx=None, duvdy=None):
    """Bump mapping (ref: material/mod.rs:42-86): finite-difference
    displacement along u and v shifts the shading frame.

    Returns (ns', dpdu').  The reference shifts the interaction by
    half the screen-space uv footprint; lanes without differentials
    use its 0.0005 fallback."""
    import jax.numpy as jnp
    from arendur_tpu.texturing import texture as tx
    from arendur_tpu.geometry.vec import cross, dot, normalize
    if textures is None:
        return ns, dpdu
    if duvdx is not None:
        du = 0.5 * (jnp.abs(duvdx[..., 0]) + jnp.abs(duvdy[..., 0]))
        dv = 0.5 * (jnp.abs(duvdx[..., 1]) + jnp.abs(duvdy[..., 1]))
        du = jnp.where(du == 0.0, 5e-4, du)
        dv = jnp.where(dv == 0.0, 5e-4, dv)
    else:
        du = jnp.full(uv.shape[:-1], 5e-4, jnp.float32)
        dv = du
    disp = tx.eval_gray(textures, bump_tex, uv, jnp.zeros_like(du))
    disp_u = tx.eval_gray(
        textures, bump_tex,
        uv + jnp.stack([du, jnp.zeros_like(du)], -1), jnp.zeros_like(du))
    disp_v = tx.eval_gray(
        textures, bump_tex,
        uv + jnp.stack([jnp.zeros_like(dv), dv], -1), jnp.zeros_like(dv))
    ddu = (disp_u - disp) / du
    ddv = (disp_v - disp) / dv
    dpdu_b = dpdu + ddu[..., None] * ns
    dpdv_b = dpdv + ddv[..., None] * ns
    ns_b = normalize(cross(dpdu_b, dpdv_b))
    # keep the bumped normal in the original shading hemisphere
    ns_b = jnp.where(dot(ns_b, ns, keepdims=True) < 0.0, -ns_b, ns_b)
    has_bump = (bump_tex >= 0)[..., None]
    return (jnp.where(has_bump, ns_b, ns),
            jnp.where(has_bump, dpdu_b, dpdu))


def slot_presence(table: MaterialTable):
    """Static per-slot-column sets of bxdf types any material row can
    place there — computed on the host (table leaves stay NumPy by
    design, scene.py build note).  The slot machinery uses this to
    skip whole bxdf families at trace time: masking is free in SIMD
    only if the masked work is never emitted.

    Returns a MAX_SLOTS-tuple of sorted type-id tuples, or None when
    the table is traced (then every family is emitted)."""
    try:
        mtype = np.asarray(table.mtype)
        kd = np.asarray(table.kd)
        ks = np.asarray(table.ks)
        sigma = np.asarray(table.sigma)
        dissolve = np.asarray(table.dissolve)
        kd_tex = np.asarray(table.kd_tex)
        ks_tex = np.asarray(table.ks_tex)
        sigma_tex = np.asarray(table.sigma_tex)
    except Exception:
        return None
    cols = [set() for _ in range(MAX_SLOTS)]
    for i in range(len(mtype)):
        kd_may = (kd[i] != 0).any() or kd_tex[i] >= 0
        ks_may = (ks[i] != 0).any() or ks_tex[i] >= 0
        if mtype[i] == M_MATTE:
            if kd_may:
                if sigma_tex[i] >= 0:
                    cols[0] |= {T_LAMBERT_R, T_OREN_NAYAR}
                elif sigma[i] == 0.0:
                    cols[0].add(T_LAMBERT_R)
                else:
                    cols[0].add(T_OREN_NAYAR)
        elif mtype[i] == M_PLASTIC:
            cols[0].add(T_ASHIKHMIN)
        elif mtype[i] == M_GLASS:
            if ks_may:
                cols[0].add(T_FRESNEL_SPEC)
            if kd_may:
                if ks_may:
                    cols[1].add(T_TS_R)
                    cols[2].add(T_TS_T)
                if not (ks_may and ks_tex[i] < 0 and (ks[i] != 0).any()):
                    # spec may be absent -> TS slots shift down
                    cols[0].add(T_TS_R)
                    cols[1].add(T_TS_T)
        elif mtype[i] == M_TRANSLUCENT:
            t_as = dissolve[i] != 0.0
            if t_as:
                cols[0].add(T_ASHIKHMIN)
            if kd_may:
                # placed whenever kd may be nonblack, even at
                # dissolve==1 (zero-scaled slot still counts in the
                # mixture's pdf averaging) — presence must be a
                # superset of what compute_scattering can place
                cols[1 if t_as else 0].add(T_LAMBERT_T)
    return tuple(tuple(sorted(c)) for c in cols)


def param_table(table: MaterialTable):
    """[M,16] packed material parameter rows (mtype kd ks sigma
    roughness eta dissolve + tex ids + pad) — the bounce mega-kernel
    selects per-lane rows from this in-kernel."""
    t = table
    pack = jnp.concatenate([
        jnp.asarray(t.mtype).astype(jnp.float32)[:, None],
        jnp.asarray(t.kd), jnp.asarray(t.ks),
        jnp.asarray(t.sigma)[:, None],
        jnp.asarray(t.roughness)[:, None],
        jnp.asarray(t.eta)[:, None],
        jnp.asarray(t.dissolve)[:, None],
        jnp.asarray(t.kd_tex).astype(jnp.float32)[:, None],
        jnp.asarray(t.ks_tex).astype(jnp.float32)[:, None],
        jnp.asarray(t.sigma_tex).astype(jnp.float32)[:, None],
        jnp.asarray(t.bump_tex).astype(jnp.float32)[:, None],
    ], axis=1)
    return jnp.concatenate(
        [pack, jnp.zeros((pack.shape[0], 1), jnp.float32)], axis=1)


def resolve_params(table: MaterialTable, mat_id, ns, ng, dpdu,
                   uv=None, textures=None, dpdv=None,
                   duvdx=None, duvdy=None,
                   tex_filter: str = "trilinear",
                   tex_present=None):
    """Gather + texture-resolve the hit's material parameters (the
    pre-recipe half of compute_scattering; the Pallas bounce kernel
    takes these resolved columns as inputs and runs build_slots
    in-kernel).  Returns (mtype, kd, ks, sigma, roughness, eta,
    dissolve, ns', dpdu') — ns/dpdu possibly bump-mapped.

    tex_present: optional host-static (kd, ks, sigma, bump) bool
    4-tuple saying which texture channels any material actually uses.
    Callers that trace with an already-jax table (the integrator)
    MUST pass it: the any_tex fallback below cannot inspect traced
    leaves and conservatively emits every channel's gathers — ~4-8 ms
    of DMA per gather per bounce on the TPU wavefront (DESIGN §10.7)."""
    from arendur_tpu.geometry.vec import as_jax
    table = as_jax(table)
    n = mat_id.shape[0]
    # one packed [M,15] row gather instead of 11 per-column gathers:
    # each TPU gather costs a full HBM round trip on the wavefront,
    # so per-column lookups dominated the shading phase
    pack = jnp.concatenate([
        table.mtype.astype(jnp.float32)[:, None],          # 0
        table.kd,                                          # 1:4
        table.ks,                                          # 4:7
        table.sigma[:, None],                              # 7
        table.roughness[:, None],                          # 8
        table.eta[:, None],                                # 9
        table.dissolve[:, None],                           # 10
        table.kd_tex.astype(jnp.float32)[:, None],         # 11
        table.ks_tex.astype(jnp.float32)[:, None],         # 12
        table.sigma_tex.astype(jnp.float32)[:, None],      # 13
        table.bump_tex.astype(jnp.float32)[:, None],       # 14
    ], axis=1)
    row = pack[mat_id]
    mtype = row[:, 0].astype(jnp.int32)
    kd = row[:, 1:4]
    ks = row[:, 4:7]
    sigma = row[:, 7]
    roughness = row[:, 8]
    eta = row[:, 9]
    dissolve = row[:, 10]

    if textures is not None and uv is not None:
        from arendur_tpu.texturing import texture as tx

        # skip the lookup entirely when no material in the scene uses
        # one (host-checkable: table leaves stay NumPy by design) —
        # each skipped channel saves its gathers on every bounce
        def any_tex(col, i):
            if tex_present is not None:
                return bool(tex_present[i])
            try:
                return bool(np.any(np.asarray(col) >= 0))
            except Exception:   # traced leaf: can't tell, do the work
                return True
        if any_tex(table.kd_tex, 0):
            kd_tex = row[:, 11].astype(jnp.int32)
            kd = tx.eval_rgb(textures, kd_tex, uv, kd,
                             duvdx=duvdx, duvdy=duvdy,
                             filter=tex_filter)
        if any_tex(table.ks_tex, 1):
            ks_tex = row[:, 12].astype(jnp.int32)
            ks = tx.eval_rgb(textures, ks_tex, uv, ks,
                             duvdx=duvdx, duvdy=duvdy,
                             filter=tex_filter)
        if any_tex(table.sigma_tex, 2):
            sigma = tx.eval_gray(textures, row[:, 13].astype(jnp.int32),
                                 uv, sigma, duvdx=duvdx, duvdy=duvdy)
        if dpdv is not None and any_tex(table.bump_tex, 3):
            ns, dpdu = apply_bump(
                textures, row[:, 14].astype(jnp.int32), uv, ns, ng, dpdu,
                dpdv, duvdx=duvdx, duvdy=duvdy)

    return mtype, kd, ks, sigma, roughness, eta, dissolve, ns, dpdu


# Which microfacet distribution each material recipe assigns to each
# microfacet-bearing slot type.  This is the SINGLE source of truth:
# build_slots reads its dist values from here and dist_presence derives
# the static pruning sets from it, so they cannot silently diverge
# (plastic AS = Beckmann per plastic.rs:39-64; glass TS and translucent
# AS = Trowbridge per glass.rs:41-81 / translucent.rs:41-75).
RECIPE_DISTS = {
    M_PLASTIC: {T_ASHIKHMIN: D_BECKMANN},
    M_GLASS: {T_TS_R: D_TROWBRIDGE, T_TS_T: D_TROWBRIDGE},
    M_TRANSLUCENT: {T_ASHIKHMIN: D_TROWBRIDGE},
}


def dist_presence(table: MaterialTable):
    """Static per-family microfacet-distribution sets (BsdfSlots.dists),
    derived from RECIPE_DISTS restricted to the material types present —
    single-model families drop the other model's code entirely (e.g.
    the Beckmann Newton solver vanishes from the TS sweeps)."""
    try:
        mtype = np.asarray(table.mtype)
    except Exception:
        return None
    out = {}
    for mt, slots in RECIPE_DISTS.items():
        if (mtype == mt).any():
            for stype, dist in slots.items():
                out.setdefault(stype, set()).add(dist)
    return tuple(sorted((k, tuple(sorted(v))) for k, v in out.items()))


def tex_channel_presence(table: MaterialTable):
    """Host-static (kd, ks, sigma, bump) bool 4-tuple of texture
    channels any material row uses, or None when the table is traced.
    Compute this BEFORE handing the scene to jit and pass it to
    resolve_params/compute_scattering: inside a trace the leaves are
    abstract and the per-channel skip cannot be derived."""
    try:
        return tuple(bool((np.asarray(c) >= 0).any()) for c in
                     (table.kd_tex, table.ks_tex, table.sigma_tex,
                      table.bump_tex))
    except Exception:
        return None


def compute_scattering(table: MaterialTable, mat_id, ns, ng, dpdu,
                       uv=None, textures=None, dpdv=None,
                       duvdx=None, duvdy=None,
                       tex_filter: str = "trilinear",
                       tex_present=None) -> BsdfSlots:
    """Build the BSDF slot table for N hits.

    mat_id [N] int32; ns/ng/dpdu [N,3] world-space shading data.
    With `textures` (texturing milestone), kd/ks/sigma are overridden
    by image-texture lookups at `uv` where *_tex >= 0; duvdx/duvdy
    [N,2] drive mipmap LOD (trilinear) or EWA anisotropic filtering.
    tex_present: see resolve_params.
    """
    presence = slot_presence(table)
    (mtype, kd, ks, sigma, roughness, eta, dissolve, ns, dpdu) = \
        resolve_params(table, mat_id, ns, ng, dpdu, uv=uv,
                       textures=textures, dpdv=dpdv, duvdx=duvdx,
                       duvdy=duvdy, tex_filter=tex_filter,
                       tex_present=tex_present)
    return build_slots(mtype, kd, ks, sigma, roughness, eta, dissolve,
                       ns, ng, dpdu, presence,
                       dist_sets=dist_presence(table))


def build_slots(mtype, kd, ks, sigma, roughness, eta, dissolve,
                ns, ng, dpdu, presence=None,
                flat_colors: bool = False, dist_sets=None) -> BsdfSlots:
    """The material recipe: resolved per-lane parameters -> BSDF slot
    table (the post-texture half of compute_scattering).  Pure
    elementwise jnp, shared verbatim by the XLA path and the Pallas
    bounce mega-kernel (flat_colors=True keeps colors [N,3K] 2-D —
    Mosaic has no 3-D reshape)."""
    n = mtype.shape[0]
    alpha = mf.roughness_to_alpha(roughness)
    sigma_c = jnp.clip(sigma, 0.0, 90.0)

    kd_black = (kd[..., 0] == 0.0) & (kd[..., 1] == 0.0) \
        & (kd[..., 2] == 0.0)
    ks_black = (ks[..., 0] == 0.0) & (ks[..., 1] == 0.0) \
        & (ks[..., 2] == 0.0)

    ktype = [jnp.zeros((n,), jnp.int32) for _ in range(MAX_SLOTS)]
    kc0 = [jnp.zeros((n, 3), jnp.float32) for _ in range(MAX_SLOTS)]
    kc1 = [jnp.zeros((n, 3), jnp.float32) for _ in range(MAX_SLOTS)]
    kp0 = [jnp.zeros((n,), jnp.float32) for _ in range(MAX_SLOTS)]
    kp1 = [jnp.zeros((n,), jnp.float32) for _ in range(MAX_SLOTS)]
    kp2 = [jnp.zeros((n,), jnp.float32) for _ in range(MAX_SLOTS)]
    kdist = [jnp.zeros((n,), jnp.int32) for _ in range(MAX_SLOTS)]

    def put(slot, mask, stype, c0=None, c1=None, p0=None, p1=None,
            p2=None, dist=None):
        ktype[slot] = jnp.where(mask, stype, ktype[slot])
        if c0 is not None:
            kc0[slot] = jnp.where(mask[..., None], c0, kc0[slot])
        if c1 is not None:
            kc1[slot] = jnp.where(mask[..., None], c1, kc1[slot])
        if p0 is not None:
            kp0[slot] = jnp.where(mask, p0, kp0[slot])
        if p1 is not None:
            kp1[slot] = jnp.where(mask, p1, kp1[slot])
        if p2 is not None:
            kp2[slot] = jnp.where(mask, p2, kp2[slot])
        if dist is not None:
            kdist[slot] = jnp.where(mask, dist, kdist[slot])

    one = jnp.ones((n,), jnp.float32)

    # --- Matte (matte.rs:38-65) -----------------------------------------
    matte = mtype == M_MATTE
    s2 = sigma_c * sigma_c
    on_a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    on_b = 0.45 * s2 / (s2 + 0.09)
    m_lam = matte & ~kd_black & (sigma_c == 0.0)
    m_on = matte & ~kd_black & (sigma_c != 0.0)
    put(0, m_lam, T_LAMBERT_R, c0=kd)
    put(0, m_on, T_OREN_NAYAR, c0=kd, p0=on_a, p1=on_b)

    # --- Plastic (plastic.rs:39-64): AS with Beckmann -------------------
    plastic = mtype == M_PLASTIC
    put(0, plastic, T_ASHIKHMIN,
        c0=jnp.clip(kd, 0.0, 1.0), c1=jnp.clip(ks, 0.0, 1.0),
        p0=alpha, dist=jnp.full(
            (n,), RECIPE_DISTS[M_PLASTIC][T_ASHIKHMIN], jnp.int32))

    # --- Glass (glass.rs:41-81) -----------------------------------------
    glass = mtype == M_GLASS
    g_spec = glass & ~ks_black
    g_diff = glass & ~kd_black
    # slot layout keeps active slots contiguous:
    #   spec & diff  -> [Fresnel, TS-R, TS-T]
    #   spec only    -> [Fresnel]
    #   diff only    -> [TS-R, TS-T]
    tr = jnp.full((n,), RECIPE_DISTS[M_GLASS][T_TS_R], jnp.int32)
    put(0, g_spec, T_FRESNEL_SPEC, c0=ks, c1=ks, p0=one, p1=eta)
    put(0, g_diff & ~g_spec, T_TS_R, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)
    put(1, g_diff & g_spec, T_TS_R, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)
    put(1, g_diff & ~g_spec, T_TS_T, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)
    put(2, g_diff & g_spec, T_TS_T, c0=kd, p0=alpha, p1=one, p2=eta,
        dist=tr)

    # --- Translucent (translucent.rs:41-75) -----------------------------
    transl = mtype == M_TRANSLUCENT
    t_as = transl & (dissolve != 0.0)
    t_lt = transl & ~kd_black
    put(0, t_as, T_ASHIKHMIN,
        c0=jnp.clip(kd * dissolve[..., None], 0.0, 1.0),
        c1=jnp.clip(ks * dissolve[..., None], 0.0, 1.0),
        p0=alpha, dist=jnp.full(
            (n,), RECIPE_DISTS[M_TRANSLUCENT][T_ASHIKHMIN], jnp.int32))
    put(0, t_lt & ~t_as, T_LAMBERT_T,
        c0=kd * (1.0 - dissolve[..., None]))
    put(1, t_lt & t_as, T_LAMBERT_T,
        c0=kd * (1.0 - dissolve[..., None]))

    stype = jnp.stack(ktype, axis=1)
    # kind from type via a where-chain instead of a LUT gather (gathers
    # don't lower in Mosaic and cost an HBM round trip in XLA)
    kind = jnp.zeros_like(stype)
    for t in range(1, len(KIND_OF_TYPE)):
        if KIND_OF_TYPE[t]:
            kind = jnp.where(stype == t, KIND_OF_TYPE[t], kind)

    ts, bs = make_bsdf_frame(ns, ng, dpdu)
    bsdf_eta = jnp.where(glass, eta, 1.0)
    if flat_colors:
        c0 = jnp.concatenate(kc0, 1)
        c1 = jnp.concatenate(kc1, 1)
    else:
        c0 = jnp.stack(kc0, 1)
        c1 = jnp.stack(kc1, 1)
    return BsdfSlots(
        ns=ns, ts=ts, bs=bs, ng=ng, eta=bsdf_eta,
        type=stype, kind=kind,
        c0=c0, c1=c1,
        p0=jnp.stack(kp0, 1), p1=jnp.stack(kp1, 1),
        p2=jnp.stack(kp2, 1),
        dist=jnp.stack(kdist, 1),
        present=presence, dists=dist_sets)
