"""Wavefront path-tracing integrator (ref: src/renderer/pt.rs).

The reference traces one ray at a time through a recursive bounce
loop over rayon tiles.  Here a *wave* of N rays advances together
through a statically-unrolled bounce loop (max_depth is small and
static, so full unrolling lets XLA pipeline all three intersection
passes per bounce); terminated lanes are masked, exactly like the
SoA wavefront design in SURVEY.md §7.

Per bounce (mirroring calculate_lighting, pt.rs:55-125):
  1. closest-hit intersect
  2. emitted radiance if bounce==0 or previous bounce was specular
  3. NEE via uniform_sample_one_light (3 extra ray queries)
  4. BSDF sample -> beta update, specular flag, new offset ray
  5. Russian roulette past min_depth (rr_threshold=0.05)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from arendur_tpu import scene as sc
from arendur_tpu import spectrum as spec
from arendur_tpu import materials as mats
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL, ALL_NON_SPECULAR, SPECULAR
from arendur_tpu.geometry.vec import dot
from arendur_tpu.lighting import nee
from arendur_tpu.sampling import sampler as smp
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    max_depth: int = 8
    rr_threshold: float = 0.05
    spp: int = 16
    sample_dx: int = 4          # stratification grid (dx*dy == spp)
    sample_dy: int = 4
    seed: int = 0
    wave_size: int = 1 << 16    # rays per wavefront launch
    textures: Optional[object] = None
    tex_filter: str = "trilinear"   # "trilinear" | "ewa"
    sampler: str = "strata"     # "strata" | "sobol"
    sobol_table: Optional[object] = None  # [spp, D] uint32 (host-built)
    unroll_bounces: bool = False  # True: unrolled python loop (bigger
                                  # HLO, potentially more fusion);
                                  # False: lax.scan over bounces
                                  # (compiles one bounce body)
    compact: bool = True          # dead-lane compaction per bounce
                                  # (lets the cluster kernel skip whole
                                  # ray tiles; costs ~12 fixed-cost ops
                                  # — ablatable, DESIGN.md §9.4)
    cone_curvature: bool = True   # propagate the texture-LOD ray cone
                                  # through specular bounces with the
                                  # surface-curvature spread update
                                  # (gamma' = gamma + 2*kappa*w, the
                                  # ray-cones curvature rule); the
                                  # wavefront stand-in for the
                                  # reference's exact per-bounce
                                  # spawn_ray_differential
                                  # (interaction.rs:236-252)
    defer_final_mis: bool = True  # the extra closest-hit after the
                                  # loop that completes the deferred
                                  # MIS bsdf branch at the last vertex

    @property
    def min_depth(self):
        return self.max_depth // 2


def _permute_carry(carry, perm):
    """Apply a lane permutation to every leaf of the carry with TWO
    gathers instead of one per leaf: float leaves are packed into one
    [N, Cf] buffer and integer/bool leaves into one [N, Ci] u32
    buffer, each gathered once, then sliced back.  On TPU every gather
    costs a full HBM round trip on the wavefront, so the per-leaf
    tree.map permute dominated the compaction step."""
    leaves, treedef = jax.tree.flatten(carry)
    fparts, iparts, spec = [], [], []
    fofs = iofs = 0
    for x in leaves:
        x2 = x.reshape(x.shape[0], -1)
        w = x2.shape[1]
        if jnp.issubdtype(x.dtype, jnp.floating):
            spec.append(("f", fofs, w, x.shape, x.dtype))
            fparts.append(x2.astype(jnp.float32))
            fofs += w
        else:
            spec.append(("i", iofs, w, x.shape, x.dtype))
            iparts.append(x2.astype(jnp.uint32))
            iofs += w
    # the packed two-gather permute only pays on TPU (per-gather fixed
    # cost); on CPU the concat/slice round trip slows the reverse-mode
    # test path down instead — keep the per-leaf permute there
    if jax.default_backend() == "cpu":
        return jax.tree.map(lambda a: a[perm], carry)
    fbuf = jnp.concatenate(fparts, 1)[perm] if fparts else None
    ibuf = jnp.concatenate(iparts, 1)[perm] if iparts else None
    out = []
    for kind, ofs, w, shape, dtype in spec:
        buf = fbuf if kind == "f" else ibuf
        piece = buf[:, ofs:ofs + w]
        if dtype == jnp.bool_:
            piece = piece != 0
        else:
            piece = piece.astype(dtype)
        out.append(piece.reshape(shape))
    return jax.tree.unflatten(treedef, out)


def _compact_perm(alive):
    """Stable alive-first permutation + live count.

    Dead lanes are moved to the back of the wave so the cluster
    intersector can skip whole ray tiles past n_alive (the TPU
    equivalent of the reference's per-ray early loop exit,
    pt.rs:97-101).  A cumsum-scatter builds the permutation without a
    sort; the per-ray counter-based sampler makes reordering free
    (keys travel with the lanes)."""
    n = alive.shape[0]
    ai = alive.astype(jnp.int32)
    n_alive = jnp.sum(ai)
    pos_alive = jnp.cumsum(ai) - 1
    pos_dead = n_alive + jnp.cumsum(1 - ai) - 1
    dst = jnp.where(alive, pos_alive, pos_dead)
    perm = jnp.zeros((n,), jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, n_alive


def _mega_eligible(scene: sc.SceneData, config: RenderConfig):
    """Host-static eligibility of the fused bounce-shade kernel
    (render/pallas_bounce.py).  Returns (ok, full_phi_spheres)."""
    import numpy as np
    from arendur_tpu.bxdf import pallas_shade as psh
    if not psh.use_pallas_shade():
        return False, False
    if config.textures is not None:
        # textured scenes ride the hybrid-split component path
        # (hit kernel -> XLA texel gathers -> shade kernel); only the
        # component kernels implement it
        from arendur_tpu.render import cbounce as _cb
        if not (_cb.enabled() and _cb.eligible(scene)):
            return False, False
    # instanced meshes ARE eligible: intersect_raw resolves the winning
    # instance and bakes its transform into a world-space trow, which
    # the kernel's shading-info construction consumes verbatim (a
    # pure-instanced scene has no world pool at all)
    if scene.tri_cw is None and not getattr(scene, "inst", ()):
        return False, False
    if not sc._use_pallas_intersect():
        return False, False
    try:
        letex = np.asarray(scene.lights.emission_tex) \
            if scene.lights.emission_tex is not None else None
        if letex is not None and (letex >= 0).any():
            return False, False
        # the phi clip uses the shared polynomial atan2 (Mosaic-safe);
        # full-phi sphere lights just skip it statically
        lt = np.asarray(scene.lights.ltype)
        prim = np.asarray(scene.lights.prim)
        phimax = np.asarray(scene.spheres.phimax)
        sl_rows = lt == sc.L_AREA_SPHERE
        full_phi = True
        if sl_rows.any():
            p = np.clip(prim[sl_rows], 0, len(phimax) - 1)
            full_phi = bool((phimax[p] >= 2.0 * np.pi - 1e-5).all())
        return True, full_phi
    except Exception:           # traced leaves: cannot decide -> no
        return False, False


def trace_wave(scene: sc.SceneData, camera: cam.CameraData,
               config: RenderConfig, pixel_xy, pixel_id, sample_id,
               base_key, return_aux: bool = False):
    """Trace one wave of rays; returns (pfilm [N,2], L [N,3]).

    pixel_xy: [N,2] integer pixel coords (float); pixel_id/sample_id:
    [N] int32 for the stateless sampler.
    return_aux: additionally return {"n_invalid": scalar} — the count
    of lanes whose radiance was dropped as invalid (the wavefront
    analogue of the reference's per-sample warn, pt.rs:152-156).
    """
    from arendur_tpu.geometry.vec import as_jax
    # host-static checks BEFORE as_jax: inside a trace, converted
    # leaves become tracers and np.asarray on them throws
    use_mega, mega_full_phi = _mega_eligible(scene, config)
    use_cbounce = False
    if use_mega:
        from arendur_tpu.render import cbounce as _cb
        use_cbounce = _cb.eligible(scene)
        from arendur_tpu import materials as _mats
        mega_presence = _mats.slot_presence(scene.materials)
        mega_dists = _mats.dist_presence(scene.materials)
        # bake the packed light table + its column map HERE, from the
        # NumPy scene: inside the trace light_pack cannot host-check
        # the light types (tracer leaves) and would emit a DIFFERENT
        # column layout than the one compiled into the kernel
        mega_pk, _cidx, mega_lpresent = sc.light_pack(scene)
        mega_lcidx = tuple(sorted(_cidx.items()))
        mega_emi = tuple(_cidx["emission"])
    # host-static texture-channel presence MUST be derived before
    # as_jax: each unused channel skipped saves its per-bounce
    # gathers (~4-8 ms of descriptor-bound DMA each on the wavefront)
    tex_present = mats.tex_channel_presence(scene.materials)
    scene = as_jax(scene)
    ws = smp.WaveSampler(base_key, pixel_id, sample_id,
                         kind=config.sampler,
                         sobol_table=config.sobol_table,
                         sample_dx=config.sample_dx,
                         sample_dy=config.sample_dy)
    pfilm = pixel_xy + ws.film_jitter()
    plens = ws.u2(2)
    if config.textures is not None:
        # ray-cone texture LOD: angular spread from the camera's x/y
        # differential rays, scaled by 1/sqrt(spp) like the reference's
        # scale_differentials (pt.rs:142)
        from arendur_tpu.geometry.vec import length
        from arendur_tpu.geometry import dxy as dxymod
        o, d, rxd, ryd = cam.generate_ray_differentials(
            camera, pfilm, plens)
        spread = jnp.maximum(length(rxd - d), length(ryd - d))
        spread = spread / jnp.sqrt(jnp.float32(max(config.spp, 1)))
    else:
        o, d = cam.generate_rays(camera, pfilm, plens)
        spread = None

    n = o.shape[0]
    # tie the carries to the (possibly mesh-varying) ray arrays so the
    # bounce scan type-checks under shard_map's varying-axes analysis
    L = jnp.zeros((n, 3), jnp.float32) + o * 0.0
    beta = jnp.ones((n, 3), jnp.float32) + o * 0.0
    alive = o[:, 0] == o[:, 0]
    specular = o[:, 0] != o[:, 0]

    # per-lane sampler state travels with the lane under compaction
    sampler_is_sobol = config.sampler == "sobol"

    # strata kind: every bounce dimension is per-pixel stratified over
    # the spp samples via a stateless Kensler shuffle (the reference
    # pre-stratifies ndim dims per pixel with per-dim shuffles,
    # strata.rs:49-80; non-power-of-two spp falls back to independent
    # uniforms, equal in expectation)
    grid_ok = config.sample_dx * config.sample_dy == config.spp

    def draw1(st, dim):
        if sampler_is_sobol:
            from arendur_tpu.sampling.sobol import sobol_uniform
            return sobol_uniform(config.sobol_table, base_key,
                                 st["pid"], st["sid"], dim)
        if config.sampler == "uniform":
            return smp.uniform_1d(st["keys"], dim)
        return smp.stratified_1d(st["keys"], config.spp, dim)

    def draw2(st, dim):
        if sampler_is_sobol:
            from arendur_tpu.sampling.sobol import sobol_uniform_2d
            return sobol_uniform_2d(config.sobol_table, base_key,
                                    st["pid"], st["sid"], dim)
        if grid_ok and config.sampler != "uniform":
            return smp.stratified_2d(st["keys"], config.sample_dx,
                                     config.sample_dy, dim)
        return smp.uniform_2d(st["keys"], dim)

    def bounce_step(bounce, carry):
        """One path-tracing bounce; `bounce` may be a traced scalar.

        sel_prev/wb_prev/nee_prev carry the previous vertex's deferred
        MIS bsdf-branch (nee.path_mis_weight): the continuation ray IS
        the MIS bsdf sample, so hitting the previously-selected light
        here collects the bsdf-branch term without the reference's
        third full scene query per bounce (scene.rs:146-155)."""
        # compact dead lanes to the back so the cluster kernel skips
        # their ray tiles entirely (identity at bounce 0)
        if config.compact:
            perm, n_alive = _compact_perm(carry["alive"])
            carry = _permute_carry(carry, perm)
        else:
            n_alive = None
        (o, d, L, beta, alive, specular, cone_w, sel_prev, wb_prev,
         nee_prev, st) = (carry["o"], carry["d"], carry["L"],
                          carry["beta"], carry["alive"],
                          carry["specular"], carry["cone_w"],
                          carry["sel_prev"], carry["wb_prev"],
                          carry["nee_prev"], carry["st"])
        cone_g = carry["cone_g"]

        def curv_spread(is_sph, s_idx, w_at_hit, spec_bounce):
            """Curvature growth of the cone spread at a specular
            bounce: gamma' = gamma + 2*kappa*w (ray-cones rule;
            kappa = 1/r on spheres, 0 on flat triangles).  |kappa| is
            used for both reflection and refraction — a conservative
            (never-undersampling) bound where the reference's
            spawn_ray_differential is exact."""
            if spread is None or not config.cone_curvature:
                return cone_g
            radius = jnp.asarray(scene.spheres.radius)
            if radius.shape[0] == 0:
                return cone_g
            kappa = jnp.where(is_sph, 1.0 /
                              jnp.maximum(radius[s_idx], 1e-6), 0.0)
            return cone_g + jnp.where(spec_bounce,
                                      2.0 * kappa * w_at_hit, 0.0)
        dim0 = smp.BOUNCE_DIM_BASE + bounce * smp.DIMS_PER_BOUNCE
        # named phases mirror the reference's flame spans
        # ("pt rendering" / "pt light calculation" / "pt add sample",
        # pt.rs:129-157); they label the HLO ops for jax.profiler
        if use_mega:
            # fused bounce shade: hit-info + steps (2)-(5) in ONE
            # Pallas launch (render/pallas_bounce.py); only the
            # closest-hit kernel, one triangle-row gather, the shadow
            # any-hit query and one masked add remain outside
            from arendur_tpu.render import pallas_bounce as pb
            with jax.named_scope("pt_intersect"):
                raw = sc.intersect_raw(scene, o, d, n_alive=n_alive)
            dim0_ = smp.BOUNCE_DIM_BASE + bounce * smp.DIMS_PER_BOUNCE
            u_sel = draw1(st, dim0_ + smp.DIM_LIGHT_SELECT)
            u_light = draw2(st, dim0_ + smp.DIM_LIGHT_U)
            u_bsdf = draw2(st, dim0_ + smp.DIM_BSDF_U)
            u_rr = draw1(st, dim0_ + smp.DIM_RR)
            lidx, selpdf = nee.sample_one_light(scene, u_sel)
            zb = o[:, 0] * 0.0
            f1 = lambda a: a.astype(jnp.float32)[:, None]
            b1 = lambda m: jnp.where(m, 1.0, 0.0)[:, None]
            bounce_f = (bounce.astype(jnp.float32)
                        if hasattr(bounce, "astype") else float(bounce))
            from arendur_tpu.shapes import sphere as sphmod
            ltab = jnp.asarray(mega_pk)
            mtab = mats.param_table(scene.materials)
            stab = sphmod.shade_table(scene.spheres)
            if config.textures is not None:
                # hybrid split (VERDICT r4 item 3): hit kernel ->
                # XLA texel gathers (HBM) -> shade kernel
                from arendur_tpu.render import cbounce as cb
                sg = jax.lax.stop_gradient
                # the hit kernel is geometry-only (detached, DESIGN §5)
                # and defines no vjp — its whole input is detached so
                # tangent-carrying wave state (the shade kernel's
                # custom_vjp marks every output) never reaches it
                xh = sg(jnp.concatenate([
                    o, d, raw["t"][:, None],
                    b1(raw["hit"]), b1(raw["is_sphere"]),
                    f1(raw["s_idx"]), raw["p_local"], raw["trow"],
                    cone_w[:, None], cone_g[:, None],
                ], axis=1))
                with jax.named_scope("pt_shade_hit"):
                    hout = sg(cb.hit_shade_t(
                        xh.T, stab, pb.default_interpret()))
                hi = cb.unpack_hit_t(hout)
                (mtype_r, kd_r, ks_r, sigma_r, rough_r, eta_r,
                 dis_r, ns_r, dpdu_r) = mats.resolve_params(
                    scene.materials, hi["mat_id"], hi["ns"],
                    hi["ng"], hi["dpdu"], uv=hi["uv"],
                    textures=config.textures, dpdv=hi["dpdv"],
                    duvdx=hi["duvdx"], duvdy=hi["duvdy"],
                    tex_filter=config.tex_filter,
                    tex_present=tex_present)
                xs = jnp.concatenate([
                    d, hi["pos"], hi["pos_err"], hi["ng"], ns_r,
                    dpdu_r, f1(mtype_r), kd_r, ks_r,
                    sigma_r[:, None], rough_r[:, None],
                    eta_r[:, None], dis_r[:, None],
                    f1(hi["light_id"]), b1(raw["hit"]),
                    beta, L, b1(specular), f1(sel_prev),
                    wb_prev[:, None], b1(nee_prev), b1(alive),
                    f1(lidx), selpdf[:, None], u_light, u_bsdf,
                    u_rr[:, None], (zb + bounce_f)[:, None],
                ], axis=1)
                with jax.named_scope("pt_shade_mega"):
                    out_t = cb.shade_split_t(
                        xs.T, ltab, mega_presence, mega_dists,
                        mega_lcidx, mega_lpresent, mega_emi,
                        config.min_depth, float(config.rr_threshold),
                        mega_full_phi, pb.default_interpret())
                r = cb.unpack_out_t(out_t)
                with jax.named_scope("pt_light_calculation"):
                    blocked = sc.occluded(scene, r["sh_o"], r["sh_d"],
                                          r["sh_t"], n_alive=n_alive)
                L_out = r["L"] + jnp.where(
                    (r["need_shadow"] & ~blocked)[..., None],
                    r["contrib"], 0.0)
                cone_g2 = curv_spread(
                    raw["is_sphere"], raw["s_idx"], hi["cone_w"],
                    r["alive"] & r["specular"] & raw["hit"])
                return dict(o=r["o"], d=r["d"], L=L_out,
                            beta=r["beta"], alive=r["alive"],
                            specular=r["specular"], cone_w=hi["cone_w"],
                            cone_g=cone_g2,
                            sel_prev=r["sel_prev"],
                            wb_prev=r["wb_prev"],
                            nee_prev=r["nee_prev"], st=st)
            x = jnp.concatenate([
                o, d, raw["t"][:, None],
                b1(raw["hit"]), b1(raw["is_sphere"]), f1(raw["s_idx"]),
                raw["p_local"], raw["trow"],
                beta, L, b1(specular), f1(sel_prev),
                wb_prev[:, None], b1(nee_prev), b1(alive),
                f1(lidx), selpdf[:, None], u_light, u_bsdf,
                u_rr[:, None], (zb + bounce_f)[:, None],
            ], axis=1)
            if use_cbounce:
                # component-form (lane-transposed) kernel: full vreg
                # occupancy on every vector op (render/cbounce.py)
                from arendur_tpu.render import cbounce as cb
                with jax.named_scope("pt_shade_mega"):
                    out_t = cb.bounce_shade_t(
                        x.T, ltab, mtab, stab, mega_presence,
                        mega_dists, mega_lcidx, mega_lpresent,
                        mega_emi, config.min_depth,
                        float(config.rr_threshold), mega_full_phi,
                        pb.default_interpret())
                r = cb.unpack_out_t(out_t)
            else:
                with jax.named_scope("pt_shade_mega"):
                    out = pb.bounce_shade(
                        x, ltab, mtab, stab, mega_presence, mega_dists,
                        mega_lcidx, mega_lpresent, mega_emi,
                        config.min_depth, float(config.rr_threshold),
                        mega_full_phi, pb.default_interpret())
                r = pb.unpack_out(out)
            with jax.named_scope("pt_light_calculation"):
                blocked = sc.occluded(scene, r["sh_o"], r["sh_d"],
                                      r["sh_t"], n_alive=n_alive)
            L_out = r["L"] + jnp.where(
                (r["need_shadow"] & ~blocked)[..., None],
                r["contrib"], 0.0)
            return dict(o=r["o"], d=r["d"], L=L_out, beta=r["beta"],
                        alive=r["alive"], specular=r["specular"],
                        cone_w=cone_w, cone_g=cone_g,
                        sel_prev=r["sel_prev"],
                        wb_prev=r["wb_prev"], nee_prev=r["nee_prev"],
                        st=st)

        with jax.named_scope("pt_intersect"):
            hit = sc.intersect(scene, o, d, n_alive=n_alive)
        lane_active = alive & hit.hit

        # (2) emitted radiance (ref: pt.rs:72-78; le() via the
        # primitive's lighting profile, interaction.rs:254-261 —
        # evaluate_path returns the emission texture irrespective of
        # orientation for constant profiles).  Weight = 1 for camera
        # hits and specular continuations (pt.rs:72-78) plus the
        # deferred MIS bsdf-branch weight when this vertex is the light
        # NEE selected at the previous vertex (scene.rs:146-157; for a
        # mixed specular+non-specular bsdf both terms apply, exactly as
        # in the reference, which runs both code paths).
        emit_gate = lane_active & (hit.light_id >= 0)
        w_emit = jnp.where((bounce == 0) | specular, 1.0, 0.0) \
            + jnp.where(nee_prev & (hit.light_id == sel_prev),
                        wb_prev, 0.0)
        le = sc.light_emission(scene.lights, hit.light_id, hit.uv,
                               config.textures)
        L = L + jnp.where(emit_gate[..., None], w_emit[..., None]
                          * beta * le, 0.0)

        # (3) scattering + NEE
        wo = -d
        if spread is not None:
            from arendur_tpu.geometry import dxy as dxymod
            ft = jnp.where(hit.hit, hit.t, 0.0)
            r_cone = cone_w + cone_g * ft
            duvdx, duvdy = dxymod.cone_duv(
                r_cone, d, hit.ng, hit.dpdu, hit.dpdv)
            cone_w = jnp.where(hit.hit, r_cone, cone_w)
        else:
            duvdx = duvdy = None
        bsdf = mats.compute_scattering(
            scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu,
            uv=hit.uv, textures=config.textures, dpdv=hit.dpdv,
            duvdx=duvdx, duvdy=duvdy, tex_filter=config.tex_filter,
            tex_present=tex_present)
        # NEE runs when any slot matches non-specular tags
        # (ref: pt.rs:85-91; note FresnelBxdf *does* match because its
        # kind includes R|T bits)
        do_nee = lane_active & (sl.match_count(bsdf, ALL_NON_SPECULAR) > 0)
        u_sel = draw1(st, dim0 + smp.DIM_LIGHT_SELECT)
        u_light = draw2(st, dim0 + smp.DIM_LIGHT_U)
        with jax.named_scope("pt_light_calculation"):
            direct, lidx, selpdf = nee.uniform_sample_one_light(
                scene, hit, bsdf, wo, u_sel, u_light, n_alive=n_alive,
                textures=config.textures)
        L = L + jnp.where(do_nee[..., None], beta * direct, 0.0)

        # (4) bsdf sample for path continuation (ref: pt.rs:92-103);
        # it doubles as the MIS bsdf-branch sample (path_mis_weight)
        u_bsdf = draw2(st, dim0 + smp.DIM_BSDF_U)
        # Pallas mega-kernel on TPU (one launch replaces the slot
        # sample sweep's few hundred fixed-cost ops), XLA elsewhere
        from arendur_tpu.bxdf import pallas_shade as psh
        f, wi, pdf, kind = psh.dispatch_sample(bsdf, wo, u_bsdf, ALL)
        cont = lane_active & ~spec.is_black(f) & (pdf > 0.0)
        specular = jnp.where(lane_active, (kind & SPECULAR) != 0,
                             specular)
        wb = nee.path_mis_weight(scene, lidx, selpdf, hit.pos, wi, pdf,
                                 kind, f)
        sel_prev = jnp.where(lane_active, lidx, sel_prev)
        wb_prev = jnp.where(lane_active, wb, wb_prev)
        nee_prev = do_nee
        # NaN-free reverse-mode: the cos/pdf ratio can overflow f32 on
        # degenerate samples; masking the PRODUCT after the fact leaves
        # an inf primal inside the multiply, whose backward emits
        # 0 * inf = NaN into beta's cotangent (this was the round-1
        # "non-finite gradient" — pre-mask the ratio instead and kill
        # the lane exactly as the old inf path did).
        ratio = jnp.abs(dot(wi, bsdf.ns)) / jnp.maximum(pdf, 1e-20)
        overflow = ratio > 1e12
        cont = cont & ~overflow
        ratio = jnp.where(cont, jnp.minimum(ratio, 1e12), 0.0)
        new_beta = beta * f * ratio[..., None]
        beta_ok = spec.valid(new_beta)
        beta = jnp.where((cont & beta_ok)[..., None], new_beta, beta)
        alive = lane_active & cont & beta_ok

        o = sc.offset_ray_origin(hit.pos, hit.pos_err, hit.ng, wi)
        # dead lanes may carry a zero direction (e.g. TIR); give them a
        # unit fallback so the next intersection pass stays finite
        degenerate = (wi[..., 0]**2 + wi[..., 1]**2 + wi[..., 2]**2) < 1e-12
        d = jnp.where(degenerate[..., None],
                      jnp.asarray([0.0, 0.0, 1.0]), wi)
        alive = alive & ~degenerate

        # (5) russian roulette (ref: pt.rs:117-122)
        lum = spec.luminance(beta)
        q = max(config.rr_threshold, 0.05)
        u_rr = draw1(st, dim0 + smp.DIM_RR)
        rr_active = (bounce + 1) >= config.min_depth
        roulette = rr_active & (lum < config.rr_threshold)
        killed = roulette & (u_rr < q)
        beta = jnp.where((roulette & ~killed)[..., None],
                         beta / (1.0 - q), beta)
        alive = alive & ~killed
        if spread is not None:
            is_sph_h = hit.hit & (hit.prim >= scene.n_tris)
            s_idx_h = jnp.maximum(hit.prim - scene.n_tris, 0)
            cone_g = curv_spread(
                is_sph_h, s_idx_h, cone_w,
                alive & ((kind & SPECULAR) != 0))
        return dict(o=o, d=d, L=L, beta=beta, alive=alive,
                    specular=specular, cone_w=cone_w, cone_g=cone_g,
                    sel_prev=sel_prev, wb_prev=wb_prev,
                    nee_prev=nee_prev, st=st)

    zf = o[:, 0] * 0.0
    zi = zf.astype(jnp.int32)
    st = dict(keys=ws.keys, pid=pixel_id + zi, sid=sample_id + zi,
              orig=jnp.arange(n, dtype=jnp.int32) + zi)
    carry = dict(o=o, d=d, L=L, beta=beta, alive=alive,
                 specular=specular, cone_w=zf + 0.0,
                 cone_g=(zf + spread if spread is not None
                         else zf + 0.0),
                 sel_prev=zi + 0,
                 wb_prev=zf + 0.0, nee_prev=o[:, 0] != o[:, 0], st=st)
    if config.unroll_bounces:
        for bounce in range(config.max_depth):
            carry = bounce_step(bounce, carry)
    else:
        def scan_body(carry, bounce):
            return bounce_step(bounce, carry), None

        carry, _ = jax.lax.scan(
            scan_body, carry,
            jnp.arange(config.max_depth, dtype=jnp.int32))

    # final deferred-MIS collection: the reference's evaluate_direct at
    # the LAST vertex still runs its bsdf-branch re-intersection
    # (scene.rs:146-155) even though the continuation ray is never
    # traced (pt.rs loop bound) — one extra closest-hit completes the
    # estimator.  The specular-flag emission term is NOT collected here
    # (the reference's loop exits before sampling vertex max_depth).
    need = carry["alive"] & carry["nee_prev"]
    if config.max_depth > 0 and config.defer_final_mis:
        if config.compact:
            perm, n_need = _compact_perm(need)
            carry = _permute_carry(carry, perm)
            need = need[perm]
        else:
            n_need = None
        hit_f = sc.intersect(scene, carry["o"], carry["d"],
                             n_alive=n_need)
        gate = need & hit_f.hit & (hit_f.light_id >= 0) \
            & (hit_f.light_id == carry["sel_prev"])
        le_f = sc.light_emission(scene.lights, hit_f.light_id,
                                 hit_f.uv, config.textures)
        carry["L"] = carry["L"] + jnp.where(
            gate[..., None], carry["wb_prev"][..., None]
            * carry["beta"] * le_f, 0.0)

    # restore the original lane order (compaction permuted the wave)
    L = jnp.zeros((n, 3), jnp.float32).at[carry["st"]["orig"]].set(
        carry["L"])

    # invalid radiance becomes black, as the renderer does before
    # add_sample (pt.rs:152-156)
    if return_aux:
        n_invalid = jnp.sum((~spec.valid(L)).astype(jnp.int32))
        return pfilm, spec.sanitize(L), {"n_invalid": n_invalid}
    return pfilm, spec.sanitize(L)


def render(scene: sc.SceneData, camera: cam.CameraData,
           film_cfg: flm.FilmConfig, config: RenderConfig,
           checkpoint_path: str = None, checkpoint_every: int = 0,
           progress: bool = False):
    """Full render: iterate waves over (pixels x spp), splat to film,
    finalize.  Returns the [H, W, 3] image.

    checkpoint_path: if set, resume from the file when it exists and
    save the film + cursor there every `checkpoint_every` waves (and at
    the end).  The counter-based sampler makes the resumed render
    bit-identical to an uninterrupted one (utils.py: the TPU analogue
    of Sampler::set_sample_index, sample/mod.rs:93).
    progress: log per-wave progress + invalid-sample warnings
    (mirroring the reference's info/warn logging, pt.rs:75,99,130).
    """
    from arendur_tpu import utils
    w, h = film_cfg.resolution
    spp = config.spp
    base_key = smp.make_base_key(config.seed)

    total = w * h * spp
    wave = min(config.wave_size, total)
    # scatter-free splat needs pixel-major waves of whole pixels that
    # tile the frame exactly; otherwise fall back to the scatter splat
    dense = (wave % spp == 0) and (total % wave == 0)
    state = flm.film_init(film_cfg, padded=dense)
    start_wave = 0
    n_waves = (total + wave - 1) // wave
    if checkpoint_path:
        ck = utils.load_checkpoint(checkpoint_path)
        if ck is not None:
            st, next_ray, seed, meta = ck
            if seed == config.seed and meta.get("wave") == wave \
                    and st.rgb.shape == state.rgb.shape:
                state, start_wave = st, next_ray // wave
                utils.log.info("resumed at wave %d/%d from %s",
                               start_wave, n_waves, checkpoint_path)

    @jax.jit
    def run_wave(state, ray_idx):
        pixel_id = ray_idx // spp
        sample_id = ray_idx % spp
        px = (pixel_id % w).astype(jnp.float32)
        py = (pixel_id // w).astype(jnp.float32)
        pixel_xy = jnp.stack([px, py], -1)
        valid = ray_idx < total
        pfilm, L, aux = trace_wave(scene, camera, config, pixel_xy,
                                   pixel_id.astype(jnp.int32),
                                   sample_id.astype(jnp.int32),
                                   base_key, return_aux=True)
        if dense:
            state = flm.film_splat_pixmajor(
                film_cfg, state, pfilm - pixel_xy, L,
                ray_idx[0] // spp, spp, mask=valid)
        else:
            state = flm.film_splat(film_cfg, state, pfilm, L, mask=valid)
        return state, aux["n_invalid"]

    run_wave_c = None
    for i in range(start_wave, n_waves):
        ray_idx = i * wave + jnp.arange(wave, dtype=jnp.int32)
        if run_wave_c is None:
            # raised scoped-VMEM budget for the pallas shade kernels
            run_wave_c = utils.compile_tpu(run_wave, state, ray_idx)
        with utils.profile_phase("pt rendering"):
            state, n_invalid = run_wave_c(state, ray_idx)
        if progress:
            ni = int(n_invalid)
            if ni:
                # ref: pt.rs:152-156 warns per invalid sample
                utils.log.warning("wave %d: dropped %d invalid "
                                  "radiance samples", i, ni)
            utils.log.info("wave %d/%d done", i + 1, n_waves)
        if checkpoint_path and checkpoint_every \
                and (i + 1) % checkpoint_every == 0:
            utils.save_checkpoint(checkpoint_path, state,
                                  (i + 1) * wave, config.seed,
                                  meta={"wave": wave})
    if checkpoint_path:
        utils.save_checkpoint(checkpoint_path, state, n_waves * wave,
                              config.seed, meta={"wave": wave})
    with utils.profile_phase("pt add sample"):
        return flm.film_finalize(state, film_cfg)
