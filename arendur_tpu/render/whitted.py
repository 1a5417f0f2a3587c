"""Whitted-style direct-lighting renderer (ref: src/renderer/whitted.rs).

Single-intersection direct lighting over *all* lights (no bounce, no
MIS — the reference's Whitted never recurses despite the depth param;
whitted.rs:42-79): at each camera hit, add emission and accumulate
f * Li * (wi.n) / pdf per light with a shadow test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arendur_tpu import scene as sc
from arendur_tpu import spectrum as spec
from arendur_tpu import materials as mats
from arendur_tpu.bxdf import slots as sl
from arendur_tpu.bxdf.types import ALL
from arendur_tpu.geometry.vec import dot
from arendur_tpu.lighting import nee
from arendur_tpu.sampling import sampler as smp
from arendur_tpu.filming import camera as cam


def whitted_wave(scene: sc.SceneData, camera: cam.CameraData, config,
                 pixel_xy, pixel_id, sample_id, base_key):
    """Trace one wave, Whitted shading.  Returns (pfilm, L)."""
    from arendur_tpu.geometry.vec import as_jax
    scene = as_jax(scene)
    keys = smp.ray_keys(base_key, pixel_id, sample_id)
    jitter = smp.stratified_film_sample(
        keys, sample_id, config.sample_dx, config.sample_dy, dim=0)
    pfilm = pixel_xy + jitter
    plens = smp.uniform_2d(keys, 2)
    o, d = cam.generate_rays(camera, pfilm, plens)

    n = o.shape[0]
    hit = sc.intersect(scene, o, d)
    wo = -d

    le = sc.light_emission(scene.lights, hit.light_id, hit.uv,
                           getattr(config, "textures", None))
    L = jnp.where((hit.hit & (hit.light_id >= 0))[..., None], le, 0.0)

    bsdf = mats.compute_scattering(
        scene.materials, hit.mat_id, hit.ns, hit.ng, hit.dpdu)

    n_lights = scene.lights.count
    for li in range(n_lights):
        lidx = jnp.full((n,), li, jnp.int32)
        u2 = smp.uniform_2d(keys, 4 + 2 * li)
        ls = nee.light_sample(scene, lidx, hit.pos, u2)
        wi = ls["wi"]
        f, _ = sl.bsdf_evaluate(bsdf, wo, wi, ALL)
        effective = hit.hit & (ls["pdf"] > 0.0) \
            & ~spec.is_black(ls["radiance"]) & ~spec.is_black(f)
        blocked = nee._occlusion_query(scene, hit, ls["pfrom"])
        contrib = (f * ls["radiance"]
                   * (dot(wi, hit.ns) / jnp.maximum(ls["pdf"], 1e-20))[
                       ..., None])
        L = L + jnp.where((effective & ~blocked)[..., None],
                          spec.sanitize(contrib), 0.0)
    return pfilm, spec.sanitize(L)
