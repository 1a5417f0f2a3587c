"""JSON scene description, schema-compatible with the reference CLI
(ref: examples/arencli.rs:206-509, e.g. examples/cornellbox/cb.json).

parse_scene(path) returns (SceneData, CameraData, FilmConfig,
RenderConfig, outputfilename).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from arendur_tpu import scene as sc
from arendur_tpu import materials as mats
from arendur_tpu.filming import camera as cam
from arendur_tpu.filming import film as flm
from arendur_tpu.sampling import filters as filt
from arendur_tpu.render.integrator import RenderConfig
from arendur_tpu.io.objloader import load_obj_into


def _mat4(obj) -> np.ndarray:
    """JSON matrix: list of 4 columns, or {x,y,z,w} columns."""
    if obj is None:
        return np.eye(4, dtype=np.float32)
    if isinstance(obj, dict):
        rows = [obj["x"], obj["y"], obj["z"], obj["w"]]
    else:
        rows = obj
    return np.asarray(rows, np.float32)


def _rgb(obj) -> Tuple[float, float, float]:
    if isinstance(obj, dict):
        inner = obj.get("inner", obj)
        return tuple(float(x) for x in inner)
    return tuple(float(x) for x in obj)


def _const_rgb_texture(desc) -> Optional[Tuple[float, float, float]]:
    """Extract a Constant RGB texture value from a texture desc."""
    if desc is None:
        return None
    if "Constant" in desc:
        return _rgb(desc["Constant"]["value"])
    raise NotImplementedError(
        f"texture desc {list(desc.keys())} not yet supported")


def _const_gray_texture(desc, default=0.0) -> float:
    if desc is None:
        return default
    if "Constant" in desc:
        return float(desc["Constant"]["value"])
    raise NotImplementedError(
        f"texture desc {list(desc.keys())} not yet supported")


class _Named:
    """Named<T> dedup helper (ref: arencli.rs:235-255)."""

    def __init__(self):
        self.values: Dict[str, object] = {}

    def resolve(self, named, build):
        name = named["name"]
        value = named.get("value")
        if value is not None:
            self.values[name] = build(value)
        return self.values.get(name)


def _material_row(desc) -> dict:
    (kind, body), = desc.items()
    if kind == "Matte":
        kd_named = body["kd"]
        sigma_named = body["sigma"]
        return dict(
            mtype=mats.M_MATTE,
            kd=_const_rgb_texture(kd_named.get("value")) or (0, 0, 0),
            sigma=_const_gray_texture(sigma_named.get("value"), 0.0))
    if kind == "Plastic":
        return dict(
            mtype=mats.M_PLASTIC,
            kd=_const_rgb_texture(body["diffuse"].get("value")) or (0, 0, 0),
            ks=_const_rgb_texture(body["specular"].get("value")) or (0, 0, 0),
            roughness=_const_gray_texture(
                body["roughness"].get("value"), 0.5))
    if kind == "Glass":
        return dict(
            mtype=mats.M_GLASS,
            kd=_const_rgb_texture(body["diffuse"].get("value")) or (0, 0, 0),
            ks=_const_rgb_texture(body["specular"].get("value")) or (0, 0, 0),
            roughness=_const_gray_texture(
                body["roughness"].get("value"), 0.0),
            eta=float(body.get("eta", 1.5)))
    if kind == "Translucent":
        return dict(
            mtype=mats.M_TRANSLUCENT,
            kd=_const_rgb_texture(body["diffuse"].get("value")) or (0, 0, 0),
            ks=_const_rgb_texture(body["specular"].get("value")) or (0, 0, 0),
            roughness=_const_gray_texture(
                body["roughness"].get("value"), 0.5),
            dissolve=float(body.get("dissolve", 1.0)))
    raise ValueError(f"unknown material kind {kind}")


def parse_scene(path: str, spp_override: Optional[int] = None,
                resolution_override=None):
    with open(path) as f:
        desc = json.load(f)
    base = os.path.dirname(os.path.abspath(path))

    builder = sc.SceneBuilder()
    named_mats = _Named()
    mat_ids: Dict[str, int] = {}
    named_lights = _Named()
    # spheres registered by component name for "Transformed" instancing
    sphere_specs: Dict[str, dict] = {}

    for light in desc.get("lights", []):
        (kind, body), = light.items()
        if kind == "Point":
            builder.add_point_light(body["position"], _rgb(body["intensity"]))
        elif kind == "Spot":
            builder.add_spot_light(
                body["position"], body.get("direction", (0, 0, 1)),
                _rgb(body["intensity"]),
                float(body.get("cos_total", 0.5)),
                float(body.get("cos_falloff", 0.8)))
        elif kind == "Distant":
            builder.add_distant_light(
                body.get("direction", (0, 0, 1)), _rgb(body["radiance"]))

    for comp in desc.get("components", []):
        name = comp["name"]
        value = comp.get("value")
        if value is None:
            continue
        (kind, body), = value.items()
        if kind == "Mesh":
            fname = body["filename"]
            if not os.path.isabs(fname) and not os.path.exists(fname):
                # the reference resolves relative to the CWD; fall back
                # to the scene file's directory
                for cand in (os.path.join(base, fname),
                             os.path.join(base, os.path.basename(fname))):
                    if os.path.exists(cand):
                        fname = cand
                        break
            transform = _mat4(body.get("transform"))
            load_obj_into(builder, fname, transform=transform)
        elif kind == "Shaped":
            shape = body["shape"]
            (sk, sphere), = shape.items()
            assert sk == "Sphere", f"unsupported shape {sk}"
            mat_named = body["material"]
            mname = mat_named["name"]
            if mat_named.get("value") is not None or mname not in mat_ids:
                row = named_mats.resolve(mat_named, _material_row)
                if mname not in mat_ids:
                    mat_ids[mname] = builder.add_material(**row)
            mat_id = mat_ids[mname]
            light_named = body.get("light")
            emission = None
            if light_named is not None:
                emission = named_lights.resolve(
                    light_named, lambda v: _const_rgb_texture(v))
            transform = _mat4(body.get("transform"))
            spec = dict(radius=float(sphere["radius"]),
                        zmin=float(sphere["zmin"]),
                        zmax=float(sphere["zmax"]),
                        phimax=float(sphere["phimax"]),
                        mat_id=mat_id, emission=emission)
            sphere_specs[name] = dict(spec=spec, transform=transform)
            builder.add_sphere(
                spec["radius"], spec["zmin"], spec["zmax"],
                spec["phimax"], mat_id, transform=transform,
                emission=emission)
        elif kind == "Transformed":
            orig = sphere_specs.get(body["original"])
            if orig is None:
                continue
            t = _mat4(body["transform"])
            # outer transform applies after the original's own
            composed = orig["transform"] @ t
            s = orig["spec"]
            builder.add_sphere(
                s["radius"], s["zmin"], s["zmax"], s["phimax"],
                s["mat_id"], transform=composed, emission=s["emission"])

    scene = builder.build()

    cam_desc = desc["camera"]
    film_desc = cam_desc["film"]
    res = (int(film_desc["resolution"]["x"]),
           int(film_desc["resolution"]["y"]))
    if resolution_override is not None:
        res = tuple(resolution_override)
    fr = film_desc.get("filter_radius", {"x": 4.0, "y": 4.0})
    film_cfg = flm.FilmConfig(
        resolution=res,
        filter=filt.FilterSpec(
            kind="lanczos", radius=(float(fr["x"]), float(fr["y"])),
            tau=3.0))
    camera = cam.make_perspective(
        parent_view=_mat4(cam_desc.get("transform")),
        screen_min=(cam_desc["screen"]["pmin"]["x"],
                    cam_desc["screen"]["pmin"]["y"]),
        screen_max=(cam_desc["screen"]["pmax"]["x"],
                    cam_desc["screen"]["pmax"]["y"]),
        znear=float(cam_desc.get("znear", 0.1)),
        zfar=float(cam_desc.get("zfar", 1000.0)),
        fov=float(cam_desc.get("fov", 1.0)),
        lens=cam_desc.get("lens"),
        resolution=res)

    sampler_desc = desc.get("sampler", {})
    dx = int(sampler_desc.get("sampledx", 4))
    dy = int(sampler_desc.get("sampledy", 4))
    spp = dx * dy
    if spp_override is not None:
        spp = spp_override
        dx = max(1, int(np.sqrt(spp)))
        dy = max(1, spp // dx)
    config = RenderConfig(
        max_depth=int(desc.get("max_depth", 8)),
        spp=spp, sample_dx=dx, sample_dy=dy)
    return scene, camera, film_cfg, config, desc.get(
        "outputfilename", "out.png")
