"""JSON scene-description parsing: named-texture dedup and Product
texture descs (ref: arencli.rs:376-440)."""

import json
import os

import numpy as np

from arendur_tpu.io import scenedesc
from arendur_tpu import materials as mats


def scene_json(tmp_path, mats_desc):
    desc = {
        "lights": [],
        "components": mats_desc,
        "sampler": {"sampledx": 2, "sampledy": 2, "ndim": 8},
        "camera": {
            "screen": {"pmin": {"x": -1, "y": -0.75},
                       "pmax": {"x": 1, "y": 0.75}},
            "film": {"resolution": {"x": 8, "y": 6}},
            "fov": 1.0,
        },
        "max_depth": 2,
        "outputfilename": "out.png",
    }
    p = os.path.join(tmp_path, "scene.json")
    with open(p, "w") as f:
        json.dump(desc, f)
    return p


def sphere_comp(name, mat_named, light=None):
    body = {
        "shape": {"Sphere": {"radius": 1.0, "zmin": -1.0, "zmax": 1.0,
                             "phimax": 6.2831853}},
        "material": mat_named,
    }
    if light is not None:
        body["light"] = light
    return {"name": name, "value": {"Shaped": body}}


class TestProductTexture:
    def test_constant_product(self, tmp_path):
        comps = [sphere_comp("a", {
            "name": "m1",
            "value": {"Matte": {
                "kd": {"name": "t_prod", "value": {"Product": {
                    "ta": "t_a", "tb": "t_b"}}},
                "sigma": {"name": "s0", "value": {"Constant": {
                    "value": 0.0}}},
            }},
        })]
        # operands must be declared first — inject via a dummy material
        pre = sphere_comp("pre", {
            "name": "m0",
            "value": {"Matte": {
                "kd": {"name": "t_a", "value": {"Constant": {
                    "value": [0.5, 0.5, 0.5]}}},
                "sigma": {"name": "s1", "value": {"Constant": {
                    "value": 0.0}}},
            }},
        })
        pre2 = sphere_comp("pre2", {
            "name": "m0b",
            "value": {"Matte": {
                "kd": {"name": "t_b", "value": {"Constant": {
                    "value": [0.4, 0.8, 1.0]}}},
                "sigma": {"name": "s2", "value": {"Constant": {
                    "value": 0.0}}},
            }},
        })
        p = scene_json(str(tmp_path), [pre, pre2] + comps)
        scene, *_ = scenedesc.parse_scene(p)
        kd = np.asarray(scene.materials.kd)
        # m1's kd is the elementwise product 0.5 * (0.4, 0.8, 1.0)
        expected = np.array([0.2, 0.4, 0.5], np.float32)
        assert any(np.allclose(row, expected) for row in kd), kd

    def test_named_reuse(self, tmp_path):
        first = sphere_comp("a", {
            "name": "mshared",
            "value": {"Matte": {
                "kd": {"name": "kd0", "value": {"Constant": {
                    "value": [0.9, 0.1, 0.2]}}},
                "sigma": {"name": "s", "value": {"Constant": {
                    "value": 0.0}}},
            }},
        })
        # second component references the material by name only
        second = sphere_comp("b", {"name": "mshared"})
        p = scene_json(str(tmp_path), [first, second])
        scene, *_ = scenedesc.parse_scene(p)
        kd = np.asarray(scene.materials.kd)
        assert any(np.allclose(row, [0.9, 0.1, 0.2]) for row in kd)
        # both spheres share one material row
        assert scene.materials.kd.shape[0] == 1
