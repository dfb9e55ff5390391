"""Scene loader coverage: all shipped scenes parse; error paths are clean."""

import glob
import os

import pytest

from mcray_tpu.scene.loader import load_scene
from mcray_tpu.scene.compile import compile_scene

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(ASSETS, "**", "*.scene"), recursive=True))
)
def test_all_shipped_scenes_parse(path):
    spec = load_scene(path)
    assert spec.materials and spec.meshes
    assert spec.starting_material in spec.material_names
    # every mesh references known materials
    for m in spec.meshes:
        assert m.material in spec.material_names
        assert m.outside_material in spec.material_names


def test_legacy_ircad11_lenient_fields():
    # the reference crashes on this scene (missing shininess/thickness,
    # SURVEY.md §3.5); we default them to 0
    spec = load_scene(os.path.join(ASSETS, "ircad11", "ircad11.scene"))
    assert all(m.shininess == 0.0 and m.thickness == 0.0 for m in spec.materials)


def test_unknown_material_rejected(tmp_path):
    import json

    bad = {
        "transducerPosition": [0, 0, 0],
        "origin": [0, 0, 0],
        "spacing": [1, 1, 1],
        "scaling": 1.0,
        "startingMaterial": "GEL",
        "materials": [{"name": "GEL", "impedance": 1.0, "attenuation": 0.1,
                       "mu0": 0, "mu1": 0, "sigma": 0, "specularity": 1}],
        "meshes": [{"file": "x.obj", "rigid": True, "vascular": False,
                    "deltas": [0, 0, 0], "material": "MISSING",
                    "outsideMaterial": "GEL", "outsideNormals": True}],
    }
    p = tmp_path / "bad.scene"
    p.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="unknown material"):
        load_scene(str(p))


def test_missing_mesh_asset_raises(tmp_path):
    import json

    cfgd = {
        "transducerPosition": [0, 0, 0],
        "origin": [0, 0, 0],
        "spacing": [1, 1, 1],
        "scaling": 1.0,
        "startingMaterial": "GEL",
        "materials": [{"name": "GEL", "impedance": 1.0, "attenuation": 0.1,
                       "mu0": 0, "mu1": 0, "sigma": 0, "specularity": 1}],
        "meshes": [{"file": "nonexistent_mesh.obj", "rigid": True, "vascular": False,
                    "deltas": [0, 0, 0], "material": "GEL",
                    "outsideMaterial": "GEL", "outsideNormals": True}],
    }
    p = tmp_path / "s.scene"
    p.write_text(json.dumps(cfgd))
    spec = load_scene(str(p))
    with pytest.raises(FileNotFoundError, match="generate fixtures"):
        compile_scene(spec, asset_dir=str(tmp_path))
