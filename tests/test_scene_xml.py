import os
import textwrap

import numpy as np
import pytest

from mafrixraytracing_tpu.scene.compiler import compile_scene
from mafrixraytracing_tpu.scene.xml_parser import parse_scene_xml

CORNELL_STYLE_XML = """\
<Scene version="0.1">
    <Camera type="pinhole">
          <Point name="position" value="0,1,3"/>
          <Vector name="direction" value="0,0,-1"/>
          <float name="fov" value="120"/>
          <float name="aspectratio" value="1.0"/>
    </Camera>
    <Models>
        <Model type="obj" name="box">
          <string name="filename" value="box.obj"/>
        </Model>
    </Models>
    <Materials>
        <Material type="lambert">
            <color name="albedo" value="0.725,0.71,0.68"></color>
        </Material>
        <Material type="lambert">
            <color name="albedo" value="0.14,0.45,0.091"></color>
        </Material>
    </Materials>
    <Shapes>
        <Shape type="shapelist">
            <string name="obj_ref" value="box.floor"/>
            <int name="material" value="0"/>
        </Shape>
        <Shape type="shapelist">
            <string name="obj_ref" value="box.wall"/>
            <int name="material" value="1"/>
        </Shape>
    </Shapes>
    <Light type="area">
        <string name="shape_ref" value="box.light"/>
        <color name="intensity" value="10.0,10.0,10.0"/>
    </Light>
    <Film>
        <int name="width" value="300"/>
        <int name="height" value="300"/>
    </Film>
</Scene>
"""

BOX_OBJ = """\
v -1 0 1
v 1 0 1
v 1 0 -1
v -1 0 -1
v -1 2 -1
v 1 2 -1
v -0.2 1.98 -0.2
v 0.2 1.98 -0.2
v 0.2 1.98 0.2
v -0.2 1.98 0.2
g floor
f 1 2 3 4
g wall
f 4 3 6 5
g light
f 7 8 9 10
"""


@pytest.fixture
def asset_dir(tmp_path):
    with open(os.path.join(tmp_path, "box.obj"), "w") as f:
        f.write(BOX_OBJ)
    return str(tmp_path)


def test_parse_full_scene(asset_dir):
    spec = parse_scene_xml(CORNELL_STYLE_XML, asset_dir)
    assert spec.camera.position == (0.0, 1.0, 3.0)
    assert spec.camera.fov == 120.0
    assert spec.camera.fov_convention == "mafrix"
    assert len(spec.materials) == 2
    np.testing.assert_allclose(spec.materials[1].albedo, (0.14, 0.45, 0.091))
    assert len(spec.shapes) == 2
    assert spec.shapes[0].material == 0
    assert spec.shapes[1].material == 1
    assert len(spec.area_lights) == 1
    np.testing.assert_allclose(spec.area_lights[0].radiance, (10.0, 10.0, 10.0))
    # reference semantics: XML lights are sample-only (invisible geometry)
    assert spec.area_lights[0].visible is False
    assert (spec.film.width, spec.film.height) == (300, 300)


def test_compiles_to_pytree(asset_dir):
    spec = parse_scene_xml(CORNELL_STYLE_XML, asset_dir)
    cs = compile_scene(spec)
    # 2 shapes x 1 quad = 4 tris; light invisible -> not in tri set
    assert int(cs.scene.tri_mask.sum()) == 4
    assert int(cs.scene.light_mask.sum()) == 2
    np.testing.assert_allclose(float(cs.scene.light_total_area), 0.16, rtol=1e-5)
    # light faces down (+y rect wound ccw seen from below in this obj)
    assert abs(float(cs.scene.light_normal[0, 1])) == pytest.approx(1.0, abs=1e-5)


def test_version_check():
    with pytest.raises(AssertionError):
        parse_scene_xml('<Scene version="0.2"></Scene>')


def test_unknown_material_type():
    xml = textwrap.dedent(
        """\
        <Scene version="0.1">
          <Materials><Material type="velvet"/></Materials>
        </Scene>
        """
    )
    with pytest.raises(ValueError):
        parse_scene_xml(xml)


def test_glossy_material_grammar():
    """XML extension: type=\"glossy\" with a float exponent maps to the
    normalized Phong lobe (the reference's dead GlossySpecular with
    exponent control)."""
    xml = textwrap.dedent(
        """\
        <Scene version="0.1">
          <Materials>
            <Material type="glossy">
              <color name="albedo" value="0.8,0.7,0.6"/>
              <float name="exponent" value="96"/>
            </Material>
          </Materials>
        </Scene>
        """
    )
    spec = parse_scene_xml(xml)
    assert spec.materials[0].type == "glossy"
    assert spec.materials[0].exponent == 96.0
    np.testing.assert_allclose(spec.materials[0].albedo, (0.8, 0.7, 0.6))

    from mafrixraytracing_tpu.scene.compiler import compile_scene
    from mafrixraytracing_tpu.scene import spec as S

    sc = compile_scene(spec).scene
    assert sc.has_glossy
    assert int(sc.mat_type[0]) == S.MATERIAL_TYPES["glossy"]
    assert float(sc.mat_fuzz[0]) == 96.0  # exponent rides the fuzz column
