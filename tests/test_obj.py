import os
import textwrap

import numpy as np
import pytest

from mafrixraytracing_tpu.io.mtl import load_mtl
from mafrixraytracing_tpu.io.obj import load_obj

SPOT = "/root/reference/3DModel/spot/spot_triangulated_good.obj"
CUBE = "/root/reference/3DModel/Cube/Cube.obj"


def _write(tmp_path, name, content):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(textwrap.dedent(content))
    return p


def test_simple_triangle(tmp_path):
    p = _write(
        tmp_path,
        "t.obj",
        """\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f 1 2 3
        """,
    )
    m = load_obj(p)
    mesh = m.mesh()
    assert mesh.faces.shape == (1, 3)
    np.testing.assert_allclose(mesh.vertices[mesh.faces[0]], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_quad_splits_like_reference_rect(tmp_path):
    """4-vertex face -> (0,1,2) + (0,2,3), the reference Rect split
    (Core/Shape/Rect.fs:11-20)."""
    p = _write(
        tmp_path,
        "q.obj",
        """\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        f 1 2 3 4
        """,
    )
    mesh = load_obj(p).mesh()
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2], [0, 2, 3]])


def test_negative_indices(tmp_path):
    p = _write(
        tmp_path,
        "n.obj",
        """\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f -3 -2 -1
        """,
    )
    mesh = load_obj(p).mesh()
    np.testing.assert_array_equal(mesh.faces, [[0, 1, 2]])


def test_face_variants_and_groups(tmp_path):
    p = _write(
        tmp_path,
        "g.obj",
        """\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        vt 0 0
        vt 1 0
        vt 0 1
        vn 0 0 1
        g left
        f 1/1/1 2/2/1 3/3/1
        g right
        f 1//1 2//1 3//1
        """,
    )
    m = load_obj(p)
    assert set(m.groups) == {"left", "right"}
    left = m.group_mesh("left")
    assert left.face_uvs is not None and left.face_normals is not None
    right = m.group_mesh("right")
    assert right.face_uvs is None and right.face_normals is not None


def test_mtl_loading_and_kd_albedo(tmp_path):
    _write(
        tmp_path,
        "m.mtl",
        """\
        newmtl red
        Ka 0.1 0.0 0.0
        Kd 0.9 0.1 0.1
        newmtl lamp
        Kd 0.0 0.0 0.0
        Ke 5.0 5.0 5.0
        """,
    )
    p = _write(
        tmp_path,
        "m.obj",
        """\
        mtllib m.mtl
        v 0 0 0
        v 1 0 0
        v 0 1 0
        usemtl red
        f 1 2 3
        """,
    )
    m = load_obj(p)
    assert m.material_order == ["red", "lamp"]
    # Kd (not the reference's buggy Ka, Obj_Mtl.fs:195) becomes albedo
    np.testing.assert_allclose(m.materials["red"].albedo, (0.9, 0.1, 0.1))
    assert m.materials["lamp"].type == "emissive"
    assert m.group_materials("default") == ["red"]


@pytest.mark.skipif(not os.path.exists(CUBE), reason="reference assets absent")
def test_reference_cube():
    m = load_obj(CUBE)
    mesh = m.mesh()
    assert mesh.faces.shape[0] == 12  # cube = 12 tris
    assert mesh.vertices.shape[0] == 8
    # MTL alongside cube declares one material with map_Kd
    assert "Material.001" in m.materials
    assert getattr(m.materials["Material.001"], "texture_path", None) == "wall1.tif"


@pytest.mark.skipif(not os.path.exists(SPOT), reason="reference assets absent")
def test_reference_spot():
    m = load_obj(SPOT)
    mesh = m.mesh()
    assert mesh.faces.shape[0] == 5856  # SURVEY §6 scene-scale anchor
    assert mesh.vertices.shape[0] == 3225
    assert mesh.uvs is not None


def test_per_face_material_resolution(tmp_path):
    """MTL materials + per-face usemtl reach the compiled scene's tri_mat
    table (reference flow: `Models/Obj_Mtl.fs:195-217` registration +
    `Models/ObjModelLoader.fs:296-304` per-face binding)."""
    _write(
        tmp_path,
        "m.mtl",
        """\
        newmtl red
        Kd 0.9 0.1 0.1
        newmtl blue
        Kd 0.1 0.1 0.9
        """,
    )
    p = _write(
        tmp_path,
        "two.obj",
        """\
        mtllib m.mtl
        v 0 0 0
        v 1 0 0
        v 0 1 0
        v 1 1 0
        usemtl red
        f 1 2 3
        usemtl blue
        f 2 4 3
        f 1 2 4
        """,
    )
    from mafrixraytracing_tpu.scene import assets
    from mafrixraytracing_tpu.scene import spec as S
    from mafrixraytracing_tpu.scene.compiler import compile_scene

    model = load_obj(p)
    materials, textures = [], []
    face_ids, name_to_id = assets.register_model_materials(
        model, p, materials, textures
    )
    assert list(face_ids) == [name_to_id["red"], name_to_id["blue"], name_to_id["blue"]]

    sc = S.SceneSpec(
        materials=materials,
        shapes=[S.ShapeSpec(model.mesh(), 0, face_materials=face_ids)],
        area_lights=[
            S.AreaLightSpec(S.make_rect_mesh((0, 2, 0), (1, 2, 0), (1, 2, 1), (0, 2, 1)))
        ],
    )
    cs = compile_scene(sc)
    scene = cs.scene
    # every live non-emissive triangle carries its own face's material; the
    # accel build permutes triangle order, so compare matched albedos by
    # locating each source face via its v0
    import jax.numpy as jnp

    mask = np.asarray(scene.tri_mask)
    emis = np.asarray(scene.mat_type)[np.asarray(scene.tri_mat)] == 3
    mesh_rows = mask & ~emis
    albs = np.asarray(scene.mat_albedo)[np.asarray(scene.tri_mat)[mesh_rows]]
    reds = (albs[:, 0] > 0.5).sum()
    blues = (albs[:, 2] > 0.5).sum()
    assert (reds, blues) == (1, 2)


@pytest.mark.skipif(not os.path.exists(CUBE), reason="reference assets absent")
def test_cube_scene_wires_texture():
    """cube_scene loads wall1.tif into the atlas and binds it to the cube's
    MTL material (reference `Obj_Mtl.fs` map_Kd + `Core/Pipeline.fs:86-103`
    texture sampling)."""
    from mafrixraytracing_tpu.scene import assets
    from mafrixraytracing_tpu.scene.compiler import compile_scene

    sc = assets.cube_scene(64, 64)
    assert len(sc.textures) == 1  # wall1.tif decoded
    cube_mat = sc.materials[0]
    assert cube_mat.texture_id == 0
    cs = compile_scene(sc)
    scene = cs.scene
    # the atlas holds the real image (not the white fallback page)
    atlas = np.asarray(scene.tex_atlas)
    assert atlas.shape[0] == 1 and atlas.std() > 0.01
    # all 12 cube faces resolve to the textured material
    mask = np.asarray(scene.tri_mask)
    tex = np.asarray(scene.mat_tex)[np.asarray(scene.tri_mat)]
    assert (tex[mask] == 0).sum() == 12
