"""Native (C++) OBJ parser: correctness vs the pure-Python parser."""
import os
import time

import numpy as np
import pytest

from mafrixraytracing_tpu.io import native
from mafrixraytracing_tpu.io.obj import _load_obj_python, load_obj

SPOT = "/root/reference/3DModel/spot/spot_triangulated_good.obj"
RENAULT = "/root/reference/3DModel/Renault12TL/Renault12TL.obj"

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for native parser"
)


def _models_equal(a, b):
    np.testing.assert_allclose(a.vertices, b.vertices, rtol=1e-6)
    np.testing.assert_allclose(a.uvs, b.uvs, rtol=1e-6)
    np.testing.assert_allclose(a.normals, b.normals, rtol=1e-6)
    assert set(a.groups) == set(b.groups)
    for g in a.groups:
        ma, mb = a.group_mesh(g), b.group_mesh(g)
        np.testing.assert_array_equal(ma.faces, mb.faces)
        assert (ma.face_uvs is None) == (mb.face_uvs is None)
        if ma.face_uvs is not None:
            np.testing.assert_array_equal(ma.face_uvs, mb.face_uvs)
        if ma.face_normals is not None:
            np.testing.assert_array_equal(ma.face_normals, mb.face_normals)
        assert a.group_materials(g) == b.group_materials(g), g
    assert a.material_order == b.material_order


def test_simple_file_matches_python(tmp_path):
    p = os.path.join(tmp_path, "t.obj")
    with open(p, "w") as f:
        f.write(
            "mtllib none.mtl\n"
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 0 1\n"
            "vn 0 0 1\n"
            "g quad\n"
            "usemtl mat1\n"
            "f 1/1/1 2/2/1 4/3/1 3//1\n"
            "g tris\n"
            "f -4 -3 -2\n"
        )
    nat = native.load_obj_native(p)
    py = _load_obj_python(p)
    _models_equal(nat, py)


@pytest.mark.skipif(not os.path.exists(SPOT), reason="reference assets absent")
def test_spot_matches_python():
    nat = native.load_obj_native(SPOT)
    py = _load_obj_python(SPOT)
    _models_equal(nat, py)
    assert nat.mesh().faces.shape[0] == 5856


@pytest.mark.skipif(not os.path.exists(RENAULT), reason="reference assets absent")
def test_renault_loads_and_is_fast():
    t0 = time.perf_counter()
    nat = native.load_obj_native(RENAULT)
    t_nat = time.perf_counter() - t0
    # SURVEY scene-scale anchor: 36,996 faces (quads triangulate to more tris)
    assert nat.mesh().faces.shape[0] >= 36996
    t0 = time.perf_counter()
    _load_obj_python(RENAULT)
    t_py = time.perf_counter() - t0
    # native should be dramatically faster; assert a conservative 3x
    assert t_nat < t_py / 3, (t_nat, t_py)


def test_load_obj_auto_uses_native(tmp_path):
    p = os.path.join(tmp_path, "t.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    m = load_obj(p, use_native="always")
    assert m.mesh().faces.shape[0] == 1
