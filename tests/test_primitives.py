"""geometry/primitives vs the reference WingMesh builders (wingmesh.h)."""
import numpy as np

from hand_tracking_samples_tpu.geometry.primitives import (face_planes,
                                                           mesh_box,
                                                           mesh_cone,
                                                           mesh_crop,
                                                           mesh_cube,
                                                           mesh_cylinder,
                                                           mesh_dual)


def _ref(golden, key):
    v = np.array(golden[f"{key}_verts"], np.float32)
    p = np.array(golden[f"{key}_planes"], np.float32).reshape(-1, 4)
    return v, p


def _sorted(a):
    a = np.asarray(a, np.float64)
    return a[np.lexsort(np.round(a / 1e-5).astype(np.int64).T[::-1])]


def test_box_cylinder_cone_match_reference(golden):
    for key, (verts, faces) in (
            ("wm_box", mesh_box([-0.2, -0.3, -0.1], [0.25, 0.15, 0.35])),
            ("wm_cyl", mesh_cylinder(8, 0.5, 1.25)),
            ("wm_cone", mesh_cone(7, 0.4, 0.9))):
        rv, rp = _ref(golden, key)
        np.testing.assert_allclose(verts, rv, atol=1e-6, err_msg=key)
        planes = face_planes(verts, faces)
        np.testing.assert_allclose(_sorted(planes), _sorted(rp), atol=1e-5,
                                   err_msg=key)


def test_crop_matches_reference(golden):
    verts, faces = mesh_box([-0.2, -0.3, -0.1], [0.25, 0.15, 0.35])
    n = np.array([1.0, 2.0, 3.0])
    n /= np.linalg.norm(n)
    plane = np.concatenate([n, [-0.05]])
    cv, cf = mesh_crop(verts, faces, plane)
    rv, rp = _ref(golden, "wm_crop")
    np.testing.assert_allclose(_sorted(cv), _sorted(rv), atol=1e-5)
    planes = face_planes(cv, cf)
    # the cap's computed plane equals the slice plane
    np.testing.assert_allclose(_sorted(planes), _sorted(rp), atol=1e-4)


def test_dual_matches_reference(golden):
    verts, faces = mesh_cube(0.5)
    dv, df = mesh_dual(verts, faces, 0.6)
    rv, rp = _ref(golden, "wm_dual")
    np.testing.assert_allclose(_sorted(dv), _sorted(rv), atol=1e-5)
    planes = face_planes(dv, df)
    np.testing.assert_allclose(_sorted(np.abs(planes)), _sorted(np.abs(rp)),
                               atol=1e-4)
