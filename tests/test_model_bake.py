import json

import numpy as np

from hand_tracking_samples_tpu.geometry.subdiv import catmull_clark
from hand_tracking_samples_tpu.model.bake import bake_hand_model
from tests.conftest import MODEL_JSON

# bones whose vertex-limited greedy hull picks different (epsilon-scale
# tie-break) vertices than the float32 reference run; excluded from exact
# geometry asserts, covered by tolerance asserts instead.
TIEBREAK_BONES = {10, 12}


def test_subdiv_exact(golden):
    sub_g = np.array(golden["model_subdiv_bone0"])
    cage = json.load(open(MODEL_JSON))["controlcages"][0]
    v, f = catmull_clark(np.array(cage["verts"]), cage["faces"])
    v, f = catmull_clark(v, f)
    assert len(v) == len(sub_g)
    d = np.sqrt(((sub_g[:, None, :] - v[None, :, :]) ** 2).sum(-1))
    assert d.min(1).max() < 1e-6


def test_bake_matches_reference(golden, hand_model):
    m = hand_model
    com_g = np.array(golden["model_com"]).reshape(17, 3)
    sp_g = np.array(golden["model_startpos"]).reshape(17, 3)
    r_g = np.array(golden["model_radius"])
    ri_g = np.array(golden["model_radius_inner"])
    np.testing.assert_allclose(np.asarray(m.com), com_g, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m.start_pose[:, :3]), sp_g, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m.radius), r_g, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m.radius_inner), ri_g, atol=5e-5)
    exact = [b for b in range(17) if b not in TIEBREAK_BONES]
    np.testing.assert_allclose(np.asarray(m.com)[exact], com_g[exact], atol=1e-6)
    assert np.array(golden["model_mass"]).tolist() == np.asarray(m.mass).tolist()
    pc = np.array(golden["model_plane_counts"])
    np.testing.assert_array_equal(pc, np.asarray(m.plane_mask).sum(1))


def test_bone5_planes_exact(golden, hand_model):
    p5g = np.array(golden["model_planes_bone5"]).reshape(-1, 4)
    p5 = np.asarray(hand_model.planes[5])[np.asarray(hand_model.plane_mask[5])]
    assert len(p5g) == len(p5)
    # unordered set comparison (hull tri order differs)
    d = np.abs(p5g[:, None, :] - p5[None, :, :]).max(-1)
    assert d.min(1).max() < 1e-5


def test_ignore_pairs(hand_model):
    pairs = np.asarray(hand_model.collide_pairs)
    # bone 2 ignores everything
    assert not ((pairs == 2).any())
    # joined bones never collide
    for a, b in zip(np.asarray(hand_model.joint_rbi0),
                    np.asarray(hand_model.joint_rbi1)):
        assert not ((pairs[:, 0] == min(a, b)) & (pairs[:, 1] == max(a, b))).any()
