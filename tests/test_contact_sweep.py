"""Contact parity across a 20-frame high-contact sweep (VERDICT r2 item 7).

Fixture tests/fixtures/contact_sweep_ref.json: the reference's GJK contact
rows (gjk.h:608-643 ContactPatch via physics.h:451-489 CollisionConstraints)
on the 20 most self-contact-rich animbank frames, plus the reference pose
after a 3-step joint+contact solve from each.  Regenerate with
GG_CONTACT_SWEEP=1 tools/golden_gen (see CLAUDE.md).

This quantifies the SAT+refine+manifold approximation across the pose
distribution instead of the single frame of test_contacts_golden.py.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.model.hand import fit_point_cloud
from hand_tracking_samples_tpu.physics.contacts import contact_rows
from hand_tracking_samples_tpu.physics.solver import BodyState
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params


@pytest.fixture(scope="module")
def sweep():
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "contact_sweep_ref.json")
    return json.load(open(path))["frames"]


def _state(bank, frame):
    return BodyState(pose=jnp.asarray(bank[frame]),
                     linear_momentum=jnp.zeros((17, 3)),
                     angular_momentum=jnp.zeros((17, 3)))


def test_contact_sweep_pairs_and_depths(sweep, hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    params = physics_params(TrackerConfig())
    gen = jax.jit(lambda s: contact_rows(s, hand_model, params))

    total_ref_pairs = 0
    missing = extra = 0
    depth_err = []
    for entry in sweep:
        rows = gen(_state(bank, entry["frame"]))
        act = np.asarray(rows.active) & (np.asarray(rows.friction_master) == 0)
        mine = {}
        for b0, b1, td in zip(np.asarray(rows.b0)[act],
                              np.asarray(rows.b1)[act],
                              np.asarray(rows.targetdist)[act]):
            k = (int(b0), int(b1))
            mine[k] = min(mine.get(k, np.inf), float(td))
        ref = {(int(p[0]), int(p[1])): float(p[2]) for p in entry["pairs"]}
        total_ref_pairs += len(ref)
        missing += len(set(ref) - set(mine))
        extra += len(set(mine) - set(ref))
        depth_err += [abs(ref[k] - mine[k]) for k in set(ref) & set(mine)]
        # per-frame: the pair-set approximation stays bounded.  Measured
        # r3 baseline over the 20 frames: miss <= 2/frame (5 of 233 pairs
        # total), extra <= 8/frame (SAT activates conservatively near the
        # driftmax boundary); gates sit just above those.
        assert len(set(ref) - set(mine)) <= 3, (
            entry["frame"], set(ref) - set(mine))
        assert len(set(mine) - set(ref)) <= 9, (
            entry["frame"], set(mine) - set(ref))

    depth_err = np.asarray(depth_err)
    # sweep-wide: >=95% of reference pairs found; deepest-contact targetdist
    # deltas (SAT depth vs GJK patch depth, largest on deep-penetration
    # frames) measured at mean 1.0mm / max 4.1mm — gate just above
    assert missing <= total_ref_pairs // 20, (missing, total_ref_pairs)
    assert depth_err.mean() < 1.6e-3, depth_err.mean()
    assert depth_err.max() < 6e-3, depth_err.max()


def test_contact_sweep_solve(sweep, hand_model):
    """3 joint+contact updates from each sweep pose: position drift vs the
    reference's GJK-patch solve, aggregated across all 20 frames."""
    bank = load_animbank(DEFAULT_ANIMBANK)
    params = physics_params(TrackerConfig())
    contacts_fn = lambda s: contact_rows(s, hand_model, params)
    step = jax.jit(lambda s: fit_point_cloud(
        s, hand_model, params, points=jnp.zeros((0, 3)),
        point_mask=jnp.zeros((0,), bool), contacts_fn=contacts_fn))

    means, maxes = [], []
    for entry in sweep:
        state = _state(bank, entry["frame"])
        for _ in range(3):
            state = step(state)
        ref = np.asarray(entry["pose3"], np.float32)
        dev = np.linalg.norm(np.asarray(state.pose)[:, :3] - ref[:, :3],
                             axis=1)
        means.append(dev.mean())
        maxes.append(dev.max())
    means = np.asarray(means)
    # sweep-wide parity band: mean position drift under 1 mm like the
    # single-frame golden; the worst single-bone deviation (measured 7.6 mm
    # on one deep-penetration frame where SAT depth != GJK patch depth)
    # gated just above its r3 baseline
    assert means.mean() < 1.0e-3, f"sweep mean {means.mean()*1000:.2f}mm"
    assert max(maxes) < 9.0e-3, f"sweep max {max(maxes)*1000:.2f}mm"
