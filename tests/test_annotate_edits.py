"""Annotation edit round-trip (VERDICT r2 item 8 / reference A4): the HTML
report's editor exports per-frame commands, apps.annotate consumes them for a
targeted refit — the annotation-fixer's interactive loop
(annotation-fixer.cpp:152-158, 219-260) without GL.

edit JSON -> annotate --edits (nail / hold / delete) -> refit -> re-render,
asserted end-to-end on the committed replay fixture recording.
"""
import json
import os

import numpy as np
import pytest

from tests.conftest import FIXTURES


def test_edit_refit_rerender_cycle(tmp_path):
    from hand_tracking_samples_tpu.apps.annotate import main
    from hand_tracking_samples_tpu.data.dataset import load_dataset

    src = os.path.join(FIXTURES, "replay_rec")
    ds = load_dataset(src)
    # nail the pinky tip (bone 16) of frame 1 to 12mm off its annotation;
    # drop frame 0 — exactly what the report editor exports
    target = (ds.pose[1, 16, :3] + np.array([0.012, 0, 0],
                                            np.float32)).tolist()
    edits = {"edits": [{"frame": 1, "bone": 16, "nail": target},
                       {"frame": 2, "hold": 2},
                       {"frame": 0, "delete": True}]}
    epath = tmp_path / "edits.json"
    epath.write_text(json.dumps(edits))
    out = str(tmp_path / "rec_fixed")
    art = str(tmp_path / "artifacts")
    main([src + ".rs", "--edits", str(epath), "--out", out,
          "--dump-artifacts", art, "--max-frames", "4"])

    fixed = load_dataset(out)
    assert fixed.depth.shape[0] == 3          # frame 0 deleted
    np.testing.assert_array_equal(fixed.depth[0], ds.depth[1])
    # the nailed bone moved onto the dragged target (frame 1 -> output 0)
    d_target = np.linalg.norm(fixed.pose[0, 16, :3] - np.array(target))
    d_orig = np.linalg.norm(fixed.pose[0, 16, :3] - ds.pose[1, 16, :3])
    assert d_target < 0.004, f"nailed bone {d_target*1000:.1f}mm off target"
    assert d_target < d_orig  # pulled toward the edit, not the old label

    # re-render artifacts: per-frame overlays + bone origins + editor page
    names = os.listdir(art)
    assert "fit_0001.png" in names and "bones_0001.json" in names
    page = open(os.path.join(art, "index.html")).read()
    assert "editview(" in page and "annotation editor" in page
    assert "download edits.json" in page
    bones = json.load(open(os.path.join(art, "bones_0001.json")))
    assert np.asarray(bones["bones"]).shape == (17, 3)
    # the dumped bone origin for the edited frame reflects the refit
    assert np.linalg.norm(np.asarray(bones["bones"][16]) -
                          np.array(target)) < 0.004


def test_report_editor_only_with_bones(tmp_path):
    """Artifact dirs without bones_*.json keep the plain viewer page."""
    from hand_tracking_samples_tpu.utils.report import write_html_report
    from hand_tracking_samples_tpu.utils.viz import write_png
    pytest.importorskip("PIL")
    d = tmp_path / "plain"
    d.mkdir()
    img = np.zeros((8, 8, 3), np.uint8)
    write_png(str(d / "a_0.png"), img)
    write_png(str(d / "a_1.png"), img)
    page = open(write_html_report(str(d))).read()
    assert "annotation editor" not in page
