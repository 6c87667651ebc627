"""HTML artifact report (utils/report.py): series detection + page output."""
import os

import numpy as np

from hand_tracking_samples_tpu.utils.report import write_html_report
from hand_tracking_samples_tpu.utils.viz import write_png


def _png(path):
    write_png(path, np.zeros((8, 8, 3), np.uint8))


def test_report_scrubber_and_obj(tmp_path):
    d = str(tmp_path)
    for f in range(3):
        _png(os.path.join(d, f"depth_{f:04d}.png"))
    _png(os.path.join(d, "loose.png"))
    with open(os.path.join(d, "hand_0000.obj"), "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    out = write_html_report(d)
    assert os.path.basename(out) == "index.html"
    html = open(out).read()
    # one scrubber over the 3-frame depth series
    assert "depth_0000.png" in html and "depth_0002.png" in html
    assert "scrub('s" in html
    # the OBJ wireframe viewer and the loose image gallery
    assert "objview(" in html and "hand_0000.obj" in html
    assert "loose.png" in html


def test_report_single_frame_is_loose(tmp_path):
    d = str(tmp_path)
    _png(os.path.join(d, "only_0000.png"))
    html = open(write_html_report(d)).read()
    assert "scrub('s" not in html  # no scrubber instantiated
    assert "only_0000.png" in html
