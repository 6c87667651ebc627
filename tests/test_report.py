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
    assert 'scrub("s' in html
    # the OBJ wireframe viewer with the mesh embedded inline (no fetch():
    # browsers block it on file:// pages), plus the loose image gallery
    assert "objview(" in html and "hand_0000.obj" in html
    assert "fetch(" not in html
    assert "[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]" in html
    assert "[[0, 1], [1, 2], [2, 0]]" in html
    assert "loose.png" in html


def test_report_single_frame_is_loose(tmp_path):
    d = str(tmp_path)
    _png(os.path.join(d, "only_0000.png"))
    html = open(write_html_report(d)).read()
    assert 'scrub("s' not in html  # no scrubber instantiated
    assert "only_0000.png" in html


def test_report_numeric_frame_order(tmp_path):
    """Unpadded numbering scrubs in numeric, not lexicographic, order."""
    d = str(tmp_path)
    for f in (1, 2, 10):
        _png(os.path.join(d, f"ext_{f}.png"))
    html = open(write_html_report(d)).read()
    assert html.find("ext_2.png") < html.find("ext_10.png")


def test_report_escapes_names(tmp_path):
    """Apostrophes/metacharacters in artifact names can't break the markup."""
    d = str(tmp_path)
    _png(os.path.join(d, "o'<b>dd.png"))
    html = open(write_html_report(d)).read()
    assert "o'<b>dd.png" not in html          # raw name never enters markup
    assert "o&#x27;&lt;b&gt;dd.png" in html   # escaped in the label
