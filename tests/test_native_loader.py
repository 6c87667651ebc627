"""native/StreamingLoader (C++ threaded .rs reader) vs the Python reader."""
import numpy as np

from hand_tracking_samples_tpu.data.dataset import load_dataset
from hand_tracking_samples_tpu.native import StreamingLoader
from tests.conftest import FIXTURES


def test_streaming_loader_matches_python_reader():
    base = f"{FIXTURES}/replay_rec"
    ds = load_dataset(base)
    with StreamingLoader([base], batch=4) as sl:
        assert sl.total_frames == len(ds.depth)
        depths, poses, ids = [], [], []
        for d, p, i in sl:
            depths.append(d)
            poses.append(p)
            ids.append(i)
    depth = np.concatenate(depths)
    pose = np.concatenate(poses)
    ids = np.concatenate(ids)
    np.testing.assert_array_equal(ids, np.arange(len(ds.depth)))
    np.testing.assert_array_equal(depth, np.asarray(ds.depth))
    np.testing.assert_allclose(pose, np.asarray(ds.pose), atol=1e-6)
