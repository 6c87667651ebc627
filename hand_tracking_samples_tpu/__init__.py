"""hand_tracking_samples_tpu — TPU-native articulated hand tracking.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
IntelRealSense/hand_tracking_samples: depth-image hand tracking via a
17-bone sequential-impulse fit + landmark CNN, plus the full data flywheel
(recording, auto-labeling, training, export).  See README.md.
"""

__version__ = "0.1.0"

__all__ = [
    "load_hand_model", "TrackerConfig", "make_tracker_state", "update",
    "DCamera",
]


def __getattr__(name):  # lazy: importing the package shouldn't pull in jax
    if name == "load_hand_model":
        from .model.bake import load_hand_model
        return load_hand_model
    if name == "TrackerConfig":
        from .tracker.config import TrackerConfig
        return TrackerConfig
    if name == "make_tracker_state":
        from .tracker.runtime import make_tracker_state
        return make_tracker_state
    if name == "update":
        from .tracker.runtime import update
        return update
    if name == "DCamera":
        from .imaging.camera import DCamera
        return DCamera
    raise AttributeError(name)
