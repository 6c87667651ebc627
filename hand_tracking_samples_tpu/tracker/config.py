"""HandTracker configuration (the ~30 tunables of handtrack.h:523-581).

Field names match the reference's visit_fields serialization so the same
JSON config files work.  Structural knobs (step counts, iteration counts,
booleans selecting which constraint blocks exist) are Python values baked at
trace time; force/threshold scalars ride through jit as they are Python
floats consumed by jnp ops.
"""
from __future__ import annotations

import dataclasses
import json


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    segment_scale: float = 0.17
    full_reset_on_error: float = 0.6
    angles_only: bool = False
    always_take_cnn: bool = False
    drangey: float = 0.7
    boundary_planes: int = 1
    microforce: float = 1.0
    cloudforce_max_point: float = 15.0
    cloudforce_max_sum: float = 3000.0
    mainthreadpasses: int = 1
    subsample_fraction: int = 4
    subsample_voxel: int = 0
    subsample_size: float = 0.0
    min_point_num: int = 400
    accum_error_threshold: float = 0.0
    min_cray_prob: float = 0.0
    steps: int = 5
    steps_keypoints: int = 3
    steps_keyangles: int = 2
    steps_palmangle: int = 2
    steps_cloudstart: int = 1
    steps_unibody: int = 3
    physics_iterations: int = 16
    physics_iterations_post: int = 4
    physics_use_collision: int = 1
    physics_weak_force: float = 0.4
    bone_sum_error_scale: float = 4.0
    unibody_force: float = 0.1

    # --- TPU-framework additions (not in the reference) ---
    point_budget: int = 2048        # static cloud-point slots per frame;
    # 2048 holds every subsampled point on all animbank views (reference
    # parity: cold-start 7.5mm vs ref 8.2mm, fast-segment drift 1.03x);
    # 1024 trades ~1.4x drift for ~1.45x dynamics fps (docs/PERFORMANCE.md)
    cnn_every_frame: bool = True    # reference: background thread, less often
    cnn_every_k: int = 1            # CNN cadence under track_sequences: run
    # the CNN+refit on one frame in k, cheap cloud fits in between — the
    # reference's own amortization (background CNN thread slower than frame
    # rate, handtrack.h:755-768); k=1 = every frame
    solver: str = "sequential"      # "sequential" (bit-faithful row order) or
    # "colored" (disjoint-row groups; identical up to commuting rows, with a
    # per-body cloud-row cap of cloud_rows_per_body)
    cloud_rows_per_body: int = 128  # per-body cloud-row slots (solver="kernel"
    # fits <=128 in VMEM at T>128; 256 is worth ~0.8mm cold-start accuracy and
    # works at T<=128 or with solver="colored" — docs/PERFORMANCE.md)
    use_pallas: bool = False        # fused correspondence kernel (TPU only);
    # requires point budgets that are multiples of 512
    contacts_mode: str = "exact"    # "exact" precedence schedule or "jacobi"
    # (one parallel phase per row kind; ~9% faster at cnn_every_k=4 but the
    # kernel's and the colored solver's jacobi orderings differ at ~1e-4 m
    # per solve — the bench-parity gate pins the exact schedule)
    mirror_plane: tuple = ()        # mirror-rig plane (a,b,c,d): cloud points
    # under it are reflected back into the scene and the coplanar band is
    # dropped (misc_image.h:480-485 MirrorPlaneSplit; the reference parses
    # mplane from datasets — dcam.h mirror rigs).  Empty = no mirror.
    init_take_gated: bool = False   # during the initializing window the
    # reference takes the CNN pose unconditionally (handtrack.h:714-726);
    # True gates the take on the CNN refit not worsening FitError.
    # MEASURED round 5 (cold-start 64x64 protocol): no help — 70.3% <8mm
    # vs 71.9% ungated, identical failing-start set; the wrong-basin CNN
    # readings pass the FitError gate too (docs/PERFORMANCE.md round-5
    # cold-start section).  Kept as a config lever, default off.

    def load_json(self, path: str) -> "TrackerConfig":
        """HandTracker::load_config (handtrack.h:822-828)."""
        with open(path) as f:
            js = json.load(f)
        known = {f.name for f in dataclasses.fields(self)}
        return dataclasses.replace(self, **{k: v for k, v in js.items()
                                            if k in known})
