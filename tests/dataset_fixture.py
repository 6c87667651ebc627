"""Deterministic test recordings for dataset-format interop goldens.

Writes two small recordings (byte-reproducible: fixed numpy RandomState):
  * recmix    — all six parallel files: .json/.rs/.ir/.pose/.rgb/.feye
  * reclegacy — the deprecated interleaved-`hasir` layout (depth u16 then
                ir u8 per frame inside .rs, dataset.h:134-138), no .ir file

The committed fixtures tests/fixtures/dataset_ref_{mix,legacy}.json were
produced by loading these exact files through the reference's dataset.h:

    g++ -std=c++14 -O2 -fno-strict-aliasing -w -I/root/reference \
        -o /tmp/golden_gen tools/golden_gen.cpp
    python tests/dataset_fixture.py /tmp/dsfix
    (cd /tmp/gg && GG_DATASET=1 /tmp/golden_gen m a <fixdir> x /tmp/dsfix/recmix)

Regenerate them whenever the generator below changes.
"""
import json
import sys

import numpy as np

RGB_DIM = (32, 24)    # (w, h)
FEYE_DIM = (40, 20)
DIMS = (320, 240)
N_FRAMES = 5


def _arrays():
    rng = np.random.RandomState(7)
    w, h = DIMS
    depth = (rng.rand(N_FRAMES, h, w) * 4000).astype(np.uint16)
    ir = (rng.rand(N_FRAMES, h, w) * 255).astype(np.uint8)
    pose = rng.rand(N_FRAMES, 17, 7).astype(np.float32).round(3)
    rgb = (rng.rand(N_FRAMES, RGB_DIM[1], RGB_DIM[0], 3) * 255).astype(np.uint8)
    feye = (rng.rand(N_FRAMES, FEYE_DIM[1], FEYE_DIM[0]) * 255).astype(np.uint8)
    return depth, ir, pose, rgb, feye


def write_fixture_recordings(outdir: str):
    """Returns (mix_base, legacy_base, arrays)."""
    import os
    from hand_tracking_samples_tpu.data.dataset import (DatasetInfo,
                                                        DatasetWriter)
    os.makedirs(outdir, exist_ok=True)
    depth, ir, pose, rgb, feye = _arrays()

    mix = os.path.join(outdir, "recmix")
    info = DatasetInfo(dims=DIMS, rgb_dim=RGB_DIM, feye_dim=FEYE_DIM)
    with DatasetWriter(mix, info) as wtr:
        wtr.add_rgb().add_fisheye()
        wtr.save_frames(depth, pose, ir, rgb, feye)

    legacy = os.path.join(outdir, "reclegacy")
    # hand-build the interleaved .rs (the reference only reads this layout)
    with open(legacy + ".rs", "wb") as f:
        for k in range(N_FRAMES):
            depth[k].tofile(f)
            ir[k].tofile(f)
    with open(legacy + ".pose", "w") as f:
        for k in range(N_FRAMES):
            parts = []
            for p in pose[k]:
                parts.append(" ".join(f"{v:g}" for v in p[:3]) + "  "
                             + " ".join(f"{v:g}" for v in p[3:]))
            f.write("   ".join(parts) + "\n")
    li = DatasetInfo(dims=DIMS, hasir=True, rgb_dim=(0, 0), feye_dim=(0, 0),
                     fname=legacy)
    with open(legacy + ".json", "w") as f:
        json.dump(li.to_json_dict(), f, indent=2)

    return mix, legacy, (depth, ir, pose, rgb, feye)


if __name__ == "__main__":
    write_fixture_recordings(sys.argv[1])
    print("wrote", sys.argv[1])
