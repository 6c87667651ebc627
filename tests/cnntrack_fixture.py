"""Real-speed recorded fixture for the CNN-cadence e2e golden (VERDICT r2
item 5).

Writes tests/fixtures/cnntrack_rec.{json,rs,pose}: 32 CONSECUTIVE animbank
frames (the bank is a 60 fps capture, so stride 1 is real speed) rendered to
synthetic depth and stored with their ground-truth poses through
DatasetWriter.  The recording is COMMITTED (not re-rendered per run) so the
C++ golden and the repo test consume bit-identical input; regenerate only
together with tests/fixtures/cnntrack_ref.json:

    python tests/cnntrack_fixture.py
    g++ -std=c++14 -O2 -fno-strict-aliasing -w -I/root/reference \
        -o /tmp/golden_gen tools/golden_gen.cpp
    (cd /tmp/gg && GG_CNNTRACK=1 /tmp/golden_gen m a outdir \
        /root/repo/assets/handposedd_synth_v4.cnnb \
        /root/repo/tests/fixtures/cnntrack_rec)

START chosen to cover both stable tracking and a fast segment.

Round 4 adds a second, longer recording (cnntrack_rec2: 128 consecutive
frames from bank[560], spanning the ~630-670 fast segment) so the
accept/reject branch is exercised through multiple re-acquisitions, and the
golden side is generated for k in {1, 4, 8} on both recordings
(GG_TAG names the variants, e.g. cnntrack_ref2_k8.json).
"""
import os
import sys

START = 940
N = 32
RECS = [("", 940, 32), ("2", 560, 128)]

if __name__ == "__main__":
    os.environ["HTS_PLATFORM"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import jax.tree_util as jtu

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                        DEFAULT_MODEL_JSON)
    from hand_tracking_samples_tpu.data.animbank import load_animbank
    from hand_tracking_samples_tpu.data.dataset import (DatasetInfo,
                                                        DatasetWriter)
    from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
    from hand_tracking_samples_tpu.model.bake import load_hand_model

    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    render = jax.jit(lambda p: fake_depth(p, model, cam))
    info = DatasetInfo(dims=(320, 240), focal=(305, 305),
                       principal=(160, 120), depth_scale=0.001)
    for tag, start, n in RECS:
        out = os.path.join(os.path.dirname(__file__), "fixtures",
                           "cnntrack_rec" + tag)
        if os.path.exists(out + ".rs"):
            # recordings are COMMITTED; never silently rewrite one the golden
            # was generated against (rm the .rs first to force)
            print(f"skip {out}.rs (exists)")
            continue
        frames = np.stack([np.asarray(render(jnp.asarray(bank[start + i])))
                           for i in range(n)])
        with DatasetWriter(out, info) as w:
            w.save_frames(frames, bank[start:start + n])
        print(f"wrote {out}.rs/.pose/.json ({n} frames from bank[{start}])")
