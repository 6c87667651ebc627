"""Colored-CPU control for the dyntrack-kernel artifact: the near-bit-
faithful solver tracked against the same 64-frame golden (invoked by
tools/eval_artifacts.py dyntrack; prints one JSON list of per-frame mm
deviations).  Separates protocol chaos from kernel rounding lineage.
"""
import os
os.environ["HTS_PLATFORM"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import json, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp, jax.tree_util as jtu
from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK, DEFAULT_MODEL_JSON
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import batched_tracker_state, batched_update
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

golden = json.load(open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "golden.json")))
refp = np.array(golden["dyntrack_poses"], np.float32).reshape(-1, 17, 7)
F = refp.shape[0]
model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
bank = load_animbank(DEFAULT_ANIMBANK)
cam = synth_camera()
config = TrackerConfig(solver="colored", use_pallas=False, cnn_every_frame=False)
params = physics_params(config)
render = jax.jit(lambda p: fake_depth(p, model, cam))
states = batched_tracker_state(model, 1)
states = states._replace(body=states.body._replace(pose=jnp.asarray(bank[0])[None]))
run = jax.jit(lambda s, d: batched_update(s, model, None, d, cam, config, params)[0])
devs = []
for f in range(F):
    d = render(jnp.asarray(bank[f]))
    states = run(states, d[None])
    mine = np.asarray(states.body.pose[0])
    devs.append(float(np.linalg.norm(mine[:, :3] - refp[f, :, :3], axis=1).mean()))
print(json.dumps([round(d * 1000, 3) for d in devs]))
