"""Cap ablation on REAL-SPEED RECORDED data (VERDICT r4 item 8): the
128-frame cnntrack_rec2 fixture at k=4, shipped kernel cap 128 vs kernel
cap 256 (T=1 fits the VMEM envelope) vs colored cap 512 (~uncapped)."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp, jax.tree_util as jtu
from hand_tracking_samples_tpu.assets_paths import DEFAULT_CNNB, DEFAULT_MODEL_JSON
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from hand_tracking_samples_tpu.data.dataset import load_dataset
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
ds = load_dataset(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "cnntrack_rec2"))
ref = json.load(open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures", "cnntrack_ref2_k4.json")))
k, F = ref["k"], ref["n_frames"]
ref_je = np.array(ref["cnntrack_joint_err"])
cam = ds.info.camera()
cnn = load_cnnb(DEFAULT_CNNB)
depths = jnp.asarray(ds.depth)[:, None]

def run_cfg(solver, cap, pallas):
    config = TrackerConfig(cnn_every_frame=True, cnn_every_k=k,
                           solver=solver, cloud_rows_per_body=cap,
                           use_pallas=bool(pallas))
    params = physics_params(config)
    states = batched_tracker_state(model, 1)
    sc = jax.jit(lambda s, d: batched_update(
        s, model, cnn, d, cam, config, params, run_cnn=True)[0])
    sd = jax.jit(lambda s, d: batched_update(
        s, model, cnn, d, cam, config, params, run_cnn=False)[0])
    jes = []
    for f in range(F):
        states = (sc if f % k == 0 else sd)(states, depths[f])
        mine = np.asarray(states.body.pose[0])
        jes.append(float(np.linalg.norm(
            mine[:, :3] - ds.pose[f][:, :3], axis=1).mean()))
    print(f"{solver} cap={cap}: mean je {np.mean(jes)*1000:.2f} mm "
          f"(ref {np.mean(ref_je)*1000:.2f})", flush=True)
    return jes

for solver, cap, pallas in [("kernel", 128, 1), ("kernel", 256, 1),
                            ("colored", 512, 0)]:
    run_cfg(solver, cap, pallas)
