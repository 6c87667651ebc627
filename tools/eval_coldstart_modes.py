"""Cold-start accept-policy experiment matrix (PERFORMANCE.md round-5):
the 64x64 eval protocol under MODE=ref (unconditional take during the
initializing window, handtrack.h:714-726 semantics) | gated (take only
when the CNN refit does not worsen FitError) | always (always_take_cnn) |
notworse (accum threshold epsilon-below zero).  All measured round 5:
identical failing-start sets, no tail improvement — the cold-start tail
is a net-representation limit, not accept-policy."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp, jax.tree_util as jtu
from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_CNNB, DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.cnn.model import load_cnnb
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.model.bake import load_hand_model
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params

MODE = os.environ.get("MODE", "ref")
T, F = 64, 64
model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
bank = load_animbank(DEFAULT_ANIMBANK)
cam = synth_camera()
kw = {}
if MODE == "gated":
    kw["init_take_gated"] = True
elif MODE == "always":
    kw["always_take_cnn"] = True
elif MODE == "notworse":
    kw["accum_error_threshold"] = -1e-9
config = TrackerConfig(cnn_every_frame=True, solver="kernel", use_pallas=True,
                       **kw)
params = physics_params(config)
cnn = load_cnnb(DEFAULT_CNNB)
starts = (np.arange(T) * 211) % (len(bank) - F)
render = jax.jit(jax.vmap(lambda p: fake_depth(p, model, cam)))
states = batched_tracker_state(model, T)
states = states._replace(initializing=jnp.full(T, 50, jnp.int32))
run = jax.jit(lambda s, d: batched_update(s, model, cnn, d, cam, config,
                                          params)[0])
err = None
for f in range(F):
    gt = jnp.asarray(bank[starts + f])
    states = run(states, render(gt))
    err = np.asarray(jnp.linalg.norm(
        states.body.pose[:, :, :3] - gt[:, :, :3], axis=-1).mean(axis=-1))
    if f % 16 == 15:
        print(f"frame {f}: mean {err.mean()*1000:.2f} mm  <8mm "
              f"{(err < 0.008).mean()*100:.0f}%", flush=True)
print(f"MODE={MODE}: mean {err.mean()*1000:.2f} median "
      f"{np.median(err)*1000:.2f} <8mm {(err < 0.008).mean()*100:.1f}%")
fails = np.where(err > 0.008)[0]
print("failing starts:", sorted(starts[fails].tolist()))
