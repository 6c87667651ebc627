#!/usr/bin/env python
"""Train the v3 pose-initialiser net on the TPU: full animbank + augmented
copies, device-resident scanned SGD (reference semantics: plain SGD on the
softmax-MSE loss, train-cnn.cpp:143-170, batched onto the MXU)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from hand_tracking_samples_tpu.assets_paths import (DEFAULT_ANIMBANK,
                                                    DEFAULT_MODEL_JSON)
from hand_tracking_samples_tpu.cnn.model import init_params, load_cnnb, save_cnnb
from hand_tracking_samples_tpu.cnn.train import (TrainingSet, evaluate,
                                                 synthetic_training_set,
                                                 train_epoch_scanned)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.model.bake import load_hand_model

AUG_COPIES = int(os.environ.get("TRAIN_AUG", "3"))
STEPS = int(os.environ.get("TRAIN_STEPS", "40000"))
BATCH = int(os.environ.get("TRAIN_BATCH", "128"))
OUT = os.environ.get("TRAIN_OUT", "assets/handposedd_synth_v3.cnnb")
WARM = os.environ.get("TRAIN_WARM", "")


def main():
    cache = os.environ.get("TRAIN_CACHE", "/tmp/train_v3_set.npz")
    t0 = time.time()
    if cache and os.path.exists(cache):
        z = np.load(cache)
        data = TrainingSet(jnp.asarray(z["x"]), jnp.asarray(z["l"]),
                           jnp.asarray(z["p"]))
        print(f"training set: {data.inputs.shape[0]} frames (cached)", flush=True)
    else:
        model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
        bank = load_animbank(DEFAULT_ANIMBANK)
        ids = np.arange(len(bank))
        sets = [synthetic_training_set(model, bank, ids)]
        for k in range(AUG_COPIES):
            sets.append(synthetic_training_set(model, bank, ids, augment=True,
                                               seed=1000 * (k + 1)))
        data = TrainingSet(*[jnp.concatenate(xs) for xs in zip(*sets)])
        if cache:
            np.savez(cache, x=np.asarray(data.inputs),
                     l=np.asarray(data.labels), p=np.asarray(data.poses))
        print(f"training set: {data.inputs.shape[0]} frames "
              f"({time.time()-t0:.0f}s to render)", flush=True)

    params = load_cnnb(WARM) if WARM else init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    chunk = 2000
    done = 0
    while done < STEPS:
        alpha = float(os.environ.get("TRAIN_ALPHA", "0")) or (
            0.001 if done < STEPS * 2 // 3 else 0.0003)
        t0 = time.time()
        params, mse = train_epoch_scanned(params, data, rng, chunk,
                                          batch_size=BATCH, alpha=alpha)
        done += chunk
        if done % 10000 == 0 or done == chunk:
            ev = evaluate(params, data)
            print(f"step {done:6d} alpha {alpha} train-mse {mse:.6f} "
                  f"heldout-mse {ev:.6f} ({time.time()-t0:.1f}s/chunk)",
                  flush=True)
            save_cnnb(params, OUT + ".partial")
    save_cnnb(params, OUT)
    print("saved", OUT)


if __name__ == "__main__":
    main()
