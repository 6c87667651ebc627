#!/usr/bin/env python
"""Targeted fine-tune: oversample the animbank segments where cold-start
tracking settles into stable-wrong basins (clenched/edge-on views the net
misreads — docs/PERFORMANCE.md cold-start section).

Reads a cold-start eval dump (tools/eval_coldstart.py EVAL_DUMP=...) to find
the failing start frames, builds a fine-tune set = full bank + plain and
augmented copies of the failing windows, and continues SGD from the warm
net.  Same training semantics as train_v3.py (reference train-cnn.cpp:143-170
batched onto the MXU)."""
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
from hand_tracking_samples_tpu.cnn.model import load_cnnb, save_cnnb
from hand_tracking_samples_tpu.cnn.train import (TrainingSet, evaluate,
                                                 synthetic_training_set,
                                                 train_epoch_scanned)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.model.bake import load_hand_model

DUMP = os.environ.get("FT_DUMP", "/tmp/cold_v4.npz")
WARM = os.environ.get("FT_WARM", "assets/handposedd_synth_v4.cnnb")
OUT = os.environ.get("FT_OUT", "assets/handposedd_synth_v5.cnnb")
STEPS = int(os.environ.get("FT_STEPS", "30000"))
BATCH = int(os.environ.get("FT_BATCH", "128"))
ALPHA = float(os.environ.get("FT_ALPHA", "0.0003"))
FAIL_MM = float(os.environ.get("FT_FAIL_MM", "8.0"))
WINDOW = int(os.environ.get("FT_WINDOW", "64"))
PLAIN_COPIES = int(os.environ.get("FT_PLAIN", "2"))
AUG_COPIES = int(os.environ.get("FT_AUG", "6"))


def main():
    z = np.load(DUMP)
    errs, starts = z["errs"], z["starts"]       # (F, T), (T,)
    fail = errs[-1] > FAIL_MM / 1000.0
    fail_starts = starts[fail]
    print(f"{fail.sum()}/{len(starts)} failing starts "
          f"(final err > {FAIL_MM} mm): {sorted(fail_starts.tolist())}")

    model = jtu.tree_map(jnp.asarray, load_hand_model(DEFAULT_MODEL_JSON))
    bank = load_animbank(DEFAULT_ANIMBANK)
    fail_ids = np.unique(np.concatenate(
        [np.arange(s, min(s + WINDOW, len(bank))) for s in fail_starts]))
    print(f"fine-tune window frames: {len(fail_ids)} / bank {len(bank)}")

    # Frame-id-disjoint split: every 8th bank frame is heldout and appears in
    # NO training copy (plain or augmented), so the quoted heldout mse cannot
    # be inflated by duplicate renders of training frames.
    all_ids = np.arange(len(bank))
    held_ids = all_ids[all_ids % 8 == 3]
    train_mask = np.ones(len(bank), bool)
    train_mask[held_ids] = False
    train_ids = all_ids[train_mask]
    fail_train_ids = fail_ids[train_mask[fail_ids]]

    t0 = time.time()
    # Cache keyed on the effective config (dump identity, knobs, split) so a
    # rerun with different knobs never silently reuses a stale set.
    import hashlib
    key = hashlib.sha1(repr((sorted(fail_starts.tolist()), FAIL_MM, WINDOW,
                             PLAIN_COPIES, AUG_COPIES,
                             held_ids.tolist())).encode()).hexdigest()[:12]
    cache = os.environ.get("FT_CACHE", f"/tmp/ft_set_{key}.npz")
    if cache and os.path.exists(cache):
        zc = np.load(cache)
        data = TrainingSet(jnp.asarray(zc["x"]), jnp.asarray(zc["l"]),
                           jnp.asarray(zc["p"]))
        held = TrainingSet(jnp.asarray(zc["hx"]), jnp.asarray(zc["hl"]),
                           jnp.asarray(zc["hp"]))
        print(f"training set: {data.inputs.shape[0]} frames (cached)",
              flush=True)
    else:
        sets = [synthetic_training_set(model, bank, train_ids)]
        for k in range(max(PLAIN_COPIES - 1, 0)):
            sets.append(synthetic_training_set(model, bank, fail_train_ids))
        for k in range(AUG_COPIES):
            sets.append(synthetic_training_set(model, bank, fail_train_ids,
                                               augment=True,
                                               seed=5000 * (k + 1)))
        data = TrainingSet(*[jnp.concatenate(xs) for xs in zip(*sets)])
        held = synthetic_training_set(model, bank, held_ids)
        if cache:
            np.savez(cache, x=np.asarray(data.inputs),
                     l=np.asarray(data.labels), p=np.asarray(data.poses),
                     hx=np.asarray(held.inputs), hl=np.asarray(held.labels),
                     hp=np.asarray(held.poses))
        print(f"training set: {data.inputs.shape[0]} frames, heldout "
              f"{held.inputs.shape[0]} ({time.time()-t0:.0f}s to render)",
              flush=True)

    params = load_cnnb(WARM)
    print(f"warm-start heldout mse: {evaluate(params, held, split='all'):.6f}",
          flush=True)
    rng = np.random.RandomState(17)
    chunk = 2000
    done = 0
    while done < STEPS:
        t0 = time.time()
        params, mse = train_epoch_scanned(params, data, rng, chunk,
                                          batch_size=BATCH, alpha=ALPHA)
        done += chunk
        if done % 10000 == 0 or done == chunk:
            ev = evaluate(params, held, split="all")
            print(f"step {done:6d} alpha {ALPHA} train-mse {mse:.6f} "
                  f"heldout-mse {ev:.6f} ({time.time()-t0:.1f}s/chunk)",
                  flush=True)
            save_cnnb(params, OUT + ".partial")
    save_cnnb(params, OUT)
    print("saved", OUT)


if __name__ == "__main__":
    main()
