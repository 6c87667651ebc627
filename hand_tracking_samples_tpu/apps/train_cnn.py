"""train-hand-pose-cnn equivalent: batched CNN training.

Trains the pose-initialiser CNN on recorded datasets (.rs + .pose) and/or
synthetic animbank renders, with the reference's even/odd train/test split
and .cnnb checkpoints.  The reference trains one example per SGD step on one
CPU core ("hours... overnight"); here steps are minibatched onto the MXU.

    python -m hand_tracking_samples_tpu.apps.train_cnn --synthetic 2048 \
        --steps 2000 --out handposedd.cnnb
"""
from __future__ import annotations

import argparse

from ..assets_paths import DEFAULT_ANIMBANK, DEFAULT_MODEL_JSON
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu


def main(argv=None):
    from ..utils.platform import select_platform
    select_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("recordings", nargs="*", help=".rs recordings to train on")
    ap.add_argument("--model", default=DEFAULT_MODEL_JSON)
    ap.add_argument("--animbank", default=DEFAULT_ANIMBANK)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="add N synthetic animbank frames to the training set")
    ap.add_argument("--augment", action="store_true",
                    help="random global rigid transforms on synthetic poses")
    ap.add_argument("--init-cnnb", default=None, help="warm-start weights")
    ap.add_argument("--out", default="handposedd.cnnb")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=0.001)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..cnn.model import init_params, load_cnnb, save_cnnb
    from ..cnn.train import (TrainingSet, compress_dataset, evaluate,
                             synthetic_training_set, train_epoch)
    from ..data.animbank import load_animbank
    from ..data.dataset import load_dataset
    from ..model.bake import load_hand_model

    model = jtu.tree_map(jnp.asarray, load_hand_model(args.model))
    sets = []
    if args.recordings:
        # stream recordings through the C++ threaded reader (overlaps disk IO
        # with the TPU-side compress, like the reference's background loader
        # thread, train-cnn.cpp:61,126-138); camera comes from the .json
        from ..cnn.train import compress_frame
        from ..native import StreamingLoader
        bnames = [r[:-3] if r.endswith(".rs") else r for r in args.recordings]
        for bname in bnames:
            import json as _json
            from ..data.dataset import DatasetInfo
            with open(bname + ".json") as f:
                cam = DatasetInfo.from_json_dict(_json.load(f)).camera()
            fn = jax.jit(jax.vmap(lambda d, p: compress_frame(d, cam, p)))
            xs, ls, ps = [], [], []
            with StreamingLoader([bname], batch=64) as sl:
                print(f"streaming {bname}: {sl.total_frames} frames")
                for depth, pose, _ in sl:
                    x, l, p = fn(jnp.asarray(depth), jnp.asarray(pose))
                    xs.append(x)
                    ls.append(l)
                    ps.append(p)
            from ..cnn.train import TrainingSet as TS
            sets.append(TS(jnp.concatenate(xs), jnp.concatenate(ls),
                           jnp.concatenate(ps)))
    if args.synthetic:
        bank = load_animbank(args.animbank)
        ids = (np.arange(args.synthetic) * 613) % len(bank)
        print(f"rendering {args.synthetic} synthetic frames")
        sets.append(synthetic_training_set(model, bank, ids, augment=args.augment, seed=args.seed))
    if not sets:
        ap.error("no training data: pass recordings and/or --synthetic N")
    data = TrainingSet(*[jnp.concatenate(xs) for xs in zip(*sets)])
    print(f"training set: {data.inputs.shape[0]} frames "
          f"({data.inputs.shape[0]//2} train / {data.inputs.shape[0]//2} test)")

    params = load_cnnb(args.init_cnnb) if args.init_cnnb \
        else init_params(jax.random.PRNGKey(args.seed))
    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    done = 0
    while done < args.steps:
        n = min(args.eval_every, args.steps - done)
        params, train_mse = train_epoch(params, data, rng, n, args.batch,
                                        args.alpha)
        done += n
        test_mse = evaluate(params, data)
        ex_s = done * args.batch / (time.time() - t0)
        print(f"step {done:6d}: train mse {train_mse:.6f} "
              f"test mse {test_mse:.6f}  ({ex_s:.0f} examples/s)")
        save_cnnb(params, args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    sys.exit(main())
