"""Export a training run's prior to a git-trackable bf16 artifact.

The workspace is wiped between build rounds and `runs/` is gitignored, so
a multi-hour prior (round 3 lost its 30k-step ACDC checkpoint this way)
must be persisted INSIDE the repo. This converts the rolling
`train_state.ckpt` (1.5 GB: f32 params + Adam moments + EMA) into the
minimal durable form: bf16 raw params + bf16 EMA params + META.json
(~188 MB each — bf16 halves the blob at negligible quality cost; Adam
moments are deliberately dropped and re-warm in O(100) steps on resume
via train_acdc_prior.py --warm_start).

  python examples/export_prior_artifact.py \
      --run runs/acdc_prior_80k --out artifacts/acdc_prior

Pure host-side (no TPU / no model init): the checkpoint is decoded with
msgpack_restore, which needs no target pytree.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import ml_dtypes
from flax import serialization


def _cast_leaves(tree, dtype):
    if isinstance(tree, dict):
        return {k: _cast_leaves(v, dtype) for k, v in tree.items()}
    arr = np.asarray(tree)
    return arr.astype(dtype) if np.issubdtype(arr.dtype, np.floating) \
        else arr


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs/acdc_prior_80k")
    p.add_argument("--out", default="artifacts/acdc_prior")
    args = p.parse_args(argv)

    ckpt = os.path.join(args.run, "train_state.ckpt")
    blob = serialization.msgpack_restore(open(ckpt, "rb").read())
    step = int(blob["step"])
    state = blob["state"]
    raw = _cast_leaves(state["params"], ml_dtypes.bfloat16)
    ema = _cast_leaves(state["ema"]["params"], ml_dtypes.bfloat16)

    os.makedirs(args.out, exist_ok=True)
    for name, tree in (("raw_bf16.msgpack", raw), ("ema_bf16.msgpack", ema)):
        path = os.path.join(args.out, name)
        with open(path + ".tmp", "wb") as f:
            f.write(serialization.msgpack_serialize(tree))
        os.replace(path + ".tmp", path)
    fp_path = ckpt + ".fp"
    meta = {"step": step,
            "fingerprint": (open(fp_path).read().strip()
                            if os.path.exists(fp_path) else None),
            "source": ckpt}
    with open(os.path.join(args.out, "META.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"exported step {step} -> {args.out} "
          f"(raw+ema bf16, {os.path.getsize(os.path.join(args.out, 'raw_bf16.msgpack')) / 1e6:.0f} MB each)")


if __name__ == "__main__":
    main()
