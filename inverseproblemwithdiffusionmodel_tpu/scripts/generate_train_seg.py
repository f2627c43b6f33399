"""Emit shell job scripts for seg/clf training
(reference: scripts/generate_train_seg.py)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ds_names", nargs="+", default=["ACDC"])
    p.add_argument("--set_num", type=int, choices=[1, 2, 3, 4],
                   default=None,
                   help="reference preset (only set 1 = ACDC "
                        "real-valued is populated there, "
                        "generate_train_seg.py:36-48)")
    p.add_argument("--save_dir", default="jobs")
    args = p.parse_args(argv)

    os.makedirs(args.save_dir, exist_ok=True)
    if args.set_num is not None:
        args.ds_names = ["ACDC"] if args.set_num == 1 else []
    for ds in args.ds_names:
        path = os.path.join(args.save_dir, f"train_seg_{ds}.sh")
        with open(path, "w") as f:
            f.write("#!/bin/bash\n")
            f.write("python -m inverseproblemwithdiffusionmodel_tpu.scripts."
                    f"train_seg --ds_name {ds}\n")
        os.chmod(path, 0o755)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
