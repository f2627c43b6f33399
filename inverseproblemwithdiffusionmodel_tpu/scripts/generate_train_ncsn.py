"""Emit shell job scripts for score-model training sweeps
(reference: scripts/generate_train_ncsn.py)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ds_names", nargs="+",
                   default=["MNIST", "ACDC", "CINE127"])
    p.add_argument("--set_num", type=int, choices=[1, 2, 3, 4], default=None,
                   help="reference preset: 1=MNIST 2=CINE64 3=CINE127 "
                        "4=ACDC, real-valued + complex modes each "
                        "(generate_train_ncsn.py:36-44)")
    p.add_argument("--task_name", default="Diffusion")
    p.add_argument("--mode", default="real-imag")
    p.add_argument("--save_dir", default="jobs")
    args = p.parse_args(argv)

    os.makedirs(args.save_dir, exist_ok=True)
    if args.set_num is not None:
        ds = ["MNIST", "CINE64", "CINE127", "ACDC"][args.set_num - 1]
        jobs = [(ds, mode) for mode in ("real-valued", "complex")]
    else:
        jobs = [(ds, args.mode) for ds in args.ds_names]
    for ds, mode in jobs:
        path = os.path.join(args.save_dir, f"train_ncsn_{ds}_{mode}.sh")
        with open(path, "w") as f:
            f.write("#!/bin/bash\n")
            f.write("python -m inverseproblemwithdiffusionmodel_tpu.scripts."
                    f"train_ncsn --ds_name {ds} --task_name {args.task_name} "
                    f"--mode {mode}\n")
        os.chmod(path, 0o755)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
