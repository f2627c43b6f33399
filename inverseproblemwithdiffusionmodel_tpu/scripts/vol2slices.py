"""ACDC volume -> per-slice .npz prep (reference: scripts/vol2slices.py)."""
from __future__ import annotations

import argparse

from ..data import vol2slice


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root_dir", required=True)
    p.add_argument("--save_dir", required=True)
    args = p.parse_args(argv)
    written = vol2slice(args.root_dir, args.save_dir)
    print(f"wrote {len(written)} slice files -> {args.save_dir}")


if __name__ == "__main__":
    main()
