"""CLI argument-surface parity: every argparse flag a reference script
exposes is accepted (same name or documented alias) by our same-named
script, so a migrating user's job scripts keep working."""
import ast
import os

import pytest

REF_DIR = "/root/reference/scripts"
OUR_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "inverseproblemwithdiffusionmodel_tpu", "scripts")

# flags scripts/_common.add_common_args provides — conditionally: the
# audit must NOT credit --num_samples/--ckpt_dir to a script whose
# add_common_args call opts out of them
COMMON = {"--save_dir", "--seed", "--override",
          "--override_T", "--ckpt_dir_T", "--data_root", "--sample_idx"}


def _common_flags_of(path):
    src = open(path).read()
    flags = set(COMMON)
    if "add_common_args(" in src:
        if "num_samples=False" not in src:
            flags.add("--num_samples")
        if "ckpt=False" not in src:
            flags.add("--ckpt_dir")
    return flags


def _args_of(path):
    tree = ast.parse(open(path).read())
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute) \
                and node.func.attr == "add_argument":
            for a in node.args:
                if isinstance(a, ast.Constant) and isinstance(a.value, str):
                    out.add(a.value)
    return out


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference checkout not available")
def test_every_reference_flag_is_accepted():
    gaps = {}
    for f in sorted(os.listdir(REF_DIR)):
        if not f.endswith(".py"):
            continue
        ours = os.path.join(OUR_DIR, f)
        assert os.path.exists(ours), f"missing CLI counterpart for {f}"
        missing = _args_of(os.path.join(REF_DIR, f)) \
            - (_args_of(ours) | _common_flags_of(ours))
        if missing:
            gaps[f] = sorted(missing)
    assert not gaps, f"reference flags not accepted: {gaps}"
