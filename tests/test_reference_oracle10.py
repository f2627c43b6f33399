"""Reference-oracle parity wave 10: the FULL continuous config tree.

Every ml_collections leaf under /root/reference/configs/{ve,vp,subvp}
(38 files) is imported and compared key-by-key against
`configs_continuous.get_continuous_config(<same path>)` — training,
sampling, eval, data, model and optim sections.

Skipped keys: `device` (torch placement), `tfrecords_path` (hard-coded
user paths, SURVEY 7 known-broken), and `training.continuouse` — a typo in
configs/ve/ncsnv2/bedroom.py:28 that leaves the real `continuous` flag at
the LSUN default True for a discrete NCSNv2 recipe; we set
`training.continuous = False` (the evident intent) and pin the defect here.

No reference code is copied - the reference runs as an opaque oracle.
"""
import glob
import importlib
import os
import sys

import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"

SKIP_KEYS = {"device", "tfrecords_path", "continuouse"}

LEAVES = sorted(
    os.path.relpath(f, os.path.join(REF_ROOT, "configs"))[:-3]
    for f in glob.glob(os.path.join(REF_ROOT, "configs", "*", "**", "*.py"),
                       recursive=True))


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference tree unavailable")
    # the leaves do `from configs.default_*_configs import ...`: they need
    # the reference ROOT itself on sys.path (read-only import)
    sys.path.insert(0, REF_ROOT)
    yield
    sys.path.remove(REF_ROOT)


def _norm(v):
    if isinstance(v, tuple):
        return list(v)
    if isinstance(v, float) and float(v).is_integer():
        return v  # keep floats as-is; compare via ==, 1.0 == 1 anyway
    return v


@pytest.mark.parametrize("leaf", LEAVES)
def test_continuous_config_leaf_matches_reference(leaf):
    from inverseproblemwithdiffusionmodel_tpu.configs_continuous import (
        get_continuous_config)
    mod = importlib.import_module("configs." + leaf.replace("/", "."))
    want = mod.get_config()
    got = get_continuous_config(leaf)

    # configs/ve/ncsnv2/bedroom.py:28 typo'd `training.continuouse = False`,
    # leaving the real flag at the LSUN default True for a discrete NCSNv2
    # recipe; we deliberately set continuous=False, so exclude that key.
    skip = SKIP_KEYS | ({"continuous"} if leaf == "ve/ncsnv2/bedroom"
                        else set())
    mismatches = []
    for section in ("training", "sampling", "eval", "data", "model",
                    "optim"):
        ref_sec = getattr(want, section, None)
        if ref_sec is None:
            continue
        our_sec = got.get(section)
        for k, v in ref_sec.items():
            if k in skip:
                continue
            if our_sec is None or our_sec.get(k, "<MISSING>") is None \
                    and v is not None:
                mismatches.append((f"{section}.{k}", v, "<MISSING>"))
                continue
            ours = our_sec.get(k, "<MISSING>") if our_sec is not None \
                else "<MISSING>"
            if _norm(ours) != _norm(v):
                mismatches.append((f"{section}.{k}", v, ours))
    assert not mismatches, f"{leaf}: {mismatches}"


def test_all_reference_leaves_enumerated():
    assert len(LEAVES) == 39, LEAVES


# ---------------------------------------------------------------------------
# discrete YAML configs (ncsn/configs/*.yml): ours must carry every
# reference key with an equal value (we may add keys; never drop/change)
# ---------------------------------------------------------------------------

YAMLS = sorted(os.path.basename(f) for f in glob.glob(
    os.path.join(REF_ROOT, "ncsn", "configs", "*.yml")))


@pytest.mark.parametrize("yml", YAMLS)
def test_discrete_yaml_superset_of_reference(yml):
    import yaml as pyyaml
    import inverseproblemwithdiffusionmodel_tpu as pkg
    ours_name = yml.replace("sanity_check_1D", "sanity_check_1d")
    ours_path = os.path.join(os.path.dirname(pkg.__file__), "configs",
                             ours_name)
    want = pyyaml.safe_load(open(os.path.join(
        REF_ROOT, "ncsn", "configs", yml)))
    got = pyyaml.safe_load(open(ours_path))
    mismatches = []

    def walk(ref_node, our_node, prefix=""):
        if isinstance(ref_node, dict):
            for k, v in ref_node.items():
                if not isinstance(our_node, dict) or k not in our_node:
                    mismatches.append((prefix + k, v, "<MISSING>"))
                else:
                    walk(v, our_node[k], prefix + k + ".")
        elif ref_node != our_node:
            mismatches.append((prefix.rstrip("."), ref_node, our_node))

    walk(want, got)
    assert not mismatches, f"{yml}: {mismatches}"
    assert len(YAMLS) == 15
