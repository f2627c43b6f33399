"""Config system: nested attribute-access configs loaded from YAML.

Mirrors the reference's YAML -> recursive namespace scheme
(reference: helpers/utils.py:173-191 `load_yml_file`/`dict2namespace`,
helpers/load_data.py:301-321 `load_config`) but with a single clean
implementation, packaged config files, and no hard-coded user paths.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class Config:
    """Nested attribute-access config. Dicts become child Configs."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        if data:
            for key, value in data.items():
                setattr(self, key, Config(value) if isinstance(value, dict) else value)

    # -- dict-like helpers -------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key, value in self.__dict__.items():
            out[key] = value.to_dict() if isinstance(value, Config) else value
        return out

    def replace(self, **updates: Any) -> "Config":
        """Return a deep copy with dotted-key updates applied.

        cfg.replace(**{"model.ngf": 32, "data.image_size": 64})
        """
        new = copy.deepcopy(self)
        for dotted, value in updates.items():
            node = new
            parts = dotted.split(".")
            for part in parts[:-1]:
                child = getattr(node, part, None)
                if not isinstance(child, Config):
                    child = Config()
                    setattr(node, part, child)
                node = child
            setattr(node, parts[-1], value)
        return new

    def __contains__(self, key: str) -> bool:
        return key in self.__dict__

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Config) and self.to_dict() == other.to_dict()


# Registered dataset-level config files (reference: helpers/load_data.py:44-52).
REGISTERED_CONFIG_FILENAME = {
    "MNIST": "mnist.yml",
    "CIFAR10": "cifar10.yml",
    "CINE64": "cine64.yml",
    "CINE64_1D": "cine64_1d.yml",
    "CINE127": "cine127.yml",
    "CINE127_1D": "cine127_1d.yml",
    "ACDC": "acdc.yml",
    "SanityCheck1D": "sanity_check_1d.yml",
    # NCSNv2-paper natural-image recipes carried by the reference
    # (ncsn/configs/{celeba,bedroom,church,tower,ffhq,ncsn_original}.yml).
    "CELEBA": "celeba.yml",
    "BEDROOM": "bedroom.yml",
    "CHURCH": "church.yml",
    "TOWER": "tower.yml",
    "FFHQ": "ffhq.yml",
    "NCSN_ORIGINAL": "ncsn_original.yml",
}

DATA_MODES = ("real-valued", "mag", "complex", "real-imag", "real-imag-random")


def load_yml(path: str) -> Config:
    with open(path, "r") as f:
        return Config(yaml.safe_load(f))


def load_config(ds_name: str, mode: str = "real-valued", **overrides: Any) -> Config:
    """Load a packaged dataset config (reference: helpers/load_data.py:301-321).

    mode == "complex" doubles the input channels (real/imag stacked).
    Extra keyword args are dotted-key overrides, e.g. ``**{"model.ngf": 32}``.
    """
    assert mode in DATA_MODES, f"unknown data mode {mode}"
    assert ds_name in REGISTERED_CONFIG_FILENAME, f"unknown dataset {ds_name}"
    config = load_yml(os.path.join(_CONFIG_DIR, REGISTERED_CONFIG_FILENAME[ds_name]))
    if mode == "complex":
        config.data.channels = 2
    if overrides:
        config = config.replace(**overrides)
    return config


def load_general_config() -> Config:
    """Seg/Clf architecture + trainer constants
    (reference: ncsn/configs/general_config.yml, configs/general_configs.py:4-10)."""
    cfg = load_yml(os.path.join(_CONFIG_DIR, "general_config.yml"))
    return cfg
