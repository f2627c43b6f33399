"""Data pipeline: dataset loaders (with hermetic synthetic fallbacks) and
host-side numpy transforms (MONAI-free replacement for
helpers/load_data.py)."""
from .datasets import (ArrayDataset, REGISTERED_DATA_ROOT_DIR, load_data,
                       load_mnist, load_cifar10, load_cine, load_acdc,
                       load_sanity_check_1d, load_tissue_data, vol2slice,
                       data_provenance, reset_provenance,
                       synthetic_digits, synthetic_cine, synthetic_acdc_slice)
from . import transforms

__all__ = [
    "ArrayDataset", "REGISTERED_DATA_ROOT_DIR", "load_data", "load_mnist",
    "data_provenance", "reset_provenance",
    "load_cifar10", "load_cine", "load_acdc", "load_sanity_check_1d",
    "load_tissue_data", "vol2slice", "synthetic_digits", "synthetic_cine",
    "synthetic_acdc_slice", "transforms",
]
