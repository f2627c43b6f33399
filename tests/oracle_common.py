"""Shared machinery for reference-oracle parity tests.

Makes `/root/reference` importable as the namespace package
`InverseProblemWithDiffusionModel` (the name its intra-repo imports use),
with the heavy deps this image lacks stubbed out, and with
`torch.utils.cpp_extension.load` replaced by a dummy so the `op/` modules
import without a CUDA toolchain (their CPU dispatch never touches the
compiled extension: op/upfirdn2d.py:148-150, op/fused_act.py:96-100).

No reference code is copied anywhere - the reference runs as an opaque
oracle inside the test process.
"""
import importlib
import os
import sys
import tempfile
import types

REF_ROOT = "/root/reference"
_PKG = "InverseProblemWithDiffusionModel"


def stub_module(name: str, **attrs):
    """Install a minimal stand-in for a dep absent from this image."""
    if name in sys.modules:
        return sys.modules[name]
    try:
        return __import__(name)
    except ImportError:
        pass
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent_name, child = name.rsplit(".", 1)
        parent = stub_module(parent_name)
        setattr(parent, child, mod)
    return mod


def _install_reference_path():
    """Symlink so `import InverseProblemWithDiffusionModel.x` resolves to
    /root/reference/x. Idempotent."""
    root = os.path.join(tempfile.gettempdir(), "ref_oracle_root")
    link = os.path.join(root, _PKG)
    os.makedirs(root, exist_ok=True)
    if not os.path.islink(link):
        os.symlink(REF_ROOT, link)
    if root not in sys.path:
        sys.path.insert(0, root)


def load_reference(*dotted):
    """Import reference submodules (e.g. 'ncsn.models') and return them as a
    namespace. Raises ImportError/OSError on an unusable environment - tests
    wrap this via the `ref_modules` helper below."""
    import torch.utils.cpp_extension as cpp_ext

    stub_module("SimpleITK")
    stub_module("torchvision")
    stub_module("torchvision.utils", make_grid=lambda *a, **k: None)
    stub_module("monai")
    stub_module("monai.networks")
    stub_module("monai.networks.nets", UNet=object)
    if not getattr(cpp_ext, "_oracle_stubbed", False):
        cpp_ext.load = lambda *a, **k: types.SimpleNamespace()
        cpp_ext._oracle_stubbed = True

    _install_reference_path()
    ns = types.SimpleNamespace()
    for name in dotted:
        mod = importlib.import_module(f"{_PKG}.{name}")
        setattr(ns, name.replace(".", "_"), mod)
    return ns


def ref_modules(pytest, *dotted):
    """load_reference with pytest.skip on an unusable environment."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference tree not available")
    try:
        return load_reference(*dotted)
    except Exception as e:  # pragma: no cover - environment-specific
        pytest.skip(f"reference import failed: {e!r}")
