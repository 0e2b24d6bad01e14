"""Load the reference repositories' own model code as importable packages.

The reference trees under /root/reference are plain directories (no
setup.py, some without __init__.py) whose modules do package-relative
imports and assume CUDA + compressai + torchvision. This loader:

  * registers a namespace package under a UNIQUE alias per reference repo
    (their package dirs are all called ``model``/``b_model``), so the
    ICIP2023 and ICIP2024 ``model`` packages can coexist;
  * ensures the compressai/torchvision SHIMS (tests/refshim) resolve
    before executing any reference module;
  * neutralizes the hard-coded ``device = torch.device("cuda")`` globals
    and ``.cuda()`` calls so the code runs on torch-cpu.

Nothing from the reference is copied — its files are executed in place as
a numerical oracle (VERDICT r3 task #1).
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import sys

REFSHIM_DIR = os.path.dirname(os.path.abspath(__file__))
REFERENCE_ROOT = "/root/reference"


def install_shims():
    """Put the compressai/torchvision shims at the front of sys.path and
    make ``Tensor.cuda()`` / ``Module.cuda()`` no-ops (the flexrate
    backwarp calls .cuda() on freshly built grids)."""
    if REFSHIM_DIR not in sys.path:
        sys.path.insert(0, REFSHIM_DIR)
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self


def load_ref_package(alias: str, pkg_dir: str, entry: str):
    """Register ``pkg_dir`` as package ``alias`` and import
    ``alias.entry``; returns the entry module. Any module-level ``device``
    global in the package's modules is re-pointed at CPU afterwards."""
    install_shims()
    import torch

    if alias not in sys.modules:
        spec = importlib.machinery.ModuleSpec(alias, None, is_package=True)
        spec.submodule_search_locations = [pkg_dir]
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[alias] = pkg
    mod = importlib.import_module(f"{alias}.{entry}")
    cpu = torch.device("cpu")
    for name, m in list(sys.modules.items()):
        if name.startswith(alias + ".") and getattr(m, "device", None) is not None:
            if isinstance(m.device, torch.device):
                m.device = cpu
    return mod


def lhbdc_model():
    """-> the reference LHBDC Model class (LHBDC/model/m.py:20)."""
    m = load_ref_package(
        "ref_lhbdc", os.path.join(REFERENCE_ROOT, "LHBDC", "model"), "m"
    )
    return m.Model


def flexrate_model():
    """-> the reference Flex-Rate BidirFlowRef class (b_model/b_model.py)."""
    m = load_ref_package(
        "ref_flexrate",
        os.path.join(
            REFERENCE_ROOT, "Flex-Rate-Hier-Bidir-Video-Compression", "b_model"
        ),
        "b_model",
    )
    return m


def icip2023_model():
    """-> the reference DeformB (v3) package entry (ICIP2023/src/model/m.py)."""
    return load_ref_package(
        "ref_icip2023", os.path.join(REFERENCE_ROOT, "ICIP2023", "src", "model"), "m"
    )


def icip2023_elic():
    """-> the reference ELIC intra module (ICIP2023/src/model/elic.py:87),
    the I-frame codec both ICIP2023 and ICIP2024 evaluate with."""
    return load_ref_package(
        "ref_icip2023",
        os.path.join(REFERENCE_ROOT, "ICIP2023", "src", "model"),
        "elic",
    )


def icip2024_model():
    """-> the reference FlowGuidedB (v4) package entry (ICIP2024/src/model/m.py)."""
    return load_ref_package(
        "ref_icip2024", os.path.join(REFERENCE_ROOT, "ICIP2024", "src", "model"), "m"
    )
