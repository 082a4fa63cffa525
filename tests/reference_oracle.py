"""Load and execute the REFERENCE's actual attack code as the golden oracle.

Rather than re-enacting ``custom_knn`` / ``Loss.forward`` in hand-written
torch (which could encode the same misunderstanding twice), this harness
imports ``/root/reference/attack_models/fbb.py`` and ``utils.py`` and runs
their bytes on CPU. The only shims are for things absent in this
environment, none of which change the computed numbers:

* ``torchvision`` is not installed and its pretrained download needs
  network egress — a stub provides ``models.vgg16(pretrained=...)`` whose
  ``.features`` Sequential carries the SAME surrogate backbone weights our
  ``default_lpips_params('vgg')`` uses (layout identical to torchvision's
  vgg16: convs at 0,2,5,...,28; ReLU between; MaxPool at 4,9,16,23,30 —
  ``pretrained_networks.py:96-134`` slices it at exactly those indices).
  The real ``vgg.pth`` lin heads still load from the reference tree
  (``dist_model.py:69-75``).
* ``wandb`` / ``skimage`` are import-time-only deps of modules whose
  logging/colorspace paths the attack never touches — stub modules.
* ``Tensor.cuda`` / ``Module.cuda`` are no-op'd: the reference hardcodes
  ``use_gpu=True`` in ``lpips_pytorch/__init__.py:14`` and PNetLin moves
  its buffers with ``.cuda()`` (``networks_basic.py:118-132``); on a
  CUDA-less host the same objects stay on CPU, values unchanged.
"""

from __future__ import annotations

import contextlib
import importlib
import os
import sys
import types

import numpy as np
import torch

REF_ATTACK_DIR = "/root/reference/attack_models"

_loaded: dict | None = None


def _build_torchvision_stub() -> types.ModuleType:
    """torchvision stand-in: ``models.vgg16().features`` with our surrogate
    backbone weights in torchvision's exact module layout."""
    from ganleaks_tpu.ops.lpips import default_lpips_params

    convs = default_lpips_params("vgg")["convs"]

    def make_features() -> torch.nn.Sequential:
        layers: list[torch.nn.Module] = []
        ci = 0
        # torchvision vgg16 cfg 'D': 2,2,3,3,3 convs with pools between
        for n_convs in (2, 2, 3, 3, 3):
            for _ in range(n_convs):
                kern = np.asarray(convs[ci]["kernel"])  # HWIO
                bias = np.asarray(convs[ci]["bias"])
                conv = torch.nn.Conv2d(kern.shape[2], kern.shape[3], 3,
                                       stride=1, padding=1)
                with torch.no_grad():
                    conv.weight.copy_(
                        torch.from_numpy(kern.transpose(3, 2, 0, 1)))
                    conv.bias.copy_(torch.from_numpy(bias))
                layers += [conv, torch.nn.ReLU(inplace=True)]
                ci += 1
            layers.append(torch.nn.MaxPool2d(2, 2))
        return torch.nn.Sequential(*layers)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_transforms = types.ModuleType("torchvision.transforms")

    def vgg16(pretrained=True, **kw):
        return types.SimpleNamespace(features=make_features())

    tv_models.vgg16 = vgg16
    tv.models = tv_models
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.transforms"] = tv_transforms
    return tv


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_attack():
    """Import the reference's ``fbb`` and ``utils`` modules (cached).

    Returns ``(fbb_module, utils_module)`` with ``custom_knn`` and ``Loss``
    executable on CPU.
    """
    global _loaded
    if _loaded is not None:
        return _loaded["fbb"], _loaded["utils"]

    if "torchvision" not in sys.modules:
        _build_torchvision_stub()
    if "wandb" not in sys.modules:
        _stub_module("wandb", init=lambda *a, **k: None,
                     log=lambda *a, **k: None)
    if "skimage" not in sys.modules:
        sk = _stub_module("skimage", color=types.SimpleNamespace(),
                          transform=types.SimpleNamespace())
        sys.modules["skimage.color"] = sk.color  # type: ignore[assignment]
        sys.modules["skimage.transform"] = sk.transform  # type: ignore[assignment]

    if REF_ATTACK_DIR not in sys.path:
        sys.path.insert(0, REF_ATTACK_DIR)
    with reference_torch_env():
        ref_utils = importlib.import_module("utils")
        if not hasattr(ref_utils, "Loss"):  # a different 'utils' won
            raise ImportError(
                "top-level module name 'utils' was already taken; "
                "reference attack_models/utils.py did not import")
        ref_fbb = importlib.import_module("fbb")

    _loaded = {"fbb": ref_fbb, "utils": ref_utils}
    return ref_fbb, ref_utils


@contextlib.contextmanager
def reference_torch_env():
    """Apply the CPU-compat patches ONLY while reference code runs, and
    restore the real torch API afterwards — a permanent monkeypatch of
    ``torch.load``/``.cuda`` would leak into unrelated tests in the same
    pytest process (e.g. converter tests relying on torch.load's real
    behavior) and make outcomes order-dependent.

    Patches: ``Tensor.cuda``/``Module.cuda`` become no-ops (the reference
    hardcodes ``use_gpu=True``; on a CUDA-less host the objects stay on
    CPU, values unchanged) and ``torch.load`` defaults
    ``map_location='cpu'`` (vgg.pth stores CUDA-located tensors,
    ``dist_model.py:69-75`` loads without map_location)."""
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    orig_load = torch.load

    def _cpu_load(*a, **k):
        k.setdefault("map_location", "cpu")
        return orig_load(*a, **k)

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]
    torch.load = _cpu_load
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_tensor_cuda  # type: ignore[method-assign]
        torch.nn.Module.cuda = orig_module_cuda  # type: ignore[method-assign]
        torch.load = orig_load


def reference_fbb_search(syn: np.ndarray, queries: np.ndarray,
                         distance: str = "l2-lpips",
                         batch_size: int = 8,
                         loss_obj=None):
    """Run the reference's real ``custom_knn`` loop (``fbb.py:73-88``) over
    NHWC float arrays in [-1, 1]. Returns (losses, nn_indices) and the Loss
    object for reuse across calls (building it re-runs DistModel setup)."""
    fbb, ref_utils = load_reference_attack()

    with reference_torch_env():
        loss = loss_obj
        if loss is None:
            with torch.no_grad():
                loss = ref_utils.Loss(distance)
        args = types.SimpleNamespace(BATCH_SIZE=batch_size)
        syn_t = torch.from_numpy(
            np.ascontiguousarray(syn.transpose(0, 3, 1, 2)))
        out_d, out_i = [], []
        with torch.no_grad():
            for q in queries:
                qt = torch.from_numpy(
                    np.ascontiguousarray(q.transpose(2, 0, 1)))
                d, i = fbb.custom_knn(syn_t, qt, loss, args)
                out_d.append(d)
                out_i.append(i)
    return np.asarray(out_d), np.asarray(out_i), loss
