"""Import shim for the upstream reference implementation at
/root/reference (ratschlab/bnn_priors, torch CPU).

The reference declares deps this environment lacks (torchvision,
gpytorch, sacred). Only trivial pieces are actually used on the code
paths the parity check drives:
  * torchvision — imported at module scope by data/CIFAR, data/MNIST;
    the parity workloads use UCI / in-memory tensors only, so an empty
    stub module suffices;
  * gpytorch — only `gpytorch.utils.transforms.inv_softplus` is used by
    the prior package (reference prior/transformed.py:4 etc.); provide
    the one-line formula;
  * sacred — only `sneaky_artifact` (reference exp_utils.py:554-562)
    touches it; stub the FileStorageObserver symbol it isinstance-checks.

This shim makes the reference importable; it does NOT alter any
reference numerics.
"""
import sys
import types

REFERENCE_PATH = "/root/reference"


def install():
    "install stub modules + sys.path so `import bnn_priors` resolves"
    import torch

    def _stub(name):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
        return sys.modules[name]

    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms")
    tv.datasets = _stub("torchvision.datasets")

    gp = _stub("gpytorch")
    gp.utils = _stub("gpytorch.utils")
    gp.utils.transforms = _stub("gpytorch.utils.transforms")

    def inv_softplus(x):
        "inverse of softplus: log(exp(x) - 1), numerically stable"
        if not torch.is_tensor(x):
            x = torch.as_tensor(x)
        return x + torch.log(-torch.expm1(-x))

    gp.utils.transforms.inv_softplus = inv_softplus

    sacred = _stub("sacred")
    observers = _stub("sacred.observers")

    class FileStorageObserver:  # isinstance target only
        pass

    observers.FileStorageObserver = FileStorageObserver
    sacred.observers = observers

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _patch_numpy2_compat()


def _patch_numpy2_compat():
    """The reference pins numpy<2 and relies on `int_array[:] = np.nan`
    silently wrapping to -2^63 (its documented int64-NaN fill pattern,
    reference exp_utils.py:516-524 and setup.py:22-24). numpy>=2 raises
    on that assignment; reproduce the old fill semantics so HDF5Metrics
    behaves exactly as it did under the reference's pinned deps."""
    import numpy as np
    from bnn_priors import exp_utils

    def _fill_nan(arr):
        if np.issubdtype(arr.dtype, np.integer):
            arr[:] = np.iinfo(arr.dtype).min  # old numpy's int(np.nan) wrap
        else:
            arr[:] = np.nan

    def _append(self, name, value, dtype):
        try:
            arr = self._cache[name]
        except KeyError:
            arr = self._cache[name] = np.empty(self.chunk_size, dtype=dtype)
            _fill_nan(arr)
        arr[self._chunk_i] = value

    def _scrub_cache(self):
        for v in self._cache.values():
            _fill_nan(v)

    exp_utils.HDF5Metrics._append = _append
    exp_utils.HDF5Metrics._scrub_cache = _scrub_cache
