"""Optional golden oracle: import the reference PyTorch implementation.

The read-only reference checkout (``/root/reference``) is imported — never
copied — to cross-check our JAX math against the original CUDA/torch
implementation on CPU.  Tests that rely on it must call
:func:`require_reference` and will be skipped when the mount is absent
(e.g. on CI machines without it).
"""

from __future__ import annotations

import os
import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def require_reference():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "models")):
        pytest.skip("reference checkout not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_reference_module(name: str):
    """Import e.g. ``models.gcndiff`` from the reference tree."""
    require_reference()
    import importlib

    return importlib.import_module(name)
