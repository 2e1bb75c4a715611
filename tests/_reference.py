"""Helper to import the upstream reference implementation as a test oracle.

The reference lives at /root/reference (read-only).  We import its
torch-only modules (models/pytorch/*, models/layers.py) to check per-layer
numerical parity, as required by BASELINE.json.  Tests that use it must be
skipped when the reference or torch is unavailable.
"""

import os
import sys

REFERENCE_PATH = os.environ.get("PNA_REFERENCE_PATH", "/root/reference")


def reference_available() -> bool:
    if not os.path.isdir(REFERENCE_PATH):
        return False
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return True


def add_reference_to_path():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
