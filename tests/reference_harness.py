"""Helpers to run the PyTorch reference (read-only at /root/reference) as an oracle.

The reference expects to be imported as the package ``diff_tube_mpc_strict_pt``; we
expose it via a symlink under /tmp (never writing into /root/reference).
"""
import os
import sys

_PKG_DIR = "/tmp/_refpkg"
_LINK = os.path.join(_PKG_DIR, "diff_tube_mpc_strict_pt")


def import_reference():
    os.makedirs(_PKG_DIR, exist_ok=True)
    if not os.path.islink(_LINK):
        os.symlink("/root/reference", _LINK)
    if _PKG_DIR not in sys.path:
        sys.path.insert(0, _PKG_DIR)
    import diff_tube_mpc_strict_pt  # noqa: F401

    return sys.modules["diff_tube_mpc_strict_pt"]
