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


# Default cache is COMMITTED test data (tests/oracle_fixtures/) so the fast
# tier is fast on a fresh clone — round 3 measured ~10 min cold vs ~4 min warm
# because the default used to live in /tmp. Point TUBE_MPC_ORACLE_CACHE
# elsewhere (or delete files here) to force fresh oracle runs.
_ORACLE_CACHE = os.environ.get(
    "TUBE_MPC_ORACLE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle_fixtures"),
)


def cached_oracle(key: str, compute):
    """Disk-cache a torch-oracle result (dict of ndarrays) keyed by `key`.

    The oracle runs are deterministic (seeded torch on CPU f64) but cost seconds
    to minutes each; caching them makes slow-tier reruns cheap. Include EVERY
    input that affects the result in `key` (config json + seed) — the key is
    hashed, so arbitrary length is fine. Delete the cache dir (or point
    TUBE_MPC_ORACLE_CACHE elsewhere) to force fresh oracle runs.
    """
    import hashlib

    import numpy as np

    path = os.path.join(_ORACLE_CACHE,
                        hashlib.sha1(key.encode()).hexdigest()[:20] + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    out = compute()
    os.makedirs(_ORACLE_CACHE, exist_ok=True)
    np.savez(path, **out)
    return out
