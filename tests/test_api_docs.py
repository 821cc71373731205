"""docs/API.md is generated (tools/gen_api_docs.py) and must stay in sync."""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_docs_in_sync():
    r = subprocess.run(
        [sys.executable, "tools/gen_api_docs.py", "--check"],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    assert r.returncode == 0, r.stderr


def test_package_version_matches_pyproject():
    import tomllib

    import tube_mpc_tpu

    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert tube_mpc_tpu.__version__ == meta["project"]["version"]
