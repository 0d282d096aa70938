"""Packaging for cluster submission: zip the package for
``spark-submit --py-files`` (north_rule deployment path)."""

from __future__ import annotations

import os
import zipfile


def make_pyfiles_zip(out_path: str) -> str:
    """Zip fasta_windows_spark/ for --py-files distribution to executors."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out_path
