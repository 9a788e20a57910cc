#!/usr/bin/env python
"""Build the ``--py-files`` artifact: dist/abecto_spark.zip.

spark-submit distributes this zip to the driver and every executor and
puts it on sys.path, so ``import abecto_spark`` works cluster-wide with
no install step (the package is pure Python — pyspark/pyarrow/pandas/
numpy/duckdb come from the cluster image). Usage:

    python scripts/make_pyfiles.py [dest_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, "abecto_spark.zip")
    pkg = os.path.join(REPO, "abecto_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist")
    print(build(dest))
