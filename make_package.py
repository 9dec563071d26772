#!/usr/bin/env python
"""Package the engine for spark-submit (SURVEY.md §7 M9; north rule
"ships as a spark-submit --py-files package").

    python make_package.py
    spark-submit --master local[32] \
        --py-files dist/tree_sitter_analyzer_spark.zip __spark_entry__.py
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
DIST = os.path.join(ROOT, "dist")
PKG = "tree_sitter_analyzer_spark"


def build() -> str:
    os.makedirs(DIST, exist_ok=True)
    out = os.path.join(DIST, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(build())
