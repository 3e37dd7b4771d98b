#!/usr/bin/env python
"""Package scripts_spark/ into dist/scripts_spark.zip for
``spark-submit --py-files`` (pure-Python package, no build step)."""

from __future__ import annotations

import os
import zipfile

OUT = "dist/scripts_spark.zip"


def main() -> None:
    os.makedirs("dist", exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk("scripts_spark"):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    path = os.path.join(root, f)
                    z.write(path, path)
    print(OUT, os.path.getsize(OUT), "bytes")


if __name__ == "__main__":
    main()
