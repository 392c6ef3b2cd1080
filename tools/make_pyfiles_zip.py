"""Package bloomfilter_spark/ into bloomfilter_spark.zip for
spark-submit --py-files (north-rule deployment contract)."""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "bloomfilter_spark.zip") -> str:
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(ROOT, "bloomfilter_spark")
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out_path)
    return out_path


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bloomfilter_spark.zip")
