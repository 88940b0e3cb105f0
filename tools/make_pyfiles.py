"""Build the --py-files zip for spark-submit.

Usage: python tools/make_pyfiles.py [out.zip]
Produces a zip containing the davar_lab_ocr_spark package, suitable for
  spark-submit --py-files davar_lab_ocr_spark.zip tools/run_extract.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "davar_lab_ocr_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "davar_lab_ocr_spark.zip")
    print(build(out))
