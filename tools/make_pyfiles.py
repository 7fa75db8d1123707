"""Build tegola_spark.zip for `spark-submit --py-files`.

Usage: python tools/make_pyfiles.py [out.zip]
Prints the absolute path of the written archive.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "tegola_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, root))
    return os.path.abspath(out)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "tegola_spark.zip"))
