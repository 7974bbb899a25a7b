"""Build the --py-files archive for cluster submission.

Usage:
    python scripts/package_pyfiles.py [out.zip]

Produces a zip of the ``findopendata_spark`` package suitable for

    spark-submit --master <cluster> \
        --py-files findopendata_spark.zip \
        crawler_main.py --state-dir ... --waves ...

where ``crawler_main.py`` is the copy of
``findopendata_spark/crawler/__main__.py`` this script drops next to the
zip (spark-submit needs a top-level script file; ``-m pkg`` is not a
spark-submit mode). The archive contains only source files — no tests,
no caches — so it ships to executors once and imports identically at any
cluster size (the north rule's N vs 4N runs use the same artifact).
"""

from __future__ import annotations

import os
import shutil
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "findopendata_spark"


def build(out_zip: str) -> str:
    out_zip = os.path.abspath(out_zip)
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg_root = os.path.join(REPO, PKG)
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    driver = os.path.join(os.path.dirname(out_zip), "crawler_main.py")
    shutil.copyfile(os.path.join(REPO, PKG, "crawler", "__main__.py"), driver)
    return driver


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "findopendata_spark.zip"
    driver = build(out)
    print(f"wrote {os.path.abspath(out)} and {driver}")
