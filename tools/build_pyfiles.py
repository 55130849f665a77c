"""Build the spark-submit distribution zip: dist/debezium_spark.zip.

The cluster deployment shape (SURVEY.md §3.3, the Debezium Server analogue)
is::

    spark-submit --master <cluster> --py-files dist/debezium_spark.zip \
        tools/server_main.py --config application.properties

The zip is DETERMINISTIC — sorted member order, fixed timestamps, no
__pycache__ — so re-builds of the same tree are byte-identical and a cluster
cache (spark.files / YARN localization) never re-ships an unchanged package.
Prints one JSON line: {"path": ..., "sha256": ..., "n_files": ...}.

Usage: python tools/build_pyfiles.py [out_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "debezium_spark"


def build(out_dir: str | None = None) -> dict:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PACKAGE}.zip")

    members: list[str] = []
    pkg_root = os.path.join(REPO, PACKAGE)
    for root, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            members.append(os.path.join(root, f))

    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in members:
            arcname = os.path.relpath(path, REPO)
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(path, "rb") as f:
                zf.writestr(info, f.read())

    with open(out, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    return {"path": out, "sha256": digest, "n_files": len(members)}


if __name__ == "__main__":
    print(json.dumps(build(sys.argv[1] if len(sys.argv) > 1 else None)))
