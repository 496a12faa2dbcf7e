"""Build the spark-submit artifact (north_rule: ships via --py-files).

Usage:
    python tools/package.py [out.zip]
    spark-submit --py-files log_analysis_spark.zip \
        -m log_analysis_spark.plans.job --input ... --out ...

Zips the package with deterministic entries (sorted, zeroed timestamps) so
repeated builds are byte-identical — convenient for cluster-side caching.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "log_analysis_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "log_analysis_spark.zip")
    print(build(out))
