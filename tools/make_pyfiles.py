"""Build dist/hex2vec_spark.zip for spark-submit --py-files (north_rule:
'runs via spark-submit --py-files on multi-executor clusters').

Usage: python tools/make_pyfiles.py  ->  dist/hex2vec_spark.zip
Smoke:  spark-submit --master local[2] --py-files dist/hex2vec_spark.zip \
            tools/submit_job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "hex2vec_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "hex2vec_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
