"""Build the --py-files zip for spark-submit deployment.

    python scripts/make_pyfiles_zip.py [out.zip]

Packs every ``baguetter_spark/**/*.py`` (no __pycache__, no tests) into a
zip whose internal layout keeps the package root, so both the driver and
the executors' UDF-unpickling resolve ``import baguetter_spark`` from the
zip alone:

    spark-submit --py-files baguetter_spark.zip baguetter_spark/cli.py \
        build-index --input .../transcripts --output .../index

Verified end-to-end (build-index + search from a clean cwd) — see
cli.py's module docstring.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> int:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "baguetter_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "baguetter_spark.zip"
    n = build_zip(out)
    print(f"{out}: {n} modules")
