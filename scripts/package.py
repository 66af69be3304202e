"""Build the spark-submit artifact (north_rule: "the whole job ships via
spark-submit --py-files"): zip the propertygraph_spark package so a bare
driver script can import it on every executor.

    python scripts/package.py              # -> dist/propertygraph_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/propertygraph_spark.zip \\
        propertygraph_spark/main.py --input-parquet ... --out ...

The zip carries ONLY the package (no tests, no caches); executors unpack
it onto sys.path, so the Arrow-UDF kernel imports cleanly worker-side.
tests/test_submit.py runs the real spark-submit against this artifact.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "propertygraph_spark")
DIST = os.path.join(ROOT, "dist")


def build(dest: str | None = None) -> str:
    dest = dest or os.path.join(DIST, "propertygraph_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(PKG):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return dest


if __name__ == "__main__":
    path = build()
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path}: {n} files")
