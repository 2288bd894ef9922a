"""Build the --py-files artifact for spark-submit deployment.

The north rule runs the engine via ``spark-submit --py-files`` on a
multi-executor cluster; this packages ``gamechanger_data_spark`` (plus the
driver-contract module) into one zip:

    python tools/make_pyfiles.py            # -> dist/gamechanger_data_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/gamechanger_data_spark.zip bench.py

On a real cluster only --master changes (YARN/k8s); the entry points are
identical. tests/test_spark_submit.py exercises the full path locally.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(ROOT, "dist", "gamechanger_data_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(ROOT, "gamechanger_data_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
        z.write(os.path.join(ROOT, "__spark_entry__.py"), "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
