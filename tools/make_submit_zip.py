"""Build engine.zip for ``spark-submit --py-files`` deployment.

The north-rule launch shape is

    python tools/make_submit_zip.py /tmp/engine.zip
    spark-submit --py-files /tmp/engine.zip jobs/run_pipeline.py ...

spark-submit puts the zip on the driver's sys.path and ships it to every
executor, so the package must be importable from the archive root —
source files only, no __pycache__, no tests. tests/test_submit.py proves
the whole flow end-to-end against a real spark-submit.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str, repo: str = REPO) -> str:
    pkg = os.path.join(repo, "geocore_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, repo))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(build(out))
