"""Build the `--py-files` deployment artifact: a zip of the frizbee_spark
package (source only, no tests/caches), reproducibly ordered.

Usage: python tools/make_pyfiles_zip.py [out.zip]   (default: dist/frizbee_spark.zip)

The zip is what `spark-submit --py-files frizbee_spark.zip job.py` ships to
executors; tests/test_sources.py::test_spark_submit_pyfiles_smoke runs a
real spark-submit against it.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).parent.parent


def build(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p
        for p in (REPO / "frizbee_spark").rglob("*.py")
        if "__pycache__" not in p.parts
    )
    # deflate + fixed timestamps: reproducible for a given zlib build
    # (deflate output can differ across zlib versions — ADVICE r5)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "frizbee_spark.zip"
    built = build(out)
    print(built)
