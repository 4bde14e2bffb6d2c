"""Build the spark-submit --py-files artifact: dist/gensor_spark.zip + job.py.

North rule: "the whole engine ships as a spark-submit --py-files package".
The zip contains the pure-Python ``gensor_spark`` package (no data, no
tests); ``job.py`` is a thin shim importing ``gensor_spark.__main__``.

Usage: python scripts/make_package.py [dist_dir]
Then:  spark-submit --py-files <dist>/gensor_spark.zip <dist>/job.py --help
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

JOB_SHIM = """\
from gensor_spark.__main__ import main

if __name__ == "__main__":
    main()
"""


def build(dist: Path) -> Path:
    repo = Path(__file__).resolve().parent.parent
    dist.mkdir(parents=True, exist_ok=True)
    zip_path = dist / "gensor_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((repo / "gensor_spark").rglob("*.py")):
            zf.write(py, py.relative_to(repo))
    (dist / "job.py").write_text(JOB_SHIM)
    return zip_path


if __name__ == "__main__":
    out = build(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("dist"))
    print(out)
