"""Build dist/liatrio_otel_collector_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "liatrio_otel_collector_spark"
DIST = REPO / "dist"


def main() -> None:
    DIST.mkdir(exist_ok=True)
    out = DIST / "liatrio_otel_collector_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(PKG.rglob("*.py")):
            z.write(f, f"{PKG.name}/{f.relative_to(PKG)}")
    print(out)


if __name__ == "__main__":
    main()
