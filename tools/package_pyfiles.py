"""Package the engine for spark-submit --py-files.

Writes dist/fs_schema_validator_spark.zip containing the library (no
tests, no caches) and prints the submit command. The zip rides to every
executor; the driver entry point is the package CLI.

Usage: python tools/package_pyfiles.py [out_dir]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist"
    out_dir.mkdir(parents=True, exist_ok=True)
    zip_path = out_dir / "fs_schema_validator_spark.zip"
    pkg = REPO / "fs_schema_validator_spark"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    print(f"wrote {zip_path}")
    print(
        "submit with:\n"
        f"  spark-submit --py-files {zip_path} \\\n"
        "      --conf spark.sql.adaptive.enabled=true \\\n"
        "      --conf spark.sql.execution.arrow.pyspark.enabled=true \\\n"
        f"      {REPO}/fs_schema_validator_spark/__main__.py validate \\\n"
        "      --rules rules.yaml --table <table> --output <sink>"
    )


if __name__ == "__main__":
    main()
