#!/usr/bin/env python
"""Build apollon_spark.zip for ``spark-submit --py-files`` (north rule:
the pipeline ships as spark-submit --py-files).

  python package_pyfiles.py [out.zip]
  spark-submit --py-files apollon_spark.zip -m apollon_spark.cli ...
"""
import os
import sys
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "apollon_spark.zip")
    root = os.path.join(HERE, "apollon_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(root):
            if "__pycache__" in dirpath:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, HERE))
    print(out)


if __name__ == "__main__":
    main()
