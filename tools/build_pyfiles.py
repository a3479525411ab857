"""Builds the spark-submit artifact: a zip of the pgd_spark package.

    python tools/build_pyfiles.py [out.zip]
    spark-submit --py-files out.zip your_job.py

(`pgd_spark.session.get_spark` also self-ships the zip for programmatic
sessions; this script serves explicit cluster submits.)
"""

import os
import shutil
import sys
import tempfile


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "pgd_spark_pyfiles.zip"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    staging = tempfile.mkdtemp()
    shutil.copytree(os.path.join(root, "pgd_spark"), os.path.join(staging, "pgd_spark"))
    base = out[:-4] if out.endswith(".zip") else out
    shutil.make_archive(base, "zip", staging)
    shutil.rmtree(staging)
    print(f"wrote {base}.zip")


if __name__ == "__main__":
    main()
