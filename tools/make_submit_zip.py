"""Package the library for `spark-submit --py-files` (north_rule
deployment shape): writes dist/biomedical_el_spark.zip (the package,
importable on every executor) and dist/linkage_submit.py (a thin driver
stub spark-submit can take as its primary file, since the primary file
itself is not importable from a zip).

Usage: python tools/make_submit_zip.py   # then see jobs/linkage_submit.py
"""

from __future__ import annotations

import os
import zipfile

STUB = """\
# spark-submit primary file: delegates to the packaged job module
# (shipped alongside via --py-files biomedical_el_spark.zip).
from biomedical_el_spark.jobs.linkage_submit import main

if __name__ == "__main__":
    main()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "biomedical_el_spark")
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    zip_path = os.path.join(dist, "biomedical_el_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, repo))
    stub_path = os.path.join(dist, "linkage_submit.py")
    with open(stub_path, "w") as f:
        f.write(STUB)
    print(f"wrote {zip_path} and {stub_path}")


if __name__ == "__main__":
    main()
