"""North-rule packaging: the engine must run via ``spark-submit
--py-files engine.zip`` with NO repo checkout on the driver — imports
and the bundled document config both resolve through the zip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

pyspark = pytest.importorskip("pyspark")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_engine_zip(dest: str) -> str:
    """Exactly the docstring recipe: zip credit_ocr_backend_spark + config."""
    zpath = os.path.join(dest, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "credit_ocr_backend_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith((".py", ".conf")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(
            os.path.join(REPO, "config", "document_types.conf"),
            "config/document_types.conf",
        )
    return zpath


def test_spark_submit_py_files_no_checkout(tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    tmp = str(tmp_path)
    zpath = _build_engine_zip(tmp)
    # neutral cwd with ONLY the entrypoint: the package cannot be
    # cwd-imported, so every import must come through --py-files
    job = os.path.join(tmp, "extract_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[4]", "--py-files", zpath,
            job, "--generate", "120", "--out", os.path.join(tmp, "out"),
        ],
        capture_output=True, text=True, cwd=tmp, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_docs"] == 120 and res["n_failed"] == 0
