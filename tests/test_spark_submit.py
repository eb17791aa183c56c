"""North-rule ship vehicle: the job runs via ``spark-submit --py-files``.

Everything else in the suite drives the engine in-process; this test
proves the packaging contract itself — a thin driver script plus the
package zip built by ``session.package_zip()``, submitted through the
real ``spark-submit`` binary from OUTSIDE the repo tree (cwd and
PYTHONPATH scrubbed), must run the crawl end-to-end and match the
pure-Python oracle. Reference analog: the process-deploy story
(install_crawler.md / run via beanstalkd workers) collapses to one
artifact + one submit command.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

from crawler_distributed_spark.session import package_zip

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_spark_submit_py_files_vehicle(tmp_path):
    zip_path = package_zip()

    # thin driver: imports resolve ONLY from the --py-files zip
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        "from crawler_distributed_spark.__main__ import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the import source
    ck = tmp_path / "ck"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[8]",
            "--py-files", zip_path,
            str(driver),
            "--checkpoint", str(ck),
            "--cpus", "8",
            "--hosts", "3", "--pages-base", "12", "--hot-factor", "3",
            "--branching", "4", "--max-pages", "8",
            "--verify-oracle",
        ],
        cwd=str(tmp_path),  # NOT the repo — no source-tree import leak
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["oracle_trace_match"] is True
    assert out["oracle_seen_match"] is True
    assert out["trace_rows"] > 0 and out["seen_urls"] > 0
