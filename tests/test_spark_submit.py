"""North-rule clause: 'runs via spark-submit --py-files on a
multi-executor cluster'.  This drives the REAL deployment path end to
end: package probe_spark into a zip, launch `spark-submit --py-files
probe_spark.zip` as a subprocess (fresh JVM, no inherited PYTHONPATH,
driver cwd OUTSIDE the repo -- imports must come from the shipped zip),
build an index over a parquet of pages, then query it in a second
spark-submit and check the ranked JSON against the pure-Python oracle.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _make_zip(tmp: Path) -> Path:
    zpath = tmp / "probe_spark.zip"
    pkg = REPO / "probe_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in pkg.rglob("*.py"):
            z.write(p, p.relative_to(REPO))
    return zpath


def _submit(zpath: Path, cwd: Path, *args: str) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "2"
    env["PROBE_SPARK_DRIVER_MEM"] = "2g"
    # driver script is a copy of cli.py OUTSIDE the repo: every
    # `from probe_spark import ...` inside it must resolve via --py-files
    driver = cwd / "driver_cli.py"
    if not driver.exists():
        driver.write_text((REPO / "probe_spark" / "cli.py").read_text())
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zpath),
            str(driver),
            *args,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_build_then_search(spark, tmp_path):
    from probe_spark.fixtures import oracle_corpus, pages_df
    from probe_spark.oracle import search as oracle_search

    n_docs = 300
    pages_dir = tmp_path / "pages"
    # fixture corpus written by the in-process session; the subprocess
    # builds/queries it through the shipped zip only
    pages_df(spark, n_docs).write.parquet(str(pages_dir))

    zpath = _make_zip(tmp_path)
    ix = tmp_path / "ix"
    built = _submit(
        zpath, tmp_path,
        "build", "--pages", str(pages_dir), "--index", str(ix),
        "--buckets", "2",
    )
    assert built.returncode == 0, built.stderr[-4000:]
    metrics = json.loads(built.stdout.strip().splitlines()[-1])
    assert metrics["n_docs"] == n_docs and metrics["n_postings"] > 0

    searched = _submit(
        zpath, tmp_path,
        "search", "--index", str(ix), "--query", "error handling",
        "-k", "5", "--format", "json",
    )
    assert searched.returncode == 0, searched.stderr[-4000:]
    payload = json.loads(searched.stdout.strip().splitlines()[-1])
    got = [(r["doc_id"], r["score"]) for r in payload["results"]]

    expected = oracle_search(oracle_corpus(n_docs), "error handling", k=5)
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, gs), (_, es) in zip(got, expected):
        assert gs == pytest.approx(es, rel=1e-9)
