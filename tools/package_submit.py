"""Package the engine for ``spark-submit --py-files`` and smoke-run it.

Builds ``dist/scylla_cdc_java_spark.zip`` (the package only — no tests,
no tools) and, unless ``--zip-only``, launches a real ``spark-submit``
replay of a small generated world using the zip as ``--py-files``,
proving the BASELINE.json packaging requirement end-to-end.

Usage:
    python tools/package_submit.py [--zip-only]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "scylla_cdc_java_spark"

DRIVER = """
import sys, tempfile
from scylla_cdc_java_spark import Engine, EngineConfig, GenSpec, generate_to_dir
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
info = generate_to_dir(
    GenSpec(seed=123, n_events=3000, n_generations=2, gen_span_ms=60_000),
    tempfile.mkdtemp(prefix="submit_world_"),
)
eng = Engine(
    spark, info["log_dir"], info["generations_path"],
    tempfile.mkdtemp(prefix="submit_target_"),
    cfg=EngineConfig(window_length_limit_ms=60_000),
)
stats = eng.replay()
n = eng.sink.read().count()
assert stats.rows > 0 and n > 0, (stats.rows, n)
print(f"SUBMIT_OK windows={stats.windows} rows={stats.rows} final={n}")
"""


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def smoke_submit(zpath: str) -> None:
    with tempfile.NamedTemporaryFile(
        "w", suffix="_driver.py", delete=False
    ) as f:
        f.write(DRIVER)
        driver = f.name
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    cmd = [
        "spark-submit",
        "--master", "local[8]",
        "--py-files", zpath,
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        driver,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd="/tmp", timeout=600
    )
    marker = [l for l in out.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    if not marker:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise SystemExit("spark-submit smoke FAILED")
    print(f"zip: {zpath}")
    print(marker[0])


if __name__ == "__main__":
    zp = build_zip()
    if "--zip-only" in sys.argv:
        print(f"zip: {zp}")
    else:
        smoke_submit(zp)
