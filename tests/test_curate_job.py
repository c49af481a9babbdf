"""End-to-end smoke of the composed curation pipeline CLI (jobs/curate.py)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_curate_pipeline_end_to_end(tmp_path):
    out_dir = str(tmp_path / "curated")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "curate.py"),
            "--input", "/root/testdata/sf0.001",
            "--output", out_dir,
            "--budget", "500",
            "--jaccard-tau", "0.8",
            "--max-key-df", "64",
            "--parallelism", "8",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith('{"job"')][-1]
    stats = json.loads(line)
    s = stats["stages"]
    # survivor counts only shrink along the chain, and nothing vanishes
    assert s["input"] > 0
    assert s["input"] >= s["quality"] >= s["exact_dedup"] >= s["near_dedup"]
    assert s["near_dedup"] == s["packed"] > 0
    assert stats["n_shards"] >= 1
    # the output table really exists with the curated schema
    import duckdb

    cols = {
        r[0]
        for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/*.parquet')"
        ).fetchall()
    }
    assert {"doc_id", "text", "n_tokens", "shard_id"} <= cols
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()[0]
    assert n == s["packed"]
