"""CLI surface of the audit job: end-to-end run over the sf0.001
catalog, parquet outputs + JSON summary shape."""

from __future__ import annotations

import json
import os


def test_audit_job_end_to_end(spark, sf_dir, tmp_path, capsys):
    from magi_etl_spark.jobs import main

    rc = main(
        ["audit", "--data-dir", sf_dir, "--out", str(tmp_path),
         "--split-ts", "2024-01-16"]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["job"] == "audit"
    summary = json.load(open(os.path.join(str(tmp_path), "audit_summary.json")))
    assert set(summary) == {
        "max_psi", "drifted_groups", "max_benford_chi2", "n_revenue_outliers"
    }
    # TPC-H-ish amounts are uniform, which Benford flags loudly; the
    # synthetic January halves are near-identical, so PSI stays calm
    assert summary["max_benford_chi2"] > 20.0
    assert summary["max_psi"] < 0.2 and summary["drifted_groups"] == []
    assert summary["n_revenue_outliers"] >= 0
    psi = spark.read.parquet(os.path.join(str(tmp_path), "psi"))
    assert psi.count() == 5  # one row per event type
