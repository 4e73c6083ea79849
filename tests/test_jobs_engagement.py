"""CLI surface of the engagement job: end-to-end run over the sf0.001
catalog, parquet outputs + JSON summary shape."""

from __future__ import annotations

import json
import os


def test_engagement_job_end_to_end(spark, sf_dir, tmp_path, capsys):
    from magi_etl_spark.jobs import main

    rc = main(
        ["engagement", "--data-dir", sf_dir, "--out", str(tmp_path)]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["job"] == "engagement"
    summary = json.load(
        open(os.path.join(str(tmp_path), "engagement_summary.json"))
    )
    assert set(summary) == {
        "days_observed",
        "min_stickiness",
        "max_gini",
        "n_cusum_alarms",
        "alarm_series",
    }
    assert summary["days_observed"] == 30
    assert 0.0 < summary["min_stickiness"] <= 1.0
    assert 0.0 <= summary["max_gini"] < 1.0
    active = spark.read.parquet(os.path.join(str(tmp_path), "active_users"))
    assert active.count() == 30
    surv = spark.read.parquet(os.path.join(str(tmp_path), "survival"))
    rows = sorted(surv.collect(), key=lambda r: r.t_days)
    assert rows[0].survival == 1.0
    cus = spark.read.parquet(os.path.join(str(tmp_path), "cusum"))
    assert cus.count() == 150  # 5 series x 30 days
