"""CLI surface of the govern job: end-to-end run over the sf0.001
catalog, parquet outputs + JSON summary shape."""

from __future__ import annotations

import json
import os


def test_govern_job_end_to_end(spark, sf_dir, tmp_path, capsys):
    from magi_etl_spark.jobs import main

    rc = main(
        ["govern", "--data-dir", sf_dir, "--out", str(tmp_path),
         "--epsilon", "1.0", "--nonce", "release-7"]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["job"] == "govern"
    summary = json.load(open(os.path.join(str(tmp_path), "govern_summary.json")))
    assert set(summary) == {
        "n_domains", "kept_domains", "n_docs_kept", "eff_tokens_kept",
        "n_suppressed_groups", "n_nondiverse_groups",
    }
    assert summary["n_domains"] == 20  # synthetic catalog: src0..src19
    # the synthetic documents are healthy, so every domain survives and
    # the manifest covers the corpus
    assert summary["kept_domains"] == sorted(f"src{i}" for i in range(20))
    assert summary["n_docs_kept"] == 500
    assert summary["eff_tokens_kept"] > 0
    man = spark.read.parquet(os.path.join(str(tmp_path), "manifest"))
    assert man.count() == 500
    assert {c for c in man.columns} >= {
        "doc_id", "source", "cluster_size", "weight", "eff_tokens",
        "n_scored", "mean_llr",
    }
    rel = spark.read.parquet(os.path.join(str(tmp_path), "dp_release"))
    assert rel.count() == 5  # one noisy count per event type
