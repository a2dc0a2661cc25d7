"""The README's curation-recipe code block, executed verbatim (round-6
verdict task #7: one documented entry tying ingest → quality → dedup →
mixture → split → shard together). The block is extracted from
README.md at test time, so the doc cannot drift from the code."""

from __future__ import annotations

import glob
import re

SF_DIR = "/root/testdata/sf0.001"


def _recipe_block() -> str:
    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The curation recipe", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README recipe block missing"
    return m.group(1)


def test_readme_recipe_runs_verbatim(spark, tmp_path):
    ns = {"spark": spark, "sf_dir": SF_DIR, "out_dir": str(tmp_path)}
    exec(compile(_recipe_block(), "README.md", "exec"), ns)  # noqa: S102

    # the export landed as one sorted file per shard directory
    shard_dirs = glob.glob(f"{tmp_path}/train_ep1/shard=*")
    assert shard_dirs, "no shards written"
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1, d

    # the assembled frame carries the documented contract columns
    assembled = ns["assembled"]
    assert {"split", "shard", "shuffle_key"} <= set(assembled.columns)

    # observe-powered stage counters filled on the first action and
    # are monotonically non-increasing through the drop stages
    counts = {k: v["n"] for k, v in ns["stage_counts"].items()}
    assert counts["input"] > 0
    order = ["input", "quality_lang", "exact_dedup", "near_dedup",
             "decontaminated"]
    vals = [counts[s] for s in order]
    assert vals == sorted(vals, reverse=True), counts

    # the audit report aggregates the exported corpus
    audit = {
        (r["source"], r["split"]): r["n_docs"]
        for r in ns["audit"].collect()
    }
    assert audit and all(n > 0 for n in audit.values())
    assert {s for s, _ in audit} <= {"src0", "src1", "src2"}

    # epoch 2 reshuffles without moving a row across the split
    from nextbus2pg_spark.pipelines.corpus_assembly import assemble_corpus
    ep2 = assemble_corpus(
        ns["curated"].withColumn(
            "n_tokens", ns["token_count"](ns["F"].col("text"))
        ),
        ns["edges"],
        weights={"src0": 3, "src1": 1, "src2": 1},
        token_budget=12_000, epoch=2, n_shards=8,
    )
    s1 = {(r["doc_id"], r["split"]) for r in
          assembled.select("doc_id", "split").collect()}
    s2 = {(r["doc_id"], r["split"]) for r in
          ep2.select("doc_id", "split").collect()}
    assert s1 == s2


def test_readme_monitoring_recipe_runs_verbatim(spark):
    text = open("/root/repo/README.md", encoding="utf-8").read()
    section = text.split("## The monitoring recipe", 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.DOTALL)
    assert m, "README monitoring block missing"
    ns = {"spark": spark, "sf_dir": SF_DIR}
    exec(compile(m.group(1), "README.md#monitoring", "exec"), ns)  # noqa: S102
    spikes, drifts, outages = ns["n_flags"]
    assert spikes >= 0 and drifts >= 0 and outages >= 0
    # the frames carry the documented contract columns
    assert {"zscore", "is_anomaly"} <= set(ns["spikes"].columns)
    assert {"cusum_pos", "cusum_neg", "is_change"} <= set(
        ns["drifts"].columns
    )
    assert {"level", "trend", "forecast"} <= set(ns["forecasts"].columns)
    assert {"gap_start", "gap_end", "gap_seconds"} <= set(
        ns["outages"].columns
    )
