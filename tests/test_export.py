"""End-to-end training-set export: funnel correctness + reproducibility."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from propertygraph_spark.ops.export import export_training_set


def _docs(spark):
    rows = []
    for i in range(60):
        if i % 10 == 0:
            text = "the same boilerplate text repeated across docs"
        elif i == 7:
            text = ""  # quality-gated out (empty -> score 0)
        else:
            # fully distinct shingle sets (same-template texts differing
            # by one token are legitimate NEAR-dups to the LSH stage)
            text = " ".join(f"w{i}_{j}" for j in range(8))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_export_funnel_and_layout(spark, tmp_path):
    out = str(tmp_path / "export")
    funnel = export_training_set(_docs(spark), out, min_quality=1,
                                 budget=32)
    assert funnel["input_docs"] == 60
    # the empty doc is quality-gated
    assert funnel["after_quality"] == 59
    # 6 boilerplate docs collapse to 1 keeper (5 dropped)
    assert funnel["after_dedup"] == 54
    # split layout on disk: one dir per split present in the data
    data = str(tmp_path / "export" / "data")
    dirs = {d for d in os.listdir(data) if d.startswith("split=")}
    assert dirs == {f"split={s}" for s in funnel["splits"]}
    # reading back: every doc exactly once, packing invariants per split
    df = spark.read.parquet(data)
    assert df.count() == funnel["after_dedup"]
    rows = df.collect()
    by_split: dict = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    for split, rs in by_split.items():
        rs = sorted(rs, key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["bin_id"] == cum // 32
            assert r["offset_in_bin"] == cum % 32
            cum += r["n_tokens"]
    # funnel.json persisted and matches
    with open(os.path.join(out, "funnel.json")) as f:
        assert json.load(f) == funnel


def test_export_is_manifest_skipped_on_rerun(spark, tmp_path):
    out = str(tmp_path / "export2")
    a = export_training_set(_docs(spark), out, budget=32)
    data = os.path.join(out, "data")
    before = {p: os.path.getmtime(os.path.join(data, p))
              for p in os.listdir(data) if p.startswith("split=")}
    b = export_training_set(_docs(spark), out, budget=32)
    assert a == b
    after = {p: os.path.getmtime(os.path.join(data, p))
             for p in os.listdir(data) if p.startswith("split=")}
    assert before == after  # unchanged input -> write_stage skipped
