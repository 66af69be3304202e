"""Dataset assembly operators: deterministic split + sequence packing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from propertygraph_spark.ops.dataset import pack_sequences, split_assign


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(3 + i % 7)))
            for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_matches_md5_reference(docs):
    out = {r["doc_id"]: (r["split"], r["bucket_pm"])
           for r in split_assign(docs).collect()}
    assert len(out) == 200
    for d, (split, pm) in out.items():
        want_pm = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 1000
        assert pm == want_pm
        want = "test" if pm < 50 else ("val" if pm < 100 else "train")
        assert split == want
    # all three splits present and train dominates at these rates
    by = {}
    for s, _ in out.values():
        by[s] = by.get(s, 0) + 1
    assert by.get("train", 0) > by.get("val", 0) >= 0
    assert set(by) <= {"train", "val", "test"}


def test_split_is_stable_under_repartition(docs):
    a = {(r["doc_id"], r["split"])
         for r in split_assign(docs.repartition(7)).collect()}
    b = {(r["doc_id"], r["split"])
         for r in split_assign(docs.repartition(2)).collect()}
    assert a == b


def test_pack_sequences_bins_respect_budget(docs):
    budget = 16
    rows = sorted(pack_sequences(docs, budget=budget).collect(),
                  key=lambda r: r["doc_id"])
    # exclusive cumsum invariants: offset = cum_before % budget,
    # bins advance monotonically, every bin's token total is within
    # budget + max_doc (streaming packing never splits a doc)
    cum = 0
    per_bin: dict = {}
    for r in rows:
        assert r["bin_id"] == cum // budget
        assert r["offset_in_bin"] == cum % budget
        per_bin[r["bin_id"]] = per_bin.get(r["bin_id"], 0) + r["n_tokens"]
        cum += r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in rows)
    assert all(v <= budget + max_doc for v in per_bin.values())
    # bins are dense from 0
    assert set(per_bin) == set(range(max(per_bin) + 1))
