"""Fused Spark extraction stage: docs table -> nodes/triples/mentions rows.

Spark-first design notes (SURVEY.md §3.4, §4.2):
- ONE Arrow-vectorized kernel pass per document (mapInPandas) emits every
  graph family; Catalyst cannot fuse across UDFs, so fusion is done here —
  the parser never runs twice for a doc;
- the stage is map-only: no shuffle between the scan and the kernel except
  the explicit cost-based routing repartition;
- skew: AQE splits skewed JOINS but not UDF stages, so pathological
  mega-docs are routed to a dedicated wide repartition by a cost column
  (total code chars) before the kernel;
- output is a single union-schema DataFrame (row_kind discriminator);
  written once partitioned by row_kind, downstream reads prune partitions.
"""

from __future__ import annotations

import time
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

UNION_SCHEMA = StructType([
    StructField("row_kind", StringType(), False),   # node|triple|mention|error|metric
    StructField("doc_id", StringType(), False),
    StructField("method_id", StringType(), True),
    StructField("node_id", LongType(), True),
    StructField("graph", StringType(), True),
    StructField("kind", StringType(), True),
    StructField("category", StringType(), True),
    StructField("text", StringType(), True),
    StructField("start_line", IntegerType(), True),
    StructField("end_line", IntegerType(), True),
    StructField("subj", LongType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", LongType(), True),
    StructField("label", StringType(), True),
    StructField("mention", StringType(), True),
    StructField("candidate", StringType(), True),
    StructField("error", StringType(), True),
])

NODE_COLS = ["doc_id", "method_id", "node_id", "graph", "kind", "category",
             "text", "start_line", "end_line"]
TRIPLE_COLS = ["doc_id", "method_id", "subj", "pred", "obj", "label"]
MENTION_COLS = ["doc_id", "method_id", "node_id", "mention", "kind", "candidate"]


def _code_source_col():
    """Compilation unit assembly, fully JVM-side: filter code spans, sort by
    offset, concatenate (predicate/ordering stay out of Python)."""
    code = F.filter("spans", lambda s: s["kind"] == F.lit("code"))
    ordered = F.array_sort(
        code, lambda a, b: F.when(a["offset"] < b["offset"], F.lit(-1))
        .when(a["offset"] > b["offset"], F.lit(1)).otherwise(F.lit(0)))
    return F.array_join(F.transform(ordered, lambda s: s["text"]), "")


def with_source(docs: DataFrame) -> DataFrame:
    return docs.withColumn("source", _code_source_col()) \
               .withColumn("cost", F.length(F.col("source")))


def route_by_cost(docs_with_cost: DataFrame, heavy_threshold: int = 200_000,
                  light_partitions: int | None = None,
                  heavy_partitions: int | None = None) -> DataFrame:
    """Mega-doc isolation: heavy docs get their own narrow partitions so one
    pathological file cannot straggle a 512-doc partition. At cluster scale
    the two legs are sized independently of the input partitioning."""
    spark = docs_with_cost.sparkSession
    default = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    light_partitions = light_partitions or default
    heavy_partitions = heavy_partitions or max(default // 2, 4)
    light = docs_with_cost.filter(F.col("cost") <= heavy_threshold) \
        .repartition(light_partitions, "doc_id")
    heavy = docs_with_cost.filter(F.col("cost") > heavy_threshold) \
        .repartition(heavy_partitions)  # round-robin: spread the giants
    return light.unionByName(heavy)


def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # heavy import inside the worker, once per python worker
    from propertygraph_spark.kernel.extract import extract_document

    for pdf in batches:
        out_rows: list = []
        t0 = time.monotonic()
        n_docs = 0
        for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
            n_docs += 1
            nodes, triples, mentions, err = extract_document(doc_id, source or "")
            for n in nodes:
                out_rows.append((
                    "node", doc_id, n["method_id"], n["node_id"], n["graph"],
                    n["kind"], n["category"], n["text"], n["start_line"],
                    n["end_line"], None, None, None, None, None, None, None))
            for t in triples:
                out_rows.append((
                    "triple", doc_id, t["method_id"], None, None, None, None,
                    None, None, None, t["subj"], t["pred"], t["obj"],
                    t["label"], None, None, None))
            for m in mentions:
                out_rows.append((
                    "mention", doc_id, m["method_id"], m["node_id"], None,
                    m["kind"], None, None, None, None, None, None, None, None,
                    m["mention"], m["candidate"], None))
            if err is not None:
                out_rows.append((
                    "error", doc_id, None, None, None, None, None, None, None,
                    None, None, None, None, None, None, None, err))
        elapsed = time.monotonic() - t0
        out_rows.append((
            "metric", "_partition", None, None, None, None, None,
            f"docs={n_docs} rows={len(out_rows)} sec={elapsed:.3f}",
            None, None, None, None, None, None, None, None, None))
        yield pd.DataFrame(out_rows, columns=[f.name for f in UNION_SCHEMA.fields])


def extract_docs(docs: DataFrame, heavy_threshold: int = 200_000,
                 route: bool = True) -> DataFrame:
    """docs(doc_id, spans) -> union-schema rows (map-only after routing)."""
    src = with_source(docs)
    if route:
        src = route_by_cost(src, heavy_threshold)
    return src.select("doc_id", "source").mapInPandas(_kernel, UNION_SCHEMA)


def split_union(union_df: DataFrame) -> Tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(nodes, triples, mentions, errors) views over the union output."""
    nodes = union_df.filter(F.col("row_kind") == "node").select(*NODE_COLS)
    triples = union_df.filter(F.col("row_kind") == "triple").select(*TRIPLE_COLS)
    mentions = union_df.filter(F.col("row_kind") == "mention").select(*MENTION_COLS)
    errors = union_df.filter(F.col("row_kind") == "error").select("doc_id", "error")
    return nodes, triples, mentions, errors
