"""End-to-end training-set assembly: the composition a data-prep user
actually runs, wired from the individual operators (each independently
oracle-checked):

    quality filter  ->  near-dup cluster keepers  ->  deterministic
    split  ->  per-split sequence packing  ->  parquet partitioned by
    split, with a stage-by-stage funnel manifest.

Every stage is deterministic (integer quality arithmetic, md5 splits,
LSH star-cluster keepers), so the export is reproducible across runs,
partitionings and cluster sizes. The write goes through
`materialize.write_stage`, so reruns with unchanged input/config are
manifest-skipped and each commit appends to the snapshot lineage log.

Scale notes: quality + split are map-only; the dedup stage is the
star-edge connected-components path (O(n·bands) per mega-cluster);
packing shards per split (never a global sort); the final write
repartitions by the partition column first (no tasks x dirs small-file
explosion).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from .dataset import pack_sequences, split_assign
from .dedup import dedup_clusters
from .text import quality_score


def export_training_set(docs: DataFrame, out_dir: str,
                        min_quality: int = 1,
                        budget: int = 256) -> dict:
    """Returns the funnel manifest (counts per stage + output layout);
    writes ``<out_dir>/data`` partitioned by split and
    ``<out_dir>/funnel.json``."""
    from propertygraph_spark.pipeline.materialize import (fingerprint,
                                                          write_stage)

    n_input = docs.count()

    # 1. quality gate (integer score — deterministic)
    q = quality_score(docs).filter(F.col("quality_score") >= min_quality) \
                           .select("doc_id")
    survivors = docs.join(q, "doc_id")
    n_quality = survivors.count()

    # 2. near-dup cluster keepers (star-edge CC; one doc per cluster)
    keep = dedup_clusters(survivors).filter(F.col("is_keeper") == 1) \
                                    .select("doc_id")
    survivors = survivors.join(keep, "doc_id")
    n_dedup = survivors.count()

    # 3. deterministic split + 4. per-split packing
    sharded = split_assign(survivors).select("doc_id", "split") \
        .join(survivors, "doc_id")
    packed = pack_sequences(sharded, budget=budget, shard_by=["split"])

    # 5. final table: text + packing layout, partitioned by split
    # cluster by (split, hash-sub): every task writes into exactly one
    # split dir (no tasks x dirs small-file explosion) while each split
    # still writes in parallel — repartition("split") alone would push
    # a whole split through ONE task at corpus scale
    out = (packed.join(sharded.select("doc_id", "text"), "doc_id")
           .select("doc_id", "split", "n_tokens", "bin_id",
                   "offset_in_bin", "text")
           .repartition(F.col("split"),
                        F.pmod(F.xxhash64("doc_id"), F.lit(32))))
    data_dir = os.path.join(out_dir, "data")
    fp = fingerprint("export", n_input, min_quality, budget)
    write_stage(out, data_dir, fp, partition_by=["split"])

    splits = {r["split"]: (r["n"], r["bins"]) for r in
              (packed.groupBy("split")
               .agg(F.count("*").alias("n"),
                    F.countDistinct("bin_id").alias("bins"))
               .collect())}
    funnel = {
        "input_docs": n_input,
        "after_quality": n_quality,
        "after_dedup": n_dedup,
        "min_quality": min_quality,
        "budget": budget,
        "splits": {k: {"docs": n, "bins": b}
                   for k, (n, b) in sorted(splits.items())},
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "funnel.json"), "w") as f:
        json.dump(funnel, f)
    return funnel
