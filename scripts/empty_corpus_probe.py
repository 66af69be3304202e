"""Robustness sweep: run EVERY queries() entry against schema-matched
EMPTY tables (the 100 TB reality of an empty partition, a filter that
matches nothing, or a brand-new bucket) and report any operator that
crashes rather than returning an empty/neutral result.

Usage: python scripts/empty_corpus_probe.py   # expect: failures: 0
(ops that fundamentally require data, e.g. a trained quantizer, must
degrade to an empty result, not an exception)."""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events"
          " documents embeddings").split()


def main() -> None:
    import __spark_entry__ as E
    from propertygraph_spark.pipeline.session import get_spark
    spark = get_spark("emptyprobe")
    src = "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="empty_sf")
    for t in TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").limit(0) \
            .write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    fails = []
    for name, fn in E.queries().items():
        try:
            fn(spark, d).collect()
        except Exception as exc:
            fails.append((name, str(exc).splitlines()[0][:140]))
    print("failures:", len(fails))
    for f in fails:
        print(" ", f)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
