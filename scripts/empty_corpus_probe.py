"""Robustness sweep: run EVERY queries() entry against schema-matched
EMPTY tables (the 100 TB reality of an empty partition, a filter that
matches nothing, or a brand-new bucket) AND against a 2-row tiny
corpus (singleton windows, self-pair dedup, 2-seed quantizers), and
report any operator that crashes rather than returning an
empty/neutral result.

Usage: python scripts/empty_corpus_probe.py   # expect: failures: 0 (x2)
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
    any_fail = False
    for n_rows, tag in [(0, "empty"), (2, "tiny")]:
        d = tempfile.mkdtemp(prefix=f"{tag}_sf")
        for t in TABLES:
            spark.read.parquet(f"{src}/{t}.parquet").limit(n_rows) \
                .write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        fails = []
        for name, fn in E.queries().items():
            try:
                fn(spark, d).collect()
            except Exception as exc:
                fails.append((name, str(exc).splitlines()[0][:140]))
        print(f"{tag} ({n_rows} rows) failures:", len(fails))
        for f in fails:
            print(" ", f)
        any_fail = any_fail or bool(fails)
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
