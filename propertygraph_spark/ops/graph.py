"""Graph analytics over the materialized KG triples — the operations a
PDG consumer actually runs (slicing = reachability over dependence
edges), expressed as distributed DataFrame iteration.

`transitive_closure` is semi-naive datalog evaluation: each round joins
only the NEW frontier pairs against the base edges, unions into the
known set, and localCheckpoints to truncate lineage. Rounds = graph
diameter; per-method PDGs are shallow (statement counts), so closures
converge in a handful of rounds even when millions of methods are
processed at once — the iteration count depends on the deepest method,
not the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def transitive_closure(edges: DataFrame, src: str = "src", dst: str = "dst",
                       scope: str | None = None,
                       max_iter: int = 30) -> DataFrame:
    """All (src, dst) pairs with a directed path src ->+ dst.

    ``scope`` optionally names a column (e.g. doc_id) that partitions the
    graph into independent subgraphs: paths never cross scopes, and the
    joins hash on (scope, node) so each subgraph's closure is computed
    where its edges live.
    """
    keys = ([scope] if scope else [])
    base = edges.select(*keys, F.col(src).alias("a"), F.col(dst).alias("b")) \
                .distinct().localCheckpoint(eager=True)
    known = base
    frontier = base
    for _ in range(max_iter):
        # frontier(a, x) x base(x, b) -> new paths a -> b
        stepped = (frontier.withColumnRenamed("b", "x")
                   .join(base.withColumnRenamed("a", "x"), keys + ["x"])
                   .select(*keys, "a", "b"))
        # distinct + anti-join (NOT exceptAll: multiset semantics would
        # let a pair reached via two paths in one round survive a single
        # subtraction and re-enter the known set as a duplicate)
        new = (stepped.distinct()
               .join(known, keys + ["a", "b"], "left_anti")
               .localCheckpoint(eager=True))
        if new.isEmpty():
            break
        known = known.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return known


def pdg_data_closure_sizes(triples: DataFrame) -> DataFrame:
    """Per-document count of (node, transitively-data-dependent node)
    pairs — the total backward-slice weight of the document's PDGs."""
    data_edges = triples.filter(F.col("pred") == "pdg_data") \
        .select("doc_id", "method_id",
                F.col("subj").alias("src"), F.col("obj").alias("dst"))
    closure = transitive_closure(data_edges, scope="method_id")
    per_method = closure.groupBy("method_id").agg(
        F.count("*").alias("n_pairs"))
    return per_method
