"""Entity linking + connected-components canonicalization tests, and
ANN recall checks (IVF vs brute force on real testdata)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propertygraph_spark.ops import similarity
from propertygraph_spark.pipeline.canonicalize import (canonicalize_entities,
                                                       connected_components)
from propertygraph_spark.pipeline.linking import link_mentions, symbol_dictionary


import pytest as _pytest


def test_cross_file_receiver_qualification(spark):
    """VERDICT r3 #6: a receiver whose type is declared in ANOTHER file
    resolves through the corpus-level symbol table — class in file A,
    use in file B, candidate rewritten to the A-declared fqn; names
    declared under two packages stay untouched (ambiguity
    conservatism); and linking then prefers the RIGHT dictionary entry
    where the raw simple-name suffix would have matched a wrong-package
    twin."""
    from propertygraph_spark.kernel.extract import extract_document
    from propertygraph_spark.pipeline.linking import (DICT_SCHEMA,
                                                      qualify_cross_file)
    src_a = ("package org.acme.gadget;\n"
             "class Widget { public int spin() { return 1; } }")
    src_b = ("class UseSite { void f() { Widget w = new Widget(); "
             "w.spin(); Gizmo g = new Gizmo(); g.poke(); } }")
    src_c1 = "package p1;\nclass Gizmo { }"
    src_c2 = "package p2;\nclass Gizmo { }"  # ambiguous simple name
    rows: list = []
    for doc, src in [("A", src_a), ("B", src_b),
                     ("C1", src_c1), ("C2", src_c2)]:
        _, _, m, err = extract_document(doc, src)
        assert err is None, err
        rows += m
    mdf = spark.createDataFrame(rows)
    out = qualify_cross_file(mdf)
    assert out.count() == mdf.count()  # identity on row multiplicity
    d = {(r["doc_id"], r["mention"]): (r["candidate"], r["xfile_qualified"])
         for r in out.filter(F.col("kind") == "call_site").collect()}
    assert d[("B", "spin")] == ("org.acme.gadget.Widget.spin()", True)
    assert d[("B", "poke")] == ("Gizmo.poke()", False)  # two decls: skip
    # linking: the unqualified candidate 'Widget.spin()' suffix-matches
    # BOTH dictionary twins (+0.5 each), so the heavier wrong-package
    # entry would win; the corpus-qualified stem matches only the
    # A-declared fqn
    dict_rows = [("net.fake.Widget.spin", "spin", "method", 0.6),
                 ("org.acme.gadget.Widget.spin", "spin", "method", 0.5)]
    sym = spark.createDataFrame(dict_rows, DICT_SCHEMA)
    raw = {r["fqn"] for r in link_mentions(
        mdf.filter(F.col("kind") == "call_site"), sym).collect()}
    assert "net.fake.Widget.spin" in raw  # the miss without the pass
    linked = {r["fqn"] for r in link_mentions(
        out.filter(F.col("kind") == "call_site"), sym).collect()}
    assert linked == {"org.acme.gadget.Widget.spin"}


@_pytest.mark.parametrize("threshold", [200_000, 0])  # driver path, dist path
def test_connected_components_basic(spark, threshold):
    # two components: {1,2,3,4} via chain, {10,11}; singleton 99 untouched
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long")
    comp = {r["id"]: r["component"]
            for r in connected_components(
                edges, driver_threshold=threshold).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert 99 not in comp


@_pytest.mark.parametrize("threshold", [200_000, 0])
def test_connected_components_long_chain_converges(spark, threshold):
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long")
    comp = connected_components(edges, max_iter=25,
                                driver_threshold=threshold)
    assert comp.select("component").distinct().count() == 1
    assert comp.agg(F.min("component")).collect()[0][0] == 0


def test_connected_components_paths_agree(spark):
    """Driver union-find and distributed min-label must produce the
    identical (id, component) mapping."""
    import random
    rng = random.Random(7)
    edges = spark.createDataFrame(
        [(rng.randrange(50), rng.randrange(50)) for _ in range(60)],
        "src long, dst long").filter("src != dst")
    a = {(r["id"], r["component"]) for r in
         connected_components(edges, driver_threshold=10**6).collect()}
    b = {(r["id"], r["component"]) for r in
         connected_components(edges, driver_threshold=0).collect()}
    assert a == b


def test_salted_join_matches_broadcast(spark):
    """Both linking strategies must produce identical linked rows — the
    salted path exists for dictionary-scale, not different semantics."""
    mentions = spark.createDataFrame(
        [("d1", "m0", 1, "String", "call_site", "String()"),
         ("d1", "m0", 2, "put", "call_site", "put()"),
         ("d2", "m1", 3, "nosuch", "call_site", "nosuch()"),
         ("d2", "m1", 4, "Integer", "method_decl", "Integer")],
        "doc_id string, method_id string, node_id long, mention string,"
        " kind string, candidate string")
    sym = symbol_dictionary(spark, n_symbols=200)
    a = link_mentions(mentions, sym, strategy="broadcast").collect()
    b = link_mentions(mentions, sym, strategy="salted", salt=4).collect()
    c = link_mentions(mentions, sym, strategy="packed").collect()
    key = lambda r: (r["doc_id"], r["node_id"])
    canon = lambda rs: sorted((key(r), r["fqn"], r["score"]) for r in rs)
    assert canon(a) == canon(b)
    # the map-only packed fold is row-identical INCLUDING the float
    # score (same addition order: weight + typed-hit + call-form)
    assert canon(a) == canon(c)
    linked = {r["mention"]: r["fqn"] for r in a}
    assert linked["String"] == "java.lang.String"
    assert "nosuch" not in linked


def test_host_scorer_matches_spark_scorer(spark):
    """ops/kgdocs._host_best_link replays pipeline.linking scoring in a
    second language; the linked/canonical oracles depend on the two being
    bit-identical. Run BOTH over every frozen template occurrence and
    assert identical (fqn, score) — a future edit to either side now
    fails loudly instead of silently breaking the oracles."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_LINK_OCCURRENCES,
                                                _host_best_link)
    from propertygraph_spark.pipeline.linking import symbol_rows
    rows = symbol_rows()
    occs = [(f"t{tpl}", "m0", i, mention, kind, candidate)
            for tpl, lst in TEMPLATE_LINK_OCCURRENCES.items()
            for i, (mention, kind, candidate) in enumerate(lst)]
    assert occs, "frozen occurrence multiset is empty"
    mentions = spark.createDataFrame(
        occs, "doc_id string, method_id string, node_id long,"
              " mention string, kind string, candidate string")
    got = {(r["doc_id"], r["node_id"]): (r["fqn"], r["score"])
           for r in link_mentions(
               mentions, symbol_dictionary(spark)).collect()}
    want = {}
    for doc_id, _m, node_id, mention, _kind, candidate in occs:
        best = _host_best_link(mention, candidate, rows)
        if best is not None:
            want[(doc_id, node_id)] = best
    assert got == want


def test_canonicalize_merges_shared_mentions(spark):
    linked = spark.createDataFrame(
        [("size", "java.util.List.size"), ("size", "java.util.Map.size"),
         ("trim", "java.lang.String.trim")],
        "mention string, fqn string")
    canon = {r["fqn"]: r["canonical_id"]
             for r in canonicalize_entities(linked).collect()}
    assert canon["java.util.List.size"] == canon["java.util.Map.size"]
    assert canon["java.lang.String.trim"] == "java.lang.String.trim"


@pytest.mark.parametrize("method,minimum", [("ivf", 0.25), ("lsh", 0.05)])
def test_ann_recall_vs_brute_force(spark, method, minimum):
    """ANN must recover a sane fraction of true top-5 neighbors on the
    real sf0.001 embeddings. Near-orthogonal random vectors are the
    worst case for bucketed ANN (sign-LSH expected collision for a
    cos~0.4 'neighbor' over 4 planes is (1 - theta/pi)^4 ~ 0.16; real
    corpora cluster, raising recall) — the bounds are floors against
    silent breakage, not quality claims. True near-duplicate recovery is
    asserted separately (test_ops_spark: identical vectors co-bucket)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(200)
    truth = {(r["vec_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(emb, k=5).collect()}
    if method == "ivf":
        approx = similarity.ann_ivf_topk(emb, k=5, n_cells=4)
    else:
        approx = similarity.ann_lsh_topk(emb, k=5, n_planes=4)
    got = {(r["vec_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= minimum, f"{method} recall={recall:.2f}"


def test_ivf_nprobe_improves_recall(spark):
    """nprobe=2 candidates are a superset of nprobe=1's per query (the
    rk=1 cell is always probed), so recall vs brute force can only go up."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(200)
    truth = {(r["vec_id"], r["neighbor_id"])
             for r in similarity.cosine_topk(emb, k=5).collect()}
    def recall(nprobe):
        got = {(r["vec_id"], r["neighbor_id"]) for r in
               similarity.ann_ivf_topk(emb, k=5, n_cells=4,
                                       nprobe=nprobe).collect()}
        return len(truth & got) / len(truth)
    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert r2 >= 0.4  # floor against silent breakage


def test_transitive_closure_matches_bfs(spark):
    """Distributed semi-naive closure == reference Python BFS."""
    from propertygraph_spark.ops.graph import transitive_closure
    # diamond (1->2->3, 1->6->3) + self-loop + cycle: multiple paths to
    # the same pair across rounds must not produce duplicate rows
    edges = [(1, 2), (2, 3), (1, 6), (6, 3), (3, 4), (2, 5), (7, 7), (8, 1)]
    df = spark.createDataFrame(
        [("g", a, b) for a, b in edges], "g string, src long, dst long")
    rows = [(r["a"], r["b"]) for r in
            transitive_closure(df, scope="g").collect()]
    assert len(rows) == len(set(rows)), "closure emitted duplicate pairs"
    got = set(rows)
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    want = set()
    for s in {x for e in edges for x in e}:
        seen, stack = set(), [s]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        want |= {(s, t) for t in seen}
    assert got == want


def test_closure_scope_isolation(spark):
    """Paths must not cross scope boundaries."""
    from propertygraph_spark.ops.graph import transitive_closure
    df = spark.createDataFrame(
        [("m1", 1, 2), ("m2", 2, 3)], "g string, src long, dst long")
    got = {(r["g"], r["a"], r["b"]) for r in
           transitive_closure(df, scope="g").collect()}
    assert got == {("m1", 1, 2), ("m2", 2, 3)}  # no 1->3 across scopes


def test_call_graph_matches_host_replay(spark):
    """kgdocs.call_graph: (caller class, callee fqn, n_calls) edges over
    the synthesized corpus must equal the host replay of the linking
    argmax over the frozen per-template call-site multiset, scaled by
    each template's doc count (here: 3/3/2/2 over doc_ids 0..9)."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_LINK_OCCURRENCES,
                                                _host_best_link, call_graph)
    from propertygraph_spark.pipeline.linking import symbol_rows
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(10)],
                                 "doc_id long, text string")
    rows = symbol_rows()
    tpl_docs = {t: sum(1 for i in range(10) if i % 4 == t) for t in range(4)}
    want: dict = {}
    for tpl, occs in TEMPLATE_LINK_OCCURRENCES.items():
        for mention, kind, candidate in occs:
            if kind != "call_site":
                continue
            best = _host_best_link(mention, candidate, rows)
            if best is None:
                continue
            key = (f"D{tpl}", best[0])
            want[key] = want.get(key, 0) + tpl_docs[tpl]
    got = {(r["caller"], r["callee"]): r["n_calls"]
           for r in call_graph(docs).collect()}
    assert want, "no call-site edges in the frozen multiset"
    assert got == want
