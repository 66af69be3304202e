"""Deduplication operators over the documents table.

Five families, each a ``queries()`` entry with a DuckDB oracle:

- exact          : hash-groupBy on content MD5 (map-side partial agg; the
                   only shuffle is on the 16-byte digest, never the text)
- ngram_jaccard  : shingle-inverted-index self-join — NO cross join; cost
                   is sum over shingles of df^2, the standard scalable
                   candidate generation at corpus scale
- minhash_lsh    : 16-perm MinHash (conditional min-aggs, one groupBy),
                   banded into 4 buckets; candidate pairs via bucket join
- simhash        : 16-bit SimHash from per-token MD5-derived bit votes
- embedding      : near-duplicate pairs by cosine over embeddings (see
                   similarity.py for the top-k/ANN variants)

Hashing is MD5 everywhere (not xxhash64/murmur) deliberately: Spark and
DuckDB both expose md5() with identical output, which makes every operator
exactly oracle-checkable. At 100 TB the md5-vs-xxhash cpu delta is noise
next to the shuffle it feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact-content duplicate groups: groups with >1 doc, keyed by md5.
    Returns (content_md5, n_docs, keep_doc_id=min)."""
    return (docs.groupBy(F.md5("text").alias("content_md5"))
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


def _shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct — token k-grams via posexplode of an
    index sequence (generate_series twin in DuckDB)."""
    toks = tokens_col()
    d = docs.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)) \
           .otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at("toks", (i + j).cast("int")) for j in range(k)]))
    return d.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        threshold_pm: int = 800) -> DataFrame:
    """Near-duplicate pairs with token-k-gram Jaccard >= threshold (per
    mille). Inverted-index join: explode shingles, self-join on shingle,
    count intersections, derive union from per-doc shingle counts.

    Scale notes: the self-join shuffles on `shingle` — a skewed common
    shingle blows up df^2, so AQE skew-join splitting stays on; per-doc
    counts are broadcast back (small relative to the pair table)."""
    sh = _shingles(docs, k)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("n_inter")))
    ca = counts.select(F.col("doc_id").alias("doc_a"),
                       F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"),
                       F.col("n_sh").alias("n_b"))
    return (inter.join(F.broadcast(ca), "doc_a").join(F.broadcast(cb), "doc_b")
            .withColumn(
                "jaccard_pm",
                F.floor(F.col("n_inter") * 1000
                        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                .cast("long"))
            .filter(F.col("jaccard_pm") >= threshold_pm)
            .select("doc_a", "doc_b", "n_inter", "jaccard_pm"))


def minhash_signatures(docs: DataFrame, k: int = 3) -> DataFrame:
    """16 MinHash values per doc as 16 conditional min-aggregates over the
    shingle set — one groupBy, full map-side partial aggregation, no
    16x row explosion. 'Permutation' i = md5(i || '|' || shingle), min
    taken lexicographically on the hex digest (total order, stable)."""
    sh = _shingles(docs, k)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))))
            .alias(f"h{i}") for i in range(N_MINHASH)]
    return sh.groupBy("doc_id").agg(*aggs)


def _pairs_within_groups(grouped: DataFrame, ids_col: str = "ids") -> DataFrame:
    """All i<j pairs inside each group's sorted id array, generated with
    nested Catalyst transforms (no self-join, no second shuffle — bucket
    membership is already co-located, and near-dup buckets are small, so
    quadratic-per-bucket beats a bucket-keyed self-join at any scale)."""
    n = F.size(ids_col)
    pair_structs = F.flatten(F.transform(
        F.col(ids_col),
        lambda x, i: F.transform(
            F.slice(F.col(ids_col), i + 2, n),
            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")))))
    return grouped.select(F.explode(pair_structs).alias("p")) \
                  .select("p.doc_a", "p.doc_b")


def minhash_lsh_pairs(docs: DataFrame, k: int = 3) -> DataFrame:
    """LSH candidate pairs: band the 16-value signature into 4 bands of 4,
    bucket = md5(concat of band values). Banding is ONE pass over the
    signature table (explode of a literal band array — the signature agg
    is computed once, not per band); pairs come from in-bucket pair
    expansion, so the only shuffles are the signature groupBy and the
    (band, bucket) groupBy."""
    sig = minhash_signatures(docs, k)
    band_arr = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"h{i}")
                                     for i in range(b * ROWS_PER_BAND,
                                                    (b + 1) * ROWS_PER_BAND)]))
            .alias("bucket"))
        for b in range(N_BANDS)])
    banded = sig.select("doc_id", F.explode(band_arr).alias("bb")) \
                .select("doc_id", F.col("bb.band").alias("band"),
                        F.col("bb.bucket").alias("bucket"))
    grouped = (banded.groupBy("band", "bucket")
               .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
               .filter(F.size("ids") > 1))
    return (_pairs_within_groups(grouped)
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_bands")))


def _hexval(c):
    """hex char -> int via ascii arithmetic (identical SQL twin)."""
    return F.ascii(c) - 48 - 39 * (F.ascii(c) >= 97).cast("int")


def simhash(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over whitespace tokens. Per token, a 16-bit hash is
    decoded from the first 4 hex chars of md5(token) (ascii arithmetic —
    no hex-parse builtin needed, so DuckDB matches). Bit votes are 16
    conditional sums in one groupBy."""
    toks = tokens_col()
    d = docs.select("doc_id", F.explode(toks).alias("tok"))
    h = F.md5("tok")
    val = (_hexval(F.substring(h, 1, 1)) * 4096
           + _hexval(F.substring(h, 2, 1)) * 256
           + _hexval(F.substring(h, 3, 1)) * 16
           + _hexval(F.substring(h, 4, 1)))
    d = d.select("doc_id", val.alias("hv"))
    votes = [F.sum(((F.col("hv") / (1 << i)).cast("int") % 2) * 2 - 1)
             .alias(f"bit{i}") for i in range(16)]
    voted = d.groupBy("doc_id").agg(*votes)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"bit{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return voted.select("doc_id", sim.cast("long").alias("simhash16"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Candidate pairs whose 16-bit simhash differ in <= max_hamming bits.
    Band the 16 bits into 4 nibbles; by pigeonhole, hamming<=2 pairs share
    >=2 of 4 nibbles — join per nibble, then verify exact hamming."""
    s = simhash(docs)
    nib_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 ((F.col("simhash16") / (1 << (4 * b))).cast("int") % 16)
                 .alias("nib"))
        for b in range(4)])
    banded = (s.select("doc_id", "simhash16", F.explode(nib_arr).alias("bb"))
              .select("doc_id", "simhash16",
                      F.col("bb.band").alias("band"),
                      F.col("bb.nib").alias("nib")))
    grouped = (banded.groupBy("band", "nib")
               .agg(F.sort_array(
                   F.collect_list(F.struct("doc_id", "simhash16")))
                   .alias("members"))
               .filter(F.size("members") > 1))
    n = F.size("members")
    pair_structs = F.flatten(F.transform(
        F.col("members"),
        lambda x, i: F.transform(
            F.slice(F.col("members"), i + 2, n),
            lambda y: F.struct(x["doc_id"].alias("doc_a"),
                               y["doc_id"].alias("doc_b"),
                               x["simhash16"].alias("sim_a"),
                               y["simhash16"].alias("sim_b")))))
    cand = (grouped.select(F.explode(pair_structs).alias("p"))
            .select("p.doc_a", "p.doc_b", "p.sim_a", "p.sim_b")
            .distinct())
    xor = F.col("sim_a").bitwiseXOR(F.col("sim_b"))
    hamming = None
    for i in range(16):
        bit = (xor / (1 << i)).cast("int") % 2
        hamming = bit if hamming is None else hamming + bit
    return (cand.withColumn("hamming", hamming.cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))
