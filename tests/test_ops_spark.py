"""Training-data operator tests on small deterministic in-memory tables
(the DuckDB oracle twins are exercised by the driver + scripts/parity.py;
these assert the operator SEMANTICS directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propertygraph_spark.ops import dedup, kgdocs, similarity, text
from propertygraph_spark.ops.multimodal import (decode_media_meta,
                                                resize_stub, synthesize_media)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog sat too", "en", "s", 43),
        (1, "the cat sat on the mat and the dog sat too", "en", "s", 43),  # dup of 0
        (2, "the cat sat on the mat and the dog ran away", "en", "s", 44),  # near-dup
        (3, "der hund ist nicht ein tier und das ist gut", "de", "s", 43),
        (4, "completely different words entirely here now", "en", "s", 44),
        (5, "", "en", "s", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0, 0.0], 1),   # opposite of 0
        (4, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_token_stats(docs):
    out = {r["doc_id"]: r for r in text.token_stats(docs).collect()}
    assert out[0]["n_tokens"] == 11
    assert out[5]["n_tokens"] == 0
    assert out[0]["n_bpe_tokens"] == 11


def test_quality_score_empty_doc_safe(docs):
    out = {r["doc_id"]: r for r in text.quality_score(docs).collect()}
    assert out[5]["quality_score"] == 0
    # 'the' x3 + 'and' of 11 tokens -> floor(4000/11) = 363
    assert out[0]["stopword_per_mille"] == 363


def test_language_id(docs):
    out = {r["doc_id"]: r["pred_lang"] for r in text.language_id(docs).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[4] == "und"  # no marker words at all


def test_fingerprint_matches_for_exact_dups(docs):
    out = {r["doc_id"]: r for r in text.fingerprint(docs).collect()}
    assert out[0]["content_md5"] == out[1]["content_md5"]
    assert out[0]["min_shingle_md5"] == out[1]["min_shingle_md5"]
    assert out[0]["content_md5"] != out[2]["content_md5"]
    assert out[5]["min_shingle_md5"] is None  # too short for shingles


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_doc_id"] == 0


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_pm"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold_pm=300).collect()}
    assert pairs[(0, 1)] == 1000           # identical
    assert (0, 2) in pairs                 # near-dup above threshold
    assert all(a < b for a, b in pairs)    # canonical ordering


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    """Prefix-filtered all-pairs must equal a naive Python reference on a
    corpus engineered with partial overlaps around the threshold."""
    import itertools
    rng_words = ["w%d" % i for i in range(30)]
    texts = {}
    for d in range(24):
        # sliding windows with varying stride -> graded pairwise overlap
        lo = (d * 3) % 18
        texts[d] = " ".join(rng_words[lo:lo + 10] + rng_words[:d % 4])
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string")

    def shingles(t, k=3):
        toks = t.split()
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    want = {}
    for x, y in itertools.combinations(sorted(texts), 2):
        a, b = shingles(texts[x]), shingles(texts[y])
        if not a or not b:
            continue
        inter = len(a & b)
        jpm = inter * 1000 // len(a | b)
        if jpm >= 300:
            want[(x, y)] = (inter, jpm)
    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard_pm"])
           for r in dedup.ngram_jaccard_pairs(
               docs, threshold_pm=300).collect()}
    assert got == want
    # the naive inverted-index plan (bench baseline) is bit-identical
    naive = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard_pm"])
             for r in dedup.ngram_jaccard_pairs(
                 docs, threshold_pm=300, prefix_filter=False).collect()}
    assert naive == want


def test_substring_dup_spans_marks_covered_positions(spark):
    """Lee-et-al-style exact substring marking: positions covered by a
    cross-doc repeated 13-gram count as duplicated; in-doc repeats and
    unique docs do not."""
    shared = " ".join(f"s{i}" for i in range(13))
    rows = [(1, shared + " uniq1 a b"),
            (2, "x y " + shared),
            (3, "totally different words only here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["n_dup_tokens"], r["dup_pm"])
           for r in dedup.substring_dup_spans(docs).collect()}
    assert out[1] == (16, 13, 812)   # positions 1..13; 13000 // 16
    assert out[2] == (15, 13, 866)   # positions 3..15; 13000 // 15
    assert out[3] == (5, 0, 0)       # unique doc, shorter than k: zero


def test_substring_cut_removes_spans_and_is_idempotent(spark):
    """VERDICT r4 #3 (removal half): the cut drops exactly the marked
    positions, merges adjacent spans by construction, keeps unique
    docs byte-identical — and re-running DETECTION on the cleaned
    corpus finds nothing (idempotence: a cross-doc span is cut from
    every doc that carried it)."""
    from pyspark.sql import functions as F
    shared = " ".join(f"s{i}" for i in range(13))
    rows = [(1, shared + " uniq1 a b"),
            (2, "x y " + shared),
            (3, "totally different words only here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["n_kept_tokens"],
                         r["clean_text"])
           for r in dedup.substring_dup_cut(docs).collect()}
    assert out[1] == (16, 3, "uniq1 a b")
    assert out[2] == (15, 2, "x y")
    assert out[3] == (5, 5, "totally different words only here")
    # idempotence: detection over the cleaned corpus is all-zero
    cleaned = spark.createDataFrame(
        [(d, t) for d, (_n, _k, t) in out.items()],
        "doc_id long, text string")
    redetect = dedup.substring_dup_spans(cleaned).collect()
    assert all(r["n_dup_tokens"] == 0 for r in redetect)
    # and a second cut is the identity on the cleaned text
    recut = {r["doc_id"]: r["clean_text"]
             for r in dedup.substring_dup_cut(cleaned).collect()}
    assert recut == {d: t for d, (_n, _k, t) in out.items()}


def test_ngram_verification_never_ships_arrays(spark):
    """VERDICT r3 #4: verification must intersect (doc, shingle-hash)
    ROWS, never replicate a per-doc shingle array to each candidate
    pair — a mega-doc with many near-dup copies stays row-splittable."""
    mega = " ".join("tok%d" % i for i in range(400))
    rows = [(0, mega)] + [
        (d, mega + " tail%d" % d) for d in range(1, 6)]  # 5 near-dups
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import contextlib
    import io
    out = dedup.ngram_jaccard_pairs(docs, threshold_pm=900)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "collect_list" not in p and "array_intersect" not in p
    got = {(r["doc_a"], r["doc_b"]): r["n_inter"] for r in out.collect()}
    # all C(6,2) pairs are near-dups sharing the 398-shingle mega core
    assert len(got) == 15
    assert got[(0, 1)] == 398  # mega vs mega+tail: core shingles shared


def test_minhash_lsh_candidates(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["n_bands"]
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert pairs[(0, 1)] == 4              # identical docs collide in all bands
    assert (0, 4) not in pairs             # unrelated docs don't collide


def test_dedup_clusters_keeps_one_per_cluster(spark):
    """Identical docs collapse into one cluster with the min doc_id as
    keeper; distinct docs stay their own keepers."""
    rows = [(1, "same text here"), (5, "same text here"),
            (9, "same text here"), (2, "unique content alpha"),
            (3, "unique content beta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster_id"], r["is_keeper"])
           for r in dedup.dedup_clusters(docs).collect()}
    assert out[1] == (1, 1) and out[5] == (1, 0) and out[9] == (1, 0)
    assert out[2] == (2, 1) and out[3] == (3, 1)


def test_dedup_clusters_mega_cluster_is_linear(spark):
    """20k identical docs: the star-edge formulation emits O(n x bands)
    edges where pairwise would be ~200M x 4 — this finishing in seconds
    IS the assertion (plus exact component output)."""
    n = 20_000
    rows = [(d, "the same boilerplate shard text") for d in range(n)] \
        + [(n, "different")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.dedup_clusters(docs)
    agg = out.agg(
        F.count("*").alias("rows"),
        F.sum("is_keeper").alias("keepers"),
        F.countDistinct("cluster_id").alias("clusters")).collect()[0]
    assert agg["rows"] == n + 1
    assert agg["keepers"] == 2          # cluster rep + the singleton
    assert agg["clusters"] == 2


def test_simhash_pairs(docs):
    sims = {r["doc_id"]: r["simhash16"] for r in dedup.simhash(docs).collect()}
    assert sims[0] == sims[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0


def test_cosine_topk_exact(emb):
    out = similarity.cosine_topk(emb, k=2).collect()
    top = {(r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cos_pm"])
           for r in out}
    assert top[(0, 1)][0] == 1             # nearest to e0 is e1
    assert top[(0, 1)][1] > 990_000
    # opposite vector ranks last -> not in top-2 of vec 0's list? it is k=2
    # over 4 candidates; ensure -1.0 cosine computed right for (0,3)
    all_pairs = {(r["vec_id"], r["neighbor_id"]): r["cos_pm"]
                 for r in similarity.cosine_topk(emb, k=4).collect()}
    assert all_pairs[(0, 3)] == -1_000_000


def test_ann_lsh_recall_on_clear_neighbors(emb):
    """The sign-sketch must keep the (0,1) near-identical pair together."""
    out = similarity.ann_lsh_topk(emb, k=2).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    if 0 in by_vec:  # bucket may isolate a vector; near-dup must co-bucket
        assert 1 in by_vec[0]
    buckets = {r["vec_id"]: r["bucket"]
               for r in similarity.lsh_bucket(emb).collect()}
    assert buckets[0] == buckets[1]
    assert buckets[0] != buckets[3]  # opposite vectors differ in every plane


def test_ann_lsh_multitable_recall_and_dedup(emb):
    """r5 multi-table LSH: (0,1) co-bucket in EVERY table (no sign can
    flip: |s1*0.1| < |s0*0.99|), so the pair must surface despite the
    12-fold bucket explosion; the opposite vector 3 differs from 0 in
    every table. The union dedup must leave exactly one row per
    (vec_id, neighbor_id) with dense per-vec ranks."""
    out = similarity.ann_lsh_mt_topk(emb, k=2).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r)
    nbrs0 = {r["neighbor_id"]: r["cos_pm"] for r in by_vec[0]}
    assert 1 in nbrs0 and nbrs0[1] > 990_000
    assert 3 not in nbrs0  # never co-buckets with its negation
    for vid, rows in by_vec.items():
        pairs = [(r["neighbor_id"]) for r in rows]
        assert len(pairs) == len(set(pairs)), f"dup pair for {vid}"
        assert sorted(r["rnk"] for r in rows) == list(
            range(1, len(rows) + 1))
    # every vector sharing ANY table bucket with 0 is a candidate, so
    # the near-dup appears exactly once even though 12 tables found it
    mt = similarity.lsh_multitable_buckets(emb).collect()
    tables0 = {r["bucket"] for r in mt if r["vec_id"] == 0}
    tables1 = {r["bucket"] for r in mt if r["vec_id"] == 1}
    assert tables0 == tables1  # co-bucket in all 12 tables
    assert len(tables0) == 12


def test_media_decode_roundtrip(docs):
    media = synthesize_media(docs)
    meta = {r["doc_id"]: r for r in decode_media_meta(media).collect()}
    assert set(meta) == {0, 1, 2, 3, 4, 5}
    for r in meta.values():
        assert r["n_bytes"] == 32
        assert 1 <= r["width"] <= 4096 and 1 <= r["height"] <= 4096
    # identical text -> identical payload-derived metadata
    assert (meta[0]["width"], meta[0]["height"]) == \
           (meta[1]["width"], meta[1]["height"])
    resized = resize_stub(media).collect()
    assert all(len(bytes(r["payload"])) == 16 and r["width"] == 224
               for r in resized)


def test_frame_sample_and_features(docs):
    from propertygraph_spark.ops.multimodal import (feature_extract,
                                                    frame_sample)
    media = synthesize_media(docs)
    frames = frame_sample(media).collect()
    vids = {r["doc_id"] for r in frames}
    assert vids == {2, 5}                       # doc_id % 3 == 2
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        assert [r["frame_idx"] for r in sorted(
            rows, key=lambda x: x["frame_idx"])] == [0, 1, 2, 3]
        assert all(r["ts_ms"] == r["frame_idx"] * 40 for r in rows)
        assert all(r["n_bytes"] == 8 for r in rows)
    feats = {r["doc_id"]: r["features"]
             for r in feature_extract(media).collect()}
    assert set(feats) == {0, 1, 2, 3, 4, 5}
    assert all(len(v) == 8 and all(0.0 <= x <= 1.0 for x in v)
               for v in feats.values())
    # identical text + id -> identical features; distinct docs differ
    assert feats[0] != feats[4]


def test_feature_extract_empty_payload_safe(spark):
    from propertygraph_spark.ops.multimodal import feature_extract
    media = spark.createDataFrame(
        [(1, "image", bytearray(b"")), (2, "image", bytearray(b"\x80"))],
        "doc_id long, media_kind string, payload binary")
    out = {r["doc_id"]: list(r["features"])
           for r in feature_extract(media).collect()}
    assert out[1] == [0.0] * 8          # empty payload -> zero vector
    assert all(abs(x - 128 / 255) < 1e-6 for x in out[2])


def test_kgdocs_roundtrip_and_counts(spark, docs):
    rt = kgdocs.spans_roundtrip(docs)
    rows = rt.filter(F.col("doc_id") == "0").orderBy("seq").collect()
    assert [r["kind"] for r in rows] == ["text", "code", "media"]  # 0 % 4 == 0
    assert rows[1]["text"].startswith("class D0")
    counts = {r["pred"]: r["n_triples"]
              for r in kgdocs.triples_by_pred(docs).collect()}
    # 6 docs: tpl = doc_id % 4 -> templates [0,1,2,3,0,1]
    exp: dict = {}
    for d in range(6):
        for pred, c in kgdocs.TEMPLATE_TRIPLE_COUNTS[d % 4].items():
            exp[pred] = exp.get(pred, 0) + c
    assert counts == exp


def test_chunked_pair_expansion_matches_naive(spark):
    """Odd chunk size, multiple chunks: the chunked expansion must emit
    EXACTLY the i<j pair set of each bucket (chunking is a physical
    rewrite, not a semantic one)."""
    import itertools
    rows = ([(d, "b0") for d in range(30)]
            + [(d, "b1") for d in range(100, 107)]
            + [(999, "lonely")])
    banded = spark.createDataFrame(rows, "doc_id long, bucket string") \
                  .withColumn("band", F.lit(0))
    got = {(r["doc_a"], r["doc_b"]) for r in dedup._bucket_pairs_chunked(
        banded, ["band", "bucket"], chunk_size=7).collect()}
    exp = set(itertools.combinations(range(30), 2)) \
        | set(itertools.combinations(range(100, 107), 2))
    assert got == exp


def test_minhash_lsh_hot_bucket_skew(spark):
    """5000 identical docs share every LSH bucket — the degenerate
    training-corpus case. With chunking no task expands the whole bucket
    (groups are <= 2*chunk_size members by construction); result must
    still be the complete pair set colliding in all 4 bands."""
    n = 5000
    rows = [(d, "same boilerplate text repeated in every doc of the shard")
            for d in range(n)] + [(n, "something entirely different here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.minhash_lsh_pairs(docs, hot_threshold=256)
    agg = out.agg(F.count("*").alias("n_pairs"),
                  F.min("n_bands").alias("min_b"),
                  F.max("n_bands").alias("max_b")).collect()[0]
    assert agg["n_pairs"] == n * (n - 1) // 2
    assert agg["min_b"] == 4 and agg["max_b"] == 4


def test_cosine_topk_sharded_index_matches_single_block(emb):
    """Block-sharded brute force (index 10x the block size in block count
    terms) must equal the single-collect result exactly."""
    single = {(r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cos_pm"])
              for r in similarity.cosine_topk(emb, k=3).collect()}
    sharded = {(r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cos_pm"])
               for r in similarity.cosine_topk(
                   emb, k=3, index_block_rows=1).collect()}
    assert sharded == single


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Tiny events table with hand-placed gaps for the range-join and
    as-of edge cases (written as parquet: the ops read from an sf dir)."""
    d = str(tmp_path_factory.mktemp("events_sf"))
    rows = [
        # user 1: gap 80s ACROSS two minute boundaries (00:50 -> 02:10):
        # a fixed 1-minute bin would put them 2 bins apart and lose them
        (1, 1, "2024-01-01 00:00:50", "view", 1.0),
        (2, 1, "2024-01-01 00:02:10", "click", 2.0),
        # user 2: gap 30s (same minute)
        (3, 2, "2024-01-01 00:00:00", "view", 3.0),
        (4, 2, "2024-01-01 00:00:30", "click", 4.0),
        # user 3: view and click at the SAME timestamp, view has the
        # LARGER event_id -> ASOF <= must still see the view
        (6, 3, "2024-01-01 00:05:00", "click", 5.0),
        (7, 3, "2024-01-01 00:05:00", "view", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string,"
              " value double").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz"))
    df.coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_range_join_window_follows_parameter(spark, events_dir):
    from propertygraph_spark.ops import relational
    pairs60 = {(r["event_a"], r["event_b"]): r["gap_sec"]
               for r in relational.events_range_join(
                   spark, events_dir, window_sec=60).collect()}
    pairs120 = {(r["event_a"], r["event_b"]): r["gap_sec"]
                for r in relational.events_range_join(
                    spark, events_dir, window_sec=120).collect()}
    assert (1, 2) not in pairs60          # 80s > 60s window
    assert pairs120[(1, 2)] == 80         # 80s <= 120s: bin math must keep it
    assert pairs60[(3, 4)] == 30
    # DuckDB twin at the non-default window
    import duckdb
    con = duckdb.connect()
    exp = {(a, b): g for a, b, g in con.execute(f"""
        WITH e AS (SELECT event_id, date_trunc('second', ts) AS ts, user_id
                   FROM read_parquet('{events_dir}/events.parquet/*.parquet'))
        SELECT a.event_id, b.event_id,
               CAST(date_diff('second', a.ts, b.ts) AS BIGINT)
        FROM e a JOIN e b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND abs(date_diff('second', a.ts, b.ts)) <= 120
        """).fetchall()}
    assert pairs120 == exp


def test_asof_sees_equal_timestamp_view(spark, events_dir):
    from propertygraph_spark.ops import relational
    out = {r["event_id"]: r for r in
           relational.asof_view_before_click(spark, events_dir).collect()}
    # click 6 and view 7 share ts; view's larger event_id must not hide it
    assert out[6]["last_view_value"] == 6.0
    assert out[6]["last_view_ts"] is not None


def test_quantize_int8(emb):
    out = {r["vec_id"]: r for r in similarity.quantize_int8(emb).collect()}
    # unit vector [1,0,0,0]: scale 127, codes [127,0,0,0]
    assert out[0]["code_max"] == 127 and out[0]["code_min"] == 0
    assert out[0]["code_sum"] == 127 and out[0]["code_abs_sum"] == 127
    assert out[0]["scale_pm"] == 127_000_000
    # opposite vector: code_min == -127
    assert out[3]["code_min"] == -127 and out[3]["code_sum"] == -127
    # every vector's max |code| is exactly 127 (symmetric scaling)
    assert all(max(r["code_max"], -r["code_min"]) == 127
               for r in out.values())


def test_pii_scrub_patterns(spark):
    from propertygraph_spark.ops.text import pii_scrub
    docs = spark.createDataFrame(
        [(1, "mail me at a.b+c@example.org or visit https://x.io/p?q=1 "
             "ref 12345678 ok"),
         (2, "no pii here 123"),
         (3, "two mails x@y.co z@w.io and 99999999999")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_urls"],
            out[1]["n_long_numbers"]) == (1, 1, 1)
    assert (out[2]["n_emails"], out[2]["n_urls"],
            out[2]["n_long_numbers"]) == (0, 0, 0)
    assert (out[3]["n_emails"], out[3]["n_long_numbers"]) == (2, 1)
    import hashlib
    want = "mail me at <EMAIL> or visit <URL> ref <NUM> ok"
    assert out[1]["scrubbed_md5"] == hashlib.md5(want.encode()).hexdigest()
    assert out[1]["scrubbed_len"] == len(want)


def test_contamination_check_finds_eval_overlap(spark):
    from propertygraph_spark.ops.text import contamination_check
    # doc 0 is "eval" (0 % 97 == 0); doc 1 shares its 5-gram, doc 2 not
    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(0, shared + " zeta"), (1, "x " + shared + " y"),
         (2, "totally different words here now")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["n_contaminated_ngrams"]
           for r in contamination_check(docs).collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out  # inner join: clean docs drop
    assert 0 not in out  # eval docs are not scanned


def test_repetition_ratio_detects_boilerplate(spark):
    from propertygraph_spark.ops.text import repetition_ratio
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),   # one dominant trigram
         (2, "all words here are different ok"),
         (3, "a b")],                            # < k tokens -> zeros
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_ratio(docs).collect()}
    assert out[1]["n_ngrams"] == 4 and out[1]["max_repeat"] == 4
    assert out[1]["repetition_pm"] == 1000
    assert out[2]["max_repeat"] == 1
    assert out[3]["n_ngrams"] == 0 and out[3]["repetition_pm"] == 0


def test_matryoshka_truncate_energy(spark):
    from propertygraph_spark.ops.similarity import matryoshka_truncate
    # 16-dim vector: first 8 dims carry 1.0 each, rest 0 -> full energy 8,
    # truncated energy 8 -> 1000 per-mille kept; second vector splits
    rows = [(1, [1.0] * 8 + [0.0] * 8), (2, [1.0] * 16), (3, [0.0] * 16)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in matryoshka_truncate(emb, dims=8).collect()}
    assert out[1]["energy_kept_pm"] == 1000
    assert out[2]["energy_kept_pm"] == 500
    assert out[3]["energy_kept_pm"] == 0
    assert out[2]["norm_full_pm"] == 4_000_000  # sqrt(16) = 4
    assert out[2]["norm_trunc_pm"] == int(8 ** 0.5 * 1_000_000)


def test_vocab_fuzzy_pairs_symspell_complete(spark):
    """Deletion-neighborhood join must find ALL distance<=1 pairs
    (substitution, insertion, deletion) and nothing farther."""
    from propertygraph_spark.ops.text import vocab_fuzzy_pairs
    words = {
        "benchmark": 3, "benchmark": 3,  # noqa: F601
        "benchmarc": 3,   # substitution of benchmark
        "benchmarks": 3,  # insertion
        "benchmar": 3,    # deletion
        "completely": 3, "cxmpletely": 3,  # substitution pair
        "unrelatedword": 3,
        "rare_token_x": 1,  # below min_count: excluded
    }
    rows = [(i, " ".join(w for w, c in words.items() for _ in range(c)))
            for i in range(1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["token_a"], r["token_b"])
           for r in vocab_fuzzy_pairs(docs, min_count=3).collect()}
    assert ("benchmarc", "benchmark") in got
    assert ("benchmark", "benchmarks") in got
    assert ("benchmar", "benchmark") in got
    assert ("completely", "cxmpletely") in got
    assert not any("unrelatedword" in p for pair in got for p in pair)
    assert not any("rare_token_x" in pair for pair in got)
    # exhaustive cross-check vs brute force levenshtein
    import itertools

    def lev(a, b):
        if len(a) > len(b):
            a, b = b, a
        prev = list(range(len(a) + 1))
        for j, cb in enumerate(b, 1):
            cur = [j]
            for i, ca in enumerate(a, 1):
                cur.append(min(prev[i] + 1, cur[-1] + 1,
                               prev[i - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    vocab = [w for w, c in words.items() if c >= 3 and 8 <= len(w) <= 20]
    want = {tuple(sorted((x, y)))
            for x, y in itertools.combinations(sorted(set(vocab)), 2)
            if lev(x, y) <= 1}
    assert got == want


def test_embedding_near_dupes_finds_identical_vectors(emb):
    """Identical/near-identical vectors pair up above the threshold;
    orthogonal vectors never do."""
    pairs = {(r["vec_a"], r["vec_b"]): r["cos_pm"]
             for r in similarity.embedding_near_dupes(
                 emb, threshold_pm=900_000).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 900_000
    assert all(a < b for a, b in pairs)       # canonical ordering
    assert (0, 2) not in pairs                # orthogonal
    assert (0, 3) not in pairs                # opposite


def test_winnow_fingerprint_matches_reference_python(spark):
    """Winnowing mins recomputed in plain Python (hash k-grams, window
    minima, distinct+sort) must match the Catalyst formulation; docs
    sharing a long substring share fingerprints."""
    import hashlib
    rows = [(1, "a b c d e f g h i j"),
            (2, "z z a b c d e f g h i j"),   # shares a long substring
            (3, "q r"),                        # < k tokens: no ngrams
            (4, "m n o p")]                    # n < w: single window
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.winnow_fingerprint(docs, k=3, w=4).collect()}

    def ref(txt, k=3, w=4):
        toks = txt.split()
        hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
              for i in range(len(toks) - k + 1)]
        if not hs:
            return [], 0
        if len(hs) < w:
            mins = [min(hs)]
        else:
            mins = [min(hs[i:i + w]) for i in range(len(hs) - w + 1)]
        return sorted(set(mins)), len(hs)

    for d, txt in rows:
        sel, n = ref(txt)
        assert out[d]["n_ngrams"] == n
        assert out[d]["n_fingerprints"] == len(sel)
        if sel:
            want = hashlib.md5("|".join(sel).encode()).hexdigest()
            assert out[d]["fingerprint_md5"] == want
        else:
            assert out[d]["fingerprint_md5"] is None
    # shared-substring guarantee: doc1 and doc2 share >= w+k-1 tokens ->
    # at least one common selected fingerprint
    s1, _ = ref(rows[0][1])
    s2, _ = ref(rows[1][1])
    assert set(s1) & set(s2)


def test_pagerank_int_cycle_is_fixed_point(spark):
    # a directed 3-cycle is symmetric: every node keeps exactly `unit`
    # (base + damp*unit = unit), so any drift exposes a formula bug
    from propertygraph_spark.ops.graph import pagerank_int
    edges = spark.createDataFrame(
        [("g", 1, 2), ("g", 2, 3), ("g", 3, 1)], "scope string, src long, dst long")
    out = {r["node"]: r["rank_mu"]
           for r in pagerank_int(edges, scope="scope").collect()}
    assert out == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}


def test_pagerank_int_matches_host_replay(spark):
    # star + chain graph, duplicate edge, self-loop: the distributed run
    # must be bit-identical to the integer host replay in kgdocs
    from propertygraph_spark.ops.graph import pagerank_int
    from propertygraph_spark.ops.kgdocs import _pagerank_hist
    raw = [(1, 2), (1, 3), (1, 4), (4, 5), (5, 5), (2, 4), (1, 2)]
    triples = [{"pred": "pdg_data", "subj": a, "obj": b} for a, b in raw]
    expect = _pagerank_hist(triples)
    edges = spark.createDataFrame(
        [("m", a, b) for a, b in raw], "scope string, src long, dst long")
    got: dict = {}
    for r in pagerank_int(edges, scope="scope").collect():
        got[r["rank_mu"]] = got.get(r["rank_mu"], 0) + 1
    assert got == expect


def test_triangle_count_scoped(spark):
    from propertygraph_spark.ops.graph import triangle_count
    rows = [
        # scope a: K4 minus one edge = 2 triangles, plus direction noise
        ("a", 1, 2), ("a", 2, 1), ("a", 2, 3), ("a", 1, 3),
        ("a", 3, 4), ("a", 2, 4), ("a", 1, 1),
        # scope b: a single triangle reached through reversed edges
        ("b", 9, 8), ("b", 8, 7), ("b", 7, 9),
        # scope c: a path -> no triangles (must not emit a row)
        ("c", 1, 2), ("c", 2, 3),
    ]
    edges = spark.createDataFrame(rows, "scope string, src long, dst long")
    out = {r["scope"]: r["n_triangles"]
           for r in triangle_count(edges, scope="scope").collect()}
    assert out == {"a": 2, "b": 1}


def test_triangle_wedges_bounded_on_star_graph(spark):
    """Degree-ordered orientation (VERDICT r3 #3): a hub keeps NO
    out-edges, so a star graph generates zero wedges — an id-only
    orientation with a mid-id hub would generate ~n^2/4."""
    from propertygraph_spark.ops.graph import (_oriented_wedges,
                                               triangle_count)
    n = 200
    hub = n // 2  # mid-range id: worst case for id-only orientation
    rows = [("s", hub, i) for i in range(n + 1) if i != hub]
    edges = spark.createDataFrame(rows, "scope string, src long, dst long")
    oriented, wedge = _oriented_wedges(edges, "src", "dst", ["scope"])
    # every edge points AT the hub (highest degree); no node has 2 out
    assert oriented.filter(F.col("a") == hub).count() == 0
    assert wedge.count() == 0
    assert triangle_count(edges, scope="scope").count() == 0
    # hub + one closing edge between two leaves -> exactly 1 triangle,
    # and only O(1) wedges materialize
    edges2 = edges.unionByName(spark.createDataFrame(
        [("s", 3, 7)], "scope string, src long, dst long"))
    _, wedge2 = _oriented_wedges(edges2, "src", "dst", ["scope"])
    assert wedge2.count() == 1  # at a leaf endpoint, not C(n,2) at hub
    out = triangle_count(edges2, scope="scope").collect()
    assert [(r["scope"], r["n_triangles"]) for r in out] == [("s", 1)]


def test_boilerplate_ngrams_finds_shared_phrase(spark):
    from propertygraph_spark.ops.text import boilerplate_ngrams
    rows = [(i, f"unique{i} words here all rights reserved contact us")
            for i in range(6)] + [(99, "totally different content entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = boilerplate_ngrams(docs, k=3, top_n=3).collect()
    assert top[0]["shingle"] == "all rights reserved"
    assert top[0]["n_occurrences"] == 6 and top[0]["n_docs"] == 6
    # deterministic tie-break: equal-count shingles come lexicographically
    assert top[1]["shingle"] < top[2]["shingle"] or \
        top[1]["n_occurrences"] > top[2]["n_occurrences"]


def test_zipf_topk_ranks_by_frequency(spark):
    from propertygraph_spark.ops.text import zipf_topk
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], "doc_id long, text string")
    out = zipf_topk(docs, top_n=3).collect()
    assert [(r["rank"], r["token"], r["n_occurrences"]) for r in out] == \
        [(1, "a", 4), (2, "b", 3), (3, "c", 1)]


def test_heavy_hitters_cms_overcounts_never_under(spark):
    from propertygraph_spark.ops.text import heavy_hitters_cms
    docs = spark.createDataFrame(
        [(1, "x x x x y y z"), (2, "x y w v u t s r q p o n m")],
        "doc_id long, text string")
    out = heavy_hitters_cms(docs, top_n=5).collect()
    assert out[0]["token"] == "x" and out[0]["n_occurrences"] == 5
    for r in out:  # CMS property: estimate is an upper bound
        assert r["cms_estimate"] >= r["n_occurrences"], r


def test_kcore_peeling_matches_host_replay(spark):
    from propertygraph_spark.ops.graph import kcore_nodes
    from propertygraph_spark.ops.kgdocs import _kcore_size
    # triangle with a pendant chain (peels in 2 rounds) + a square
    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5),
           (10, 11), (11, 12), (12, 13), (13, 10)]
    triples = [{"pred": "pdg_data", "subj": a, "obj": b} for a, b in raw]
    edges = spark.createDataFrame([("m", a, b) for a, b in raw],
                                  "scope string, src long, dst long")
    got = kcore_nodes(edges, k=2, scope="scope").collect()
    assert len(got) == _kcore_size(triples) == 7  # triangle + square
    assert {r["node"] for r in got} == {1, 2, 3, 10, 11, 12, 13}


def test_bfs_levels_min_hop_cycle_and_unreachable(spark):
    """Root = min node per scope; levels are MIN-hop (the diamond's
    short path wins); cycle back-edges don't revisit; unreachable nodes
    are absent; disjoint scopes traverse independently."""
    from propertygraph_spark.ops.graph import bfs_levels
    rows = [
        # scope m: 1->2->3->1 cycle, diamond shortcut 1->4 beside
        # 2->4, and an unreachable island 7->8
        ("m", 1, 2), ("m", 2, 3), ("m", 3, 1), ("m", 1, 4), ("m", 2, 4),
        ("m", 7, 8),
        # scope n: plain chain rooted at its min node 10
        ("n", 10, 11), ("n", 11, 12),
    ]
    edges = spark.createDataFrame(rows, "scope string, src long, dst long")
    got = {(r["scope"], r["node"]): r["level"]
           for r in bfs_levels(edges, scope="scope").collect()}
    assert got == {("m", 1): 0, ("m", 2): 1, ("m", 4): 1, ("m", 3): 2,
                   ("n", 10): 0, ("n", 11): 1, ("n", 12): 2}


def test_bfs_levels_matches_host_replay(spark):
    from propertygraph_spark.ops.graph import bfs_levels
    from propertygraph_spark.ops.kgdocs import _bfs_hist
    raw = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 2), (5, 6)]
    triples = [{"pred": "cfg_normal", "method_id": "m", "subj": a,
                "obj": b} for a, b in raw]
    expect = _bfs_hist(triples)
    edges = spark.createDataFrame([("m", a, b) for a, b in raw],
                                  "scope string, src long, dst long")
    got: dict = {}
    for r in bfs_levels(edges, scope="scope").collect():
        got[r["level"]] = got.get(r["level"], 0) + 1
    assert got == expect


def test_salient_terms_integer_tfidf(spark):
    from propertygraph_spark.ops.text import salient_terms
    docs = spark.createDataFrame(
        [(1, "apple apple banana common"), (2, "banana common common"),
         (3, "cherry common")], "doc_id long, text string")
    out = salient_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rk"], r["token"], r["tf"], r["df"], r["score"]))
    # N=3: idf_scaled apple=3M, banana=1.5M, common=1M, cherry=3M
    assert by_doc[1] == [(1, "apple", 2, 1, 6_000_000),
                        (2, "banana", 1, 2, 1_500_000)]
    assert by_doc[2] == [(1, "common", 2, 3, 2_000_000),
                        (2, "banana", 1, 2, 1_500_000)]
    assert by_doc[3] == [(1, "cherry", 1, 1, 3_000_000),
                        (2, "common", 1, 3, 1_000_000)]


def test_decontaminate_drops_overlapping_train_docs(spark):
    from propertygraph_spark.ops.text import decontaminate
    shared = "alpha beta gamma delta epsilon"
    rows = [(0, shared + " zeta", "en", 30),          # eval slice (0 % 97)
            (1, "clean words only here today now", "en", 29),
            (2, shared + " completely different tail", "de", 40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    out = decontaminate(docs)
    # survivors keep EVERY payload column of the input (ADVICE r3)
    assert out.columns == docs.columns
    kept = out.collect()
    # doc 2 shares the 5-gram with the eval doc -> dropped; doc 1 stays
    assert [(r["doc_id"], r["lang"], r["n_chars"]) for r in kept] == \
        [(1, "en", 29)]
    assert kept[0]["text"].startswith("clean words")


def test_event_transitions_bigrams(spark):
    from propertygraph_spark.ops import relational
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 10, "view", 1.0), (2, t0.replace(minute=1), 10, "click", 1.0),
            (3, t0.replace(minute=2), 10, "buy", 1.0),
            (4, t0, 20, "view", 1.0), (5, t0.replace(minute=5), 20, "click", 1.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
              " event_type string, value double")
    import os, tempfile
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {(r["event_type"], r["next_type"]): r["n_transitions"]
           for r in relational.event_transitions(spark, d).collect()}
    assert out == {("view", "click"): 2, ("click", "buy"): 1}


def test_bfs_levels_random_graphs_match_host(spark):
    """20 seeded random digraphs (cycles, self-loops, disconnection all
    arise naturally) in ONE scoped DataFrame — the distributed BFS must
    match the pure-Python host replay on every one."""
    import random

    from propertygraph_spark.ops.graph import bfs_levels
    from propertygraph_spark.ops.kgdocs import _bfs_hist
    rng = random.Random(7)
    rows, expect = [], {}
    for g in range(20):
        n = rng.randint(2, 12)
        edges = {(rng.randint(0, n - 1), rng.randint(0, n - 1))
                 for _ in range(rng.randint(1, 3 * n))}
        scope = f"g{g}"
        rows += [(scope, a, b) for a, b in edges]
        triples = [{"pred": "cfg_normal", "method_id": scope,
                    "subj": a, "obj": b} for a, b in edges]
        expect[scope] = _bfs_hist(triples)
    df = spark.createDataFrame(rows, "scope string, src long, dst long")
    # both physical strategies (per-partition host BFS and the Pregel
    # frontier loop) must reproduce the host replay exactly
    for bounded in (True, False):
        got: dict = {}
        for r in bfs_levels(df, scope="scope",
                            bounded_scopes=bounded).collect():
            got.setdefault(r["scope"], {})
            got[r["scope"]][r["level"]] = \
                got[r["scope"]].get(r["level"], 0) + 1
        assert got == expect, bounded


def test_scoped_fastpaths_match_distributed_loops(spark):
    """25 seeded random scoped digraphs: every bounded-scope fast path
    (one exchange + per-partition kernel) must return row-for-row the
    same result as its distributed iterative twin — closure pairs, BFS
    levels, integer PageRank, triangle counts, k-core membership are
    all graph properties, independent of the physical strategy."""
    import random

    from propertygraph_spark.ops.graph import (
        betweenness_int, bfs_levels, closeness_int, clustering_coefficient,
        dag_layers, dominator_tree, eccentricity_int, kcore_nodes,
        label_propagation, pagerank_int, strongly_connected_components,
        transitive_closure, triangle_count, wl_fingerprints)
    rng = random.Random(42)
    rows = []
    for g in range(25):
        n = rng.randint(2, 14)
        es = {(rng.randint(0, n - 1), rng.randint(0, n - 1))
              for _ in range(rng.randint(1, 3 * n))}
        rows += [(f"g{g}", a, b) for a, b in es]
    df = spark.createDataFrame(rows, "scope string, src long, dst long")
    for fn in (transitive_closure, bfs_levels, pagerank_int,
               triangle_count, kcore_nodes, label_propagation,
               strongly_connected_components, dominator_tree, dag_layers,
               clustering_coefficient, wl_fingerprints, closeness_int,
               betweenness_int, eccentricity_int):
        fast = sorted(tuple(r) for r in fn(df, scope="scope").collect())
        slow = sorted(tuple(r) for r in
                      fn(df, scope="scope", bounded_scopes=False).collect())
        assert fast and fast == slow, fn.__name__


def test_scoped_fastpath_accumulates_across_arrow_batches(spark):
    """A scope whose edge list straddles Arrow batch boundaries must be
    computed on its FULL subgraph: force 4-row Arrow batches so one
    40-edge path graph arrives in ~10 separate batches of the same
    partition, and assert closure and CC match the distributed twins
    (batch-local evaluation would see 4-edge fragments and lose all
    long-range reachability)."""
    from propertygraph_spark.ops.graph import (connected_components,
                                               transitive_closure)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        rows = [("p", i, i + 1) for i in range(40)]       # path 0->40
        rows += [("q", 0, 1), ("q", 2, 3)]                # 2 components
        df = (spark.createDataFrame(rows, "scope string, src long, dst long")
              .coalesce(1))
        for fn in (transitive_closure, connected_components):
            fast = sorted(tuple(r) for r in fn(df, scope="scope").collect())
            # max_iter only affects the distributed loop (the fast path
            # always reaches the fixpoint); 40-edge path needs 40 rounds
            slow = sorted(tuple(r) for r in
                          fn(df, scope="scope", max_iter=50,
                             bounded_scopes=False).collect())
            assert fast == slow, fn.__name__
        # closure of the 41-node path alone is 41*40/2 = 820 pairs
        n_p = sum(1 for r in fast if r[0] == "p")  # fast == CC rows here
        assert n_p == 41
    finally:
        spark.conf.set(key, old)


def test_salient_terms_matches_pandas_replay(spark):
    """Seeded random corpus: the distributed tf-idf top-k must equal an
    independent pandas/python replay of the integer scoring."""
    import random

    from propertygraph_spark.ops.text import salient_terms
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 40))))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # host replay
    tf: dict = {}
    for i, txt in rows:
        for t in txt.split():
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df_: dict = {}
    for (_i, t) in tf:
        df_[t] = df_.get(t, 0) + 1
    n = len(rows)
    want = {}
    for i, _txt in rows:
        scored = sorted(
            ((tf[(d, t)] * ((n * 1_000_000) // df_[t]), t)
             for (d, t) in tf if d == i),
            key=lambda s: (-s[0], s[1]))[:5]
        want[i] = [(rk + 1, t, sc) for rk, (sc, t) in enumerate(scored)]
    got: dict = {}
    for r in salient_terms(docs, k=5).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rk"], r["token"], r["score"]))
    assert got == want


def test_lm_fluency_matches_python_replay(spark):
    """Seeded random corpus: the distributed bigram-LM fluency score
    (add-one smoothing, doc_id%%3 held-in model slice, integer ppm
    arithmetic) must equal an independent python replay; short docs
    keep a 0/0 row."""
    import random

    from propertygraph_spark.ops.text import lm_bigram_fluency
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 25))))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # host replay of the model + score
    c1: dict = {}
    c2: dict = {}
    model_vocab = set()
    for i, txt in rows:
        toks = txt.split()
        if i % 3 == 0:
            for t in toks:
                c1[t] = c1.get(t, 0) + 1
                model_vocab.add(t)
            for a, b in zip(toks, toks[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(model_vocab)
    want = {}
    for i, txt in rows:
        toks = txt.split()
        ps = [(c2.get((a, b), 0) + 1) * 1_000_000 // (c1.get(a, 0) + v)
              for a, b in zip(toks, toks[1:])]
        want[i] = ((len(ps), sum(ps) // len(ps)) if ps else (0, 0))
    got = {r["doc_id"]: (r["n_bigrams"], r["fluency_ppm"])
           for r in lm_bigram_fluency(docs, model_mod=3).collect()}
    assert got == want
    assert any(nb == 0 for nb, _f in want.values())  # short docs present


def test_bfs_levels_empty_input_is_empty(spark):
    from propertygraph_spark.ops.graph import (bfs_levels, kcore_nodes,
                                               pagerank_int,
                                               transitive_closure,
                                               triangle_count)
    empty = spark.createDataFrame([], "src long, dst long")
    assert bfs_levels(empty).collect() == []
    empty_s = spark.createDataFrame([], "scope string, src long, dst long")
    # every scoped op, both strategies, degrades to an empty result
    for fn in (bfs_levels, transitive_closure, pagerank_int,
               triangle_count, kcore_nodes):
        assert fn(empty_s, scope="scope").collect() == []
        assert fn(empty_s, scope="scope",
                  bounded_scopes=False).collect() == []


def test_ivf_ops_empty_corpus(spark):
    """An empty corpus/partition must yield an empty result, not a
    numpy axis error from the 0-seed quantizer (the full sweep lives in
    scripts/empty_corpus_probe.py)."""
    from propertygraph_spark.ops.similarity import ann_ivf_topk, ivf_assign
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ivf_assign(empty).collect() == []
    assert ann_ivf_topk(empty).collect() == []
    assert ann_ivf_topk(empty, nprobe=2).collect() == []


def test_connected_components_random_graphs_match_host(spark):
    """15 seeded random scoped graphs: the distributed min-label CC must
    match the pure-Python union-find replay — component count AND the
    min-id labeling (every node's component == min node id reachable)."""
    import random

    from propertygraph_spark.ops.graph import connected_components
    from propertygraph_spark.ops.kgdocs import _pdg_components
    rng = random.Random(11)
    rows, expect = [], {}
    for g in range(15):
        n = rng.randint(2, 14)
        edges = {(rng.randint(0, n - 1), rng.randint(0, n - 1))
                 for _ in range(rng.randint(1, 2 * n))}
        scope = f"g{g}"
        rows += [(scope, a, b) for a, b in edges]
        triples = [{"pred": "pdg_data", "method_id": scope,
                    "subj": a, "obj": b} for a, b in edges]
        expect[scope] = _pdg_components(triples)
        # host min-label replay for exact labeling
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        label = {}
        for s in adj:
            if s in label:
                continue
            comp, stack = [s], [s]
            seen = {s}
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        comp.append(y)
                        stack.append(y)
            m = min(comp)
            for x in comp:
                label[x] = m
        expect[(scope, "labels")] = label
    df = spark.createDataFrame(rows, "scope string, src long, dst long")
    # both physical strategies must produce the identical labeling:
    # the scoped union-find fast path (default) and the distributed
    # min-label + pointer-jump loop (bounded_scopes=False)
    for bounded in (True, False):
        out = connected_components(df, scope="scope",
                                   bounded_scopes=bounded).collect()
        got_labels: dict = {}
        got_counts: dict = {}
        got_largest: dict = {}
        sizes: dict = {}
        for r in out:
            got_labels.setdefault(r["scope"], {})[r["node"]] = r["component"]
            sizes.setdefault((r["scope"], r["component"]), 0)
            sizes[(r["scope"], r["component"])] += 1
        for (scope, _c), sz in sizes.items():
            got_counts[scope] = got_counts.get(scope, 0) + 1
            got_largest[scope] = max(got_largest.get(scope, 0), sz)
        for g in range(15):
            scope = f"g{g}"
            assert got_labels[scope] == expect[(scope, "labels")], \
                (bounded, scope)
            assert (got_counts[scope], got_largest[scope]) == \
                expect[scope], (bounded, scope)


def test_connected_components_empty_and_plan(spark):
    from propertygraph_spark.ops.graph import connected_components
    empty = spark.createDataFrame([], "scope string, src long, dst long")
    assert connected_components(empty, scope="scope").collect() == []
    assert connected_components(empty, scope="scope",
                                bounded_scopes=False).collect() == []
    import contextlib, io
    edges = spark.createDataFrame([("m", 1, 2), ("m", 2, 3)],
                                  "scope string, src long, dst long")
    for kw in ({}, {"bounded_scopes": False, "max_iter": 2}):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            connected_components(edges, scope="scope", **kw) \
                .explain("formatted")
        p = buf.getvalue()
        assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    # the scoped fast path is ONE exchange (scope hash) + a map stage —
    # no iterative barrier rounds
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        connected_components(edges, scope="scope").explain("formatted")
    p = buf.getvalue()
    assert "MapInPandas" in p
    assert p.count("+- Exchange") == 1, p


def test_json_props_malformed_payload_yields_null_not_crash(spark):
    """Schema-on-read must degrade per-row: malformed/missing JSON ->
    NULL k (excluded from sum/min/max, counted in n_events)."""
    import os, tempfile

    from propertygraph_spark.ops import relational
    rows = [(1, "2024-01-01 00:00:00", 1, "view", 1.0, '{"k": 3}'),
            (2, "2024-01-01 00:01:00", 1, "view", 1.0, "not json {"),
            (3, "2024-01-01 00:02:00", 1, "view", 1.0, None),
            (4, "2024-01-01 00:03:00", 1, "view", 1.0, '{"other": 9}')]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
              " value double, props string") \
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = relational.events_json_props(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_events"], r["n_distinct_k"], r["sum_k"],
            r["min_k"], r["max_k"]) == (4, 1, 3, 3, 3)


def test_jsonl_source_equivalent_to_parquet(spark):
    """Source-format agnosticism: the same documents served as JSON
    Lines (explicit schema — no inference job at scale) produce
    bit-identical operator output to the parquet path."""
    import os, tempfile

    from propertygraph_spark.ops.text import quality_score, token_stats
    pq = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = tempfile.mkdtemp()
    jl = os.path.join(d, "documents.jsonl")
    pq.write.mode("overwrite").json(jl)
    js = spark.read.schema(pq.schema).json(jl)
    for op in (token_stats, quality_score):
        a = sorted(map(tuple, op(pq).collect()))
        b = sorted(map(tuple, op(js).collect()))
        assert a == b, op.__name__


def test_semantic_dedup_clusters_reps_and_singletons(emb):
    """SemDeDup clusters: vectors 0 and 1 (cos ~ 0.995) merge into one
    component with min-id 0 as keeper; every other vector is its own
    singleton keeper. Exactly one keeper per cluster_id."""
    out = {r["vec_id"]: (r["cluster_id"], r["is_keeper"]) for r in
           similarity.semantic_dedup_clusters(
               emb, threshold_pm=900_000).collect()}
    assert len(out) == 5                      # every vector gets a row
    assert out[0] == (0, 1)
    assert out[1] == (0, 0)                   # absorbed, not a keeper
    for v in (2, 3, 4):
        assert out[v] == (v, 1)
    clusters: dict = {}
    for v, (c, k) in out.items():
        clusters.setdefault(c, []).append(k)
    assert all(sum(ks) == 1 for ks in clusters.values())


def test_ann_ivfpq_matches_bruteforce_on_separated_clusters(spark):
    """IVF-PQ ADC ordering agrees with exact cosine ranking when
    clusters are well separated: each vector's top-1 neighbor must be
    its own clone (ADC distance ~ 0), never a cross-cluster vector."""
    rows = []
    for g in range(4):                         # 4 tight groups of 6
        base = [0.0] * 64
        base[g * 16] = 1.0
        base[g * 16 + 1] = 0.5
        for i in range(6):
            v = list(base)
            v[g * 16 + 2] = 0.01 * i           # tiny within-group jitter
            rows.append((g * 6 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.ann_ivfpq_topk(df, k=1, n_cells=4).collect()
    assert len(out) > 0
    for r in out:
        assert r["vec_id"] // 6 == r["neighbor_id"] // 6, r


def test_events_latest_state_picks_latest_with_id_tiebreak(spark, events_dir):
    """Latest-wins compaction: last event per (user, type) by event time,
    event_id breaking exact-timestamp ties (user 3 has two events at the
    SAME second — only the larger event_id may win its type group)."""
    from propertygraph_spark.ops.relational import events_latest_state
    got = {(r["user_id"], r["event_type"]):
           (r["last_event_id"], r["last_sec"], r["last_value_x1000"],
            r["n_events"])
           for r in events_latest_state(spark, events_dir).collect()}
    base = 1704067200  # 2024-01-01 00:00:00 UTC epoch seconds
    assert got == {
        (1, "view"): (1, base + 50, 1000, 1),
        (1, "click"): (2, base + 130, 2000, 1),
        (2, "view"): (3, base, 3000, 1),
        (2, "click"): (4, base + 30, 4000, 1),
        (3, "click"): (6, base + 300, 5000, 1),
        (3, "view"): (7, base + 300, 6000, 1),
    }


def test_keep_best_duplicate_prefers_quality_then_min_id(spark):
    """Quality-aware representative: within a near-dup cluster the
    HIGHEST quality_score wins even when a lower doc_id exists (doc 1 is
    the degraded variant), and quality ties fall back to the smallest
    doc_id (4 beats 7). Singletons are their own best."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base + " extra"), (4, base), (7, base),
            (3, "totally different content entirely unrelated words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["cluster_id"], r["quality_score"], r["is_best"])
           for r in dedup.keep_best_duplicate(docs).collect()}
    # 1, 4, 7 co-cluster under MinHash-LSH (deterministic md5 hashing)
    assert out[1][0] == out[4][0] == out[7][0]
    assert out[1][1] < out[4][1] == out[7][1]
    assert (out[1][2], out[4][2], out[7][2]) == (0, 1, 0)
    assert out[3] == (3, out[3][1], 1)

def test_scc_and_dominators_match_brute_force(spark):
    """12 seeded random scoped digraphs: SCC labels must equal
    brute-force mutual reachability (DFS reach sets, per-node), and
    immediate dominators must equal the cut-vertex definition (d
    dominates v iff v is unreachable from the root once d is removed) —
    both independent of the operators' Tarjan / intersection-dataflow
    internals."""
    import random

    from propertygraph_spark.ops.graph import (dominator_tree,
                                               strongly_connected_components)
    rng = random.Random(7)
    rows, graphs = [], {}
    for g in range(12):
        n = rng.randint(2, 10)
        es = {(rng.randint(0, n - 1), rng.randint(0, n - 1))
              for _ in range(rng.randint(1, 3 * n))}
        graphs[f"g{g}"] = es
        rows += [(f"g{g}", a, b) for a, b in es]
    df = spark.createDataFrame(rows, "scope string, src long, dst long")

    def reach_sets(es):
        adj: dict = {}
        nodes = {x for e in es for x in e}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
        out = {}
        for s in nodes:
            seen: set = set()
            stack = [s]
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            out[s] = seen
        return nodes, adj, out

    got_scc = sorted(map(tuple, strongly_connected_components(
        df, scope="scope").collect()))
    for g, es in graphs.items():
        nodes, _, reach = reach_sets(es)
        exp = sorted(
            (n, min({m for m in nodes
                     if m in reach[n] and n in reach[m]} | {n}))
            for n in nodes)
        assert [(n, s) for sc, n, s in got_scc if sc == g] == exp, g

    got_dom = sorted(map(tuple, dominator_tree(df, scope="scope").collect()))
    for g, es in graphs.items():
        nodes, adj, _ = reach_sets(es)
        root = min(nodes)

        def reach_without(cut):
            if cut == root:
                return set()
            seen = {root}
            stack = [root]
            while stack:
                u = stack.pop()
                for v in adj.get(u, ()):
                    if v != cut and v not in seen:
                        seen.add(v)
                        stack.append(v)
            return seen

        full = reach_without(None)
        doms = {v: {d for d in full if d == v or v not in reach_without(d)}
                for v in full}
        exp = sorted(
            (v, max(doms[v] - {v}, key=lambda d: (len(doms[d]), d)))
            for v in full if v != root)
        assert [(n, i) for sc, n, i in got_dom if sc == g] == exp, g

def test_gopher_repetition_matches_python_replay(spark):
    """gopher_repetition vs a dict-based host replay of the published
    definitions (count x joined-gram-length coverage, per-mille of
    text length, capped at 1000) on hand-built edge cases: empty text,
    fewer tokens than n, total repetition, and a duplicated 5/10-gram."""
    from propertygraph_spark.ops.text import gopher_repetition
    import random
    texts = [
        "",                                   # no tokens at all
        "one",                                # below every n
        "a a a",                              # overlap > text length -> cap
        "x y x y x y x y",                    # dominant 2-gram
        "w1 w2 w3 w4 w5 q w1 w2 w3 w4 w5",    # duplicated 5-gram
        ("p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 z "
         "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),   # duplicated 10-gram
        "alpha beta gamma delta",             # all grams unique
    ]
    # 50 seeded random docs over a tiny vocab (repetition guaranteed)
    rng = random.Random(11)
    texts += [" ".join(rng.choice("aa b ccc dd e".split())
                       for _ in range(rng.randint(0, 40)))
              for _ in range(50)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}

    def replay(text):
        toks = [t for t in text.split() if t]
        nc = len(text)
        out = {}
        for n, kind in ((2, "top"), (3, "top"), (4, "top"),
                        (5, "dup"), (10, "dup")):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            cnt: dict = {}
            for g in grams:
                cnt[g] = cnt.get(g, 0) + 1
            if kind == "top":
                cov = max([c * len(g) for g, c in cnt.items()] or [0])
            else:
                cov = sum(c * len(g) for g, c in cnt.items() if c >= 2)
            key = f"{kind}{n}_char_pm"
            out[key] = min(1000, cov * 1000 // nc) if nc > 0 else 0
        return out

    for i, t in enumerate(texts):
        exp = replay(t)
        for k, v in exp.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    # the cap case really hits the cap; the dup cases really fire
    assert got[2]["top2_char_pm"] == 1000
    assert got[4]["dup5_char_pm"] > 0 and got[6]["dup5_char_pm"] == 0


def test_events_anomaly_flags_spike_not_noise(spark):
    """A flat minutely series with one spike: the spike minute (and
    only it) is flagged once the trailing window holds >= 10 minutes;
    early minutes (n_prior < 10) are never flagged, whatever their
    variance."""
    import datetime

    from propertygraph_spark.ops.relational import events_anomaly
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for m in range(40):
        n = 100 if m != 25 else 500          # spike at minute 25
        for _ in range(n):
            rows.append((eid, base + datetime.timedelta(minutes=m, seconds=1),
                         7, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["minute"].minute + 60 * r["minute"].hour: r.asDict()
               for r in events_anomaly(spark, d).collect()}
    assert all(not out[m]["is_anomaly"] for m in range(40) if m != 25)
    assert out[25]["is_anomaly"] and out[25]["n_prior"] >= 10
    # a constant series has zero variance: the z-test right side is 0,
    # so ANY deviation flags — and no deviation never does
    assert out[39]["n_prior"] == 30

def test_bloom_semijoin_no_false_negatives_and_counts_fps(spark):
    """Bloom semantics on a tiny synthetic orders/customer pair: every
    true key passes (no false negatives, by construction), accuracy
    counters are internally consistent, and with a deliberately tiny
    filter (m=16 bits, 200 probe keys) false positives actually occur
    and are counted."""
    import tempfile

    from propertygraph_spark.ops.relational import bloom_semijoin
    orders = spark.createDataFrame(
        [(i, i % 25) for i in range(100)], "o_orderkey long, o_custkey long")
    cust = spark.createDataFrame(
        [(i,) for i in range(200)], "c_custkey long")
    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(f"{d}/orders.parquet")
        cust.write.parquet(f"{d}/customer.parquet")
        row = bloom_semijoin(spark, d).collect()[0]
        tiny = bloom_semijoin(spark, d, m_bits=16).collect()[0]
    assert row["n_probed"] == 200 and row["n_true_match"] == 25
    # no false negatives: pass >= true, and pass - fp == true exactly
    assert row["n_bloom_pass"] - row["n_false_pos"] == row["n_true_match"]
    assert row["n_bloom_pass"] >= row["n_true_match"]
    # 25 keys x 3 hashes into 16 bits saturates the filter: fps certain
    assert tiny["n_false_pos"] > row["n_false_pos"]
    assert tiny["n_bloom_pass"] - tiny["n_false_pos"] == 25

def test_media_text_alignment_matches_host_replay(spark):
    """media_text_alignment == a hashlib+math host replay of both
    towers (md5 payload bytes x int8-quantized embedding prefix) on a
    tiny table, including the all-zero embedding (scale 0 -> score 0)."""
    import hashlib
    import math

    from propertygraph_spark.ops.multimodal import media_text_alignment
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma"), (2, "delta eps")],
        "doc_id long, text string")
    embs = [
        (0, [0.5, -1.25, 0.75, 0.1, -0.1, 0.0, 2.0, -2.0]),
        (1, [0.0] * 8),                       # zero vector -> scale 0
        (2, [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0]),
    ]
    emb = spark.createDataFrame(embs, "vec_id long, embedding array<float>")
    got = {r["doc_id"]: (r["media_kind"], r["align_x"])
           for r in media_text_alignment(docs, emb).collect()}

    kinds = {0: "image", 1: "audio", 2: "video"}
    for doc_id, text in ((0, "alpha beta"), (1, "gamma"), (2, "delta eps")):
        fbytes = hashlib.md5(text.encode()).digest()[:8]
        e = [float(v) for v in dict(embs)[doc_id]]
        absmax = max(abs(v) for v in e)
        scale = 127.0 / absmax if absmax > 0 else 0.0
        codes = [math.floor(v * scale + 0.5) for v in e]
        want = sum(b * c for b, c in zip(fbytes, codes))
        assert got[doc_id] == (kinds[doc_id % 3], want), doc_id
    assert got[1][1] == 0


def test_gopher_quality_rules(spark):
    """gopher_quality vs the published rule set on crafted boundary
    docs: each rule violated in isolation, plus exact boundary values
    (50 words, mean length 3 and 10, 10% symbols, 80% alpha)."""
    from propertygraph_spark.ops.text import gopher_quality

    def words(n, w="the"):
        return " ".join([w] * n)

    texts = {
        0: words(50),                          # all rules pass
        1: words(49),                          # too short
        2: words(50, "ab") + " the the",       # mean len < 3 (52 words)
        3: words(50, "abcdefghijk"),           # mean len 11 > 10, no stops
        4: words(90) + " " + words(10, "the#"),     # 100 words, 10 syms: pass
        5: words(89) + " " + words(11, "the#"),     # 100 words, 11 syms: fail
        6: " ".join(["the"] * 40 + ["123"] * 10),   # alpha 40/50 = 0.8: pass
        7: " ".join(["the"] * 39 + ["123"] * 11),   # alpha < 0.8: fail
        8: "the " + words(49, "word"),         # 1 stopword hit: fail
        9: "",                                 # empty
    }
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    assert got[0]["keep"] == 1
    assert got[1]["keep"] == 0 and got[1]["n_words"] == 49
    assert got[2]["keep"] == 0 and got[2]["sum_word_len"] < \
        3 * got[2]["n_words"]
    assert got[3]["keep"] == 0
    assert got[4]["keep"] == 1 and got[4]["symbol_hits"] == 10
    assert got[5]["keep"] == 0 and got[5]["symbol_hits"] == 11
    assert got[6]["keep"] == 1 and got[6]["alpha_words"] == 40
    assert got[7]["keep"] == 0
    assert got[8]["keep"] == 0 and got[8]["stopword_hits"] == 1
    assert got[9]["keep"] == 0 and got[9]["n_words"] == 0
    # '...' counts as a symbol too, and boundary mean length 10 passes
    df2 = spark.createDataFrame(
        [(0, " ".join(["abcdefghij"] * 48 + ["the", "the"]) + " ..."),],
        "doc_id long, text string")
    r = gopher_quality(df2).collect()[0]
    assert r["symbol_hits"] == 1 and r["keep"] == 1, r.asDict()


def test_event_user_hll_estimate_quality(spark, tmp_path):
    """The 64-register HLL must land within the sketch's theoretical
    error band (~1.04/sqrt(64) ~ 13 % sigma; assert 3 sigma) on a
    seeded 1000-distinct-user group, and its n_regs is bounded by m."""
    import pandas as pd
    from propertygraph_spark.ops.relational import event_user_hll
    rows = [(i, "2024-01-01T00:00:00", i % 1000, "click", 1.0, "{}")
            for i in range(5000)]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    got = event_user_hll(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["exact_distinct"] == 1000
    assert r["n_regs"] <= 64
    assert abs(r["hll_estimate"] - 1000) <= 390, r   # 3 sigma


def test_priority_sample_pps_semantics(spark):
    """priority_sample vs a host replay of the Duffield et al. bottom-k
    rule, plus the PPS property: across md5's natural randomness a
    10x-heavier row family must be sampled markedly more often."""
    import hashlib
    from propertygraph_spark.ops.dataset import priority_sample
    rows = [(i, 1000 if i % 2 == 0 else 100) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [(r["doc_id"], r["weight"], r["priority"])
           for r in priority_sample(df, k=40).collect()]

    def prio(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        return u // w
    exp = sorted(((prio(i, w), i) for i, w in rows))[:40]
    assert [(p, i) for i, _, p in got] == [(p, i) for p, i in exp]
    heavy = sum(1 for _, w, _ in got if w == 1000)
    assert heavy >= 30   # ~10:1 inclusion odds at 10x weight


def test_line_dedup_cut_semantics(spark):
    """Boilerplate lines shared across docs are cut, unique lines and
    within-threshold lines survive in original order, empty lines are
    never dedup candidates, and a fully-boilerplate doc yields ''."""
    from propertygraph_spark.ops.dedup import line_dedup_cut
    docs = [
        (0, "alpha one\nSHARED FOOTER\nbeta two"),
        (1, "gamma three\nSHARED FOOTER"),
        (2, "delta\n\nepsilon\n\nzeta"),       # empty lines untouched
        (3, "SHARED FOOTER"),                  # all-cut doc -> ''
        (4, "unique only here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in line_dedup_cut(df).collect()}
    assert got[0]["n_lines"] == 3 and got[0]["n_cut"] == 1
    assert got[0]["clean_text"] == "alpha one\nbeta two"
    assert got[1]["clean_text"] == "gamma three"
    assert got[2]["n_cut"] == 0 and got[2]["clean_text"] == \
        "delta\n\nepsilon\n\nzeta"
    assert got[3]["n_cut"] == 1 and got[3]["clean_text"] == ""
    assert got[4]["n_cut"] == 0
    # idempotence: re-running on the cleaned output cuts nothing
    clean = spark.createDataFrame(
        [(k, v["clean_text"]) for k, v in got.items()],
        "doc_id long, text string")
    again = {r["doc_id"]: r["n_cut"]
             for r in line_dedup_cut(clean).collect()}
    assert all(v == 0 for v in again.values()), again


def test_zorder_layout_skips_more_chunks(spark):
    """On the sf0.01 events table the z-order layout must let the 2-D
    range predicate skip chunks that the time-major layout has to scan
    (the whole point of Morton clustering), with identical match
    counts, and the Morton key must interleave bits correctly."""
    from propertygraph_spark.ops.relational import zorder_skipping_stats
    got = {r["layout"]: r.asDict()
           for r in zorder_skipping_stats(
               spark, "/root/testdata/sf0.01").collect()}
    z, lin = got["zorder"], got["linear"]
    assert z["rows_matched"] == lin["rows_matched"] > 0
    assert z["n_chunks"] == lin["n_chunks"]
    assert z["chunks_scanned"] < lin["chunks_scanned"], (z, lin)

    # Morton interleave spot check: x=0b101, y=0b011 -> z=0b100111
    def morton(x, y):
        return sum((((x >> i) & 1) << (2 * i + 1))
                   + (((y >> i) & 1) << (2 * i)) for i in range(8))
    assert morton(0b101, 0b011) == 0b100111


def test_dag_layers_brute_force(spark):
    """dag_layers vs a definitional host replay (longest condensation
    path via DFS memo over brute-force mutual-reachability SCCs) on 12
    fresh seeded digraphs including cycles and self-loops."""
    import random
    from functools import lru_cache
    from propertygraph_spark.ops.graph import dag_layers
    rng = random.Random(7)
    rows = []
    graphs = {}
    for g in range(12):
        n = rng.randint(2, 12)
        es = {(rng.randint(0, n - 1), rng.randint(0, n - 1))
              for _ in range(rng.randint(1, 3 * n))}
        graphs[f"g{g}"] = es
        rows += [(f"g{g}", a, b) for a, b in es]
    df = spark.createDataFrame(rows, "scope string, src long, dst long")
    got = sorted(tuple(r) for r in dag_layers(df, scope="scope").collect())

    exp = []
    for name, es in graphs.items():
        nodes = {x for e in es for x in e}
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)

        def reach(s):
            seen, stack = set(), [s]
            while stack:
                x = stack.pop()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            return seen
        r = {v: reach(v) for v in nodes}
        comp = {v: min({m for m in nodes if m in r[v] and v in r[m]} | {v})
                for v in nodes}
        ces = {(comp[a], comp[b]) for a, b in es if comp[a] != comp[b]}
        cpreds = {}
        for a, b in ces:
            cpreds.setdefault(b, set()).add(a)

        @lru_cache(maxsize=None)
        def layer(c):
            return max((layer(p) + 1 for p in cpreds.get(c, ())),
                       default=0)
        exp += [(name, v, layer(comp[v])) for v in nodes]
        layer.cache_clear()
    assert got == sorted(exp)


def test_clustering_coefficient_hand_graph(spark):
    """Triangle + pendant: the three triangle nodes have cc 1 (ppm 1e6,
    except the one that also owns the pendant: deg 3, 1 closed of 3
    pairs -> 333333); the pendant has deg 1 -> 0. Direction and
    multiplicity must not matter."""
    from propertygraph_spark.ops.graph import clustering_coefficient
    rows = [("g", 1, 2), ("g", 2, 3), ("g", 3, 1), ("g", 1, 4),
            ("g", 2, 1), ("g", 2, 2)]   # reverse dup + self loop
    df = spark.createDataFrame(rows, "scope string, src long, dst long")
    for bounded in (True, False):
        got = {r["node"]: r.asDict() for r in clustering_coefficient(
            df, scope="scope", bounded_scopes=bounded).collect()}
        assert got[1]["degree"] == 3 and got[1]["cc_ppm"] == 333333
        assert got[2]["cc_ppm"] == 1_000_000 == got[3]["cc_ppm"]
        assert got[4]["degree"] == 1 and got[4]["cc_ppm"] == 0
        assert got[1]["n_triangles"] == 1 == got[2]["n_triangles"]


def test_wl_signature_isomorphism(spark):
    """Relabeled isomorphic graphs must share a WL signature; a 4-path
    and a 4-star must not. Both physical strategies."""
    from propertygraph_spark.ops.graph import wl_graph_signature
    rows = [
        # diamond 0->1, 0->2, 1->3, 2->3
        ("d1", 0, 1), ("d1", 0, 2), ("d1", 1, 3), ("d1", 2, 3),
        # same shape, permuted ids
        ("d2", 9, 5), ("d2", 9, 7), ("d2", 5, 2), ("d2", 7, 2),
        # path 0->1->2->3
        ("p", 0, 1), ("p", 1, 2), ("p", 2, 3),
        # star 0->{1,2,3}
        ("s", 0, 1), ("s", 0, 2), ("s", 0, 3),
    ]
    df = spark.createDataFrame(rows, "scope string, src long, dst long")
    for bounded in (True, False):
        sig = {r["scope"]: r["signature"] for r in wl_graph_signature(
            df, scope="scope", bounded_scopes=bounded).collect()}
        assert sig["d1"] == sig["d2"]
        assert len({sig["d1"], sig["p"], sig["s"]}) == 3


def test_quantile_sketch_bounds_exact_percentiles(spark):
    """The 256-bucket sketch quantile is a lower bound on the exact
    percentile and within one bucket width of it, per event type."""
    from propertygraph_spark.ops.relational import (
        event_value_percentiles, event_value_quantile_sketch)
    sf = "/root/testdata/sf0.01"
    est = {r["event_type"]: r.asDict()
           for r in event_value_quantile_sketch(spark, sf).collect()}
    exact = {r["event_type"]: r.asDict()
             for r in event_value_percentiles(spark, sf).collect()}
    for et, e in est.items():
        ex = exact[et]
        # one bucket width of the type's value range (x1000 domain)
        lo_hi = spark.read.parquet(f"{sf}/events.parquet") \
            .filter(F.col("event_type") == et) \
            .agg(F.min(F.round(F.col("value") * 1000)).alias("lo"),
                 F.max(F.round(F.col("value") * 1000)).alias("hi")) \
            .collect()[0]
        width = (int(lo_hi["hi"]) - int(lo_hi["lo"]) + 1) // 256 + 1
        for q in ("p50", "p90", "p99"):
            est_v = e[f"{q}_est_x1000"]
            ex_v = ex[f"{q}_milli"]
            # guaranteed lower bound on the interpolated exact quantile
            # (+1 absorbs the round-vs-floor milli scaling difference)
            assert est_v <= ex_v + 1, (et, q, est_v, ex_v)
            # within a bucket of the floor order statistic; the
            # interpolation can add at most the local inter-sample gap,
            # bounded here by a small multiple of the bucket width
            assert ex_v - est_v <= 3 * width, (et, q, est_v, ex_v, width)


def test_group_split_never_splits_a_group(spark):
    """Every group lands entirely in one split (the leakage guard), the
    assignment is a pure function of the group key (stable across row
    order / partitioning), and all three splits are populated on the
    sf0.01 corpus sources."""
    from propertygraph_spark.ops.dataset import group_split
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = group_split(docs, val_pm=300, test_pm=300)
    spans = (out.groupBy("group_key")
             .agg(F.countDistinct("split").alias("n_splits")).collect())
    assert spans and all(r["n_splits"] == 1 for r in spans)
    repart = group_split(docs.repartition(7, "doc_id"),
                         val_pm=300, test_pm=300)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, repart.collect()))


def test_pmi_pairs_matches_host_replay(spark):
    """pmi_pairs vs a dict-based replay of the exp(PMI) odds-ratio
    ordering on a seeded corpus over a tiny vocabulary; a glued
    collocation pair must outrank independent fillers."""
    import random
    from collections import Counter
    from propertygraph_spark.ops.text import pmi_pairs
    rng = random.Random(3)
    texts = []
    for _ in range(40):
        words = []
        for _ in range(rng.randint(5, 25)):
            if rng.random() < 0.3:
                words += ["new", "york"]       # glued collocation
            else:
                words.append(rng.choice("alpha beta gamma delta".split()))
        texts.append(" ".join(words))
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = [(r["a"], r["b"], r["c_xy"], r["ratio_ppm"])
           for r in pmi_pairs(df, min_count=3, top_n=10).collect()]

    uni: Counter = Counter()
    pairs: Counter = Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        for x, y in zip(ws, ws[1:]):
            pairs[(min(x, y), max(x, y))] += 1
    n = sum(uni.values())
    exp = [(a, b, c, (1_000_000 * c * n) // (uni[a] * uni[b]))
           for (a, b), c in pairs.items() if c >= 3]
    exp = sorted(exp, key=lambda r: (-r[3], r[0], r[1]))[:10]
    assert got == exp
    assert got[0][:2] == ("new", "york")


def test_events_funnel_ordered_semantics(spark, tmp_path):
    """Crafted users: completes in order / right events wrong order /
    stops mid-funnel / same-second tie counts. Monotone step counts and
    exact integer conversion."""
    import pandas as pd
    from propertygraph_spark.ops.relational import events_funnel_ordered
    t0 = pd.Timestamp("2024-01-01T00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # u1: view -> click -> purchase, in order
        (1, t0, 1, "view"), (2, t0 + m, 1, "click"),
        (3, t0 + 2 * m, 1, "purchase"),
        # u2: purchase BEFORE view/click -> never reaches step 3;
        # click after view -> reaches step 2
        (4, t0, 2, "purchase"), (5, t0 + m, 2, "view"),
        (6, t0 + 2 * m, 2, "click"),
        # u3: view only
        (7, t0, 3, "view"),
        # u4: same-second view+click+purchase -> ties count
        (8, t0, 4, "view"), (9, t0, 4, "click"), (10, t0, 4, "purchase"),
        # u5: click+purchase but NO view -> not in funnel at all
        (11, t0, 5, "click"), (12, t0 + m, 5, "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    got = {r["step_idx"]: r.asDict()
           for r in events_funnel_ordered(spark, str(tmp_path)).collect()}
    assert got[1]["n_users"] == 4            # u1 u2 u3 u4
    assert got[2]["n_users"] == 3            # u1 u2 u4
    assert got[3]["n_users"] == 2            # u1 u4
    assert got[2]["conversion_pm"] == 750000
    assert got[3]["conversion_pm"] == 500000


def test_events_mad_outliers_semantics(spark, tmp_path):
    """Hampel rule on a crafted group: median 10.0, MAD 1.0 -> the two
    20.0 spikes are the only |v - med| > 3*MAD rows; the exact-integer
    x2/x4 encoding carries the half-integer medians losslessly."""
    import pandas as pd
    from propertygraph_spark.ops.relational import events_mad_outliers
    vals = [9.0, 9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 20.0, 20.0]
    pdf = pd.DataFrame({
        "event_id": range(len(vals)),
        "ts": pd.to_datetime(["2024-01-01"] * len(vals))
              .astype("datetime64[us]"),
        "user_id": range(len(vals)),
        "event_type": ["m"] * len(vals),
        "value": vals, "props": ["{}"] * len(vals)})
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    r = events_mad_outliers(spark, str(tmp_path)).collect()[0].asDict()
    assert r["median_milli_x2"] == 20000       # median 10.0
    assert r["mad_milli_x4"] == 4000           # MAD 1.0 (x1000 x4)
    assert r["n_outliers"] == 2 and r["n_events"] == 9


def test_source_length_drift_semantics(spark):
    """A source whose lengths mirror the corpus drifts ~0; a source
    concentrated in one bucket drifts high; values match a host replay
    of the cross-multiplied TVD."""
    from collections import Counter
    from propertygraph_spark.ops.text import source_length_drift
    docs = []
    i = 0
    # two balanced sources with identical length profiles...
    for src in ("a", "b"):
        for ln in (10, 50, 100, 200) * 5:
            docs.append((i, "x" * ln, src))
            i += 1
    # ...and one source pinned to a single bucket
    for _ in range(20):
        docs.append((i, "x" * 10, "c"))
        i += 1
    df = spark.createDataFrame(docs, "doc_id long, text string, "
                                     "source string")
    got = {r["source"]: r["tvd_ppm"]
           for r in source_length_drift(df).collect()}

    per = Counter((s, min(7, len(t) // 32)) for _, t, s in docs)
    n_src = Counter(s for _, _, s in docs)
    n_b = Counter(b for (_, b), c in per.items() for _ in range(c))
    nt = len(docs)
    for s in ("a", "b", "c"):
        tvd = sum(abs(per.get((s, b), 0) * nt - n_b[b] * n_src[s])
                  for b in range(8))
        assert got[s] == (500000 * tvd) // (n_src[s] * nt), s
    assert got["c"] > got["a"] == got["b"]


def test_cyclomatic_and_api_pagerank_small_corpus(spark):
    """Both r5s5 KG rollups on an 8-doc corpus (each template twice):
    cyclomatic stats double the per-doc frozen constants (max stays),
    and the distributed-loop PageRank over the corpus call graph is
    bit-identical to the host integer replay inlined in the oracle."""
    import re
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_CFG_CYCLOMATIC,
                                                api_pagerank,
                                                api_pagerank_oracle_sql,
                                                cyclomatic_by_template)
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_methods"], r["sum_cc"], r["max_cc"])
           for r in cyclomatic_by_template(docs).collect()}
    assert got == {tpl: (2 * n, 2 * s, mx)
                   for tpl, (n, s, mx) in TEMPLATE_CFG_CYCLOMATIC.items()}
    expected = {n: int(r) for n, r in
                re.findall(r"\('([^']+)', (\d+)\)",
                           api_pagerank_oracle_sql())}
    ranks = {r["node"]: r["rank_mu"] for r in api_pagerank(docs).collect()}
    assert ranks == expected


def test_ngram_novelty_first_occurrence(spark):
    """novel_ppm = share of a doc's distinct 8-grams first seen (by min
    doc_id) in that doc; shorter-than-k docs emit no row."""
    from propertygraph_spark.ops.text import ngram_novelty
    rows = [(0, "a b c d e f g h i j"),     # 3 shingles, all first
            (1, "a b c d e f g h i j k"),   # 4 shingles, 3 seen in doc 0
            (2, "z y x w v u t s r q"),     # all first
            (3, "short text")]              # < 8 tokens -> no row
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in ngram_novelty(df).collect())
    assert got == [(0, 3, 3, 1000000), (1, 4, 1, 250000),
                   (2, 3, 3, 1000000)]


def test_language_mixture_semantics(spark):
    """Line-level labels: pure doc -> gini 0; 1-of-2 German lines ->
    500000; fr-majority with an unknown line -> 444444 and main 'fr';
    empty doc -> (0, 'und', 0); en beats de on ties (marker-list
    order)."""
    from propertygraph_spark.ops.text import language_mixture
    rows = [(0, "the and of to a in\nder und die das ist"),
            (1, "the and of to a in"),
            (2, ""),
            (3, "xx yy zz\nle la les et\nle la les et est")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["main_lang"], r["gini_ppm"])
           for r in language_mixture(df).collect()}
    assert got == {0: (2, "en", 500000), 1: (1, "en", 0),
                   2: (0, "und", 0), 3: (3, "fr", 444444)}


def test_containment_pairs_flags_prefix_quote(spark):
    """A token-prefix half scores containment 1.0 against its source
    (where Jaccard would be ~|small|/|large|); unrelated docs produce
    no pair; shingles repeated in more than df_cap docs are stop
    shingles and generate no candidates."""
    from propertygraph_spark.ops.dedup import containment_pairs
    long_doc = " ".join(f"w{i}" for i in range(30))
    short_doc = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)],
        "doc_id long, text string")
    got = [tuple(r) for r in containment_pairs(df).collect()]
    assert got == [(1, 2, 8, 26, 8, 1000000)]
    # hot-shingle cap: 70 docs sharing ONE boilerplate 5-gram (df 70 >
    # 64) and nothing else in common -> the stop shingle is dropped,
    # zero pairs
    boiler = "h0 h1 h2 h3 h4"
    hot = [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e")
           for i in range(70)]
    df2 = spark.createDataFrame(hot, "doc_id long, text string")
    assert containment_pairs(df2).count() == 0


def test_table_profile_semantics(spark):
    """ANALYZE twin invariants at sf0.001: one row per column, a shared
    row count, canonical-encoding min/max ordering, and the m=64 HLL
    estimate within the sketch's error band on the highest-cardinality
    column (event_id is unique per row)."""
    from propertygraph_spark.ops.relational import table_profile
    sf = "/root/testdata/sf0.001"
    rows = {r["col"]: r for r in table_profile(spark, sf).collect()}
    assert set(rows) == {"event_id", "ts", "user_id", "event_type",
                         "value", "props"}
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1
    (n_rows,) = n
    for r in rows.values():
        assert 0 <= r["null_ppm"] <= 1_000_000
        assert r["n_null"] <= n_rows
        if r["n_null"] < n_rows:
            assert r["min_val"] <= r["max_val"]
    ev = rows["event_id"]
    assert ev["n_null"] == 0
    # unique ids: estimate within the ~13% HLL band (3 sigma ~ 40%)
    assert abs(ev["hll_distinct"] - n_rows) <= 0.4 * n_rows
    # bounded-cardinality column: estimate well below the row count
    assert rows["event_type"]["hll_distinct"] < n_rows // 10


def test_kmeans_cells_separates_blobs(spark):
    """Integer Lloyd's on two tight, well-separated blobs: seeds 6 and 9
    (md5 order) land one per blob, two rounds converge, and the exact
    integer inertia is the known within-blob sum (centroid = truncated
    mean 10001 / -10001 milli; dist^2 = 1 + 0 + 1 = 2 per blob)."""
    from propertygraph_spark.ops.similarity import kmeans_cells
    # blob A: vec_ids 6,1,2 near +10 on dim0; blob B: 9,3,4 near -10
    rows = [(6, [10.000, 0.0]), (1, [10.001, 0.0]), (2, [10.002, 0.0]),
            (9, [-10.000, 0.0]), (3, [-10.001, 0.0]), (4, [-10.002, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(tuple(r) for r in kmeans_cells(df, k=2, iters=2).collect())
    assert got == [(0, 3, 2), (1, 3, 2)]


def test_curriculum_order_semantics(spark):
    """Bin 0 = highest quality; sort_key ascending plays bins in order
    with md5-shuffled ties; values = the quality_score formula."""
    from propertygraph_spark.ops.dataset import curriculum_order
    hi = " ".join(["the and of to a in is that for it"] * 10)  # stopwordy
    lo = "!!! ??? ,,, ;;; ::: %%% @@@ ###"                     # punct soup
    mid = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, hi), (2, lo), (3, mid)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in curriculum_order(df).collect()}
    assert rows[1]["bin"] == 0                      # best -> first bin
    assert rows[2]["bin"] == 7                      # worst -> last bin
    assert rows[1]["sort_key"] < rows[3]["sort_key"] < rows[2]["sort_key"]
    assert rows[1]["sort_key"].startswith("00|")


def test_source_ngram_overlap_semantics(spark):
    """Only source pairs genuinely sharing a 13-gram appear, counted
    once per DISTINCT shared shingle."""
    from propertygraph_spark.ops.text import source_ngram_overlap
    shared = " ".join(f"s{i}" for i in range(13))
    rows = [(1, shared + " ax bx", "A"),
            (2, "cx dx " + shared, "B"),
            (3, "totally unrelated words here only", "C"),
            (4, shared + " ex", "A")]   # same source repeat: still 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = [tuple(r) for r in source_ngram_overlap(df).collect()]
    assert got == [("A", "B", 1)]


def test_api_hits_matches_host_replay(spark):
    """The distributed integer HITS loop over the corpus call graph is
    bit-identical to the host replay inlined in the oracle; callers
    (no in-edges) hold authority exactly 0, callees hub exactly 0."""
    import re
    from propertygraph_spark.ops.kgdocs import api_hits, api_hits_oracle_sql
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["node"]: (r["hub_mu"], r["auth_mu"])
           for r in api_hits(docs).collect()}
    expected = {n: (int(h), int(a)) for n, h, a in
                re.findall(r"\('([^']+)', (\d+), (\d+)\)",
                           api_hits_oracle_sql())}
    assert got == expected
    for n, (h, a) in got.items():
        if re.fullmatch(r"D\d", n):
            assert a == 0 and h > 0, n
        else:
            assert h == 0 and a > 0, n


def test_backward_slice_small_corpus(spark):
    """Distributed scoped-closure slicing on an 8-doc corpus doubles
    the per-doc frozen constants (max stays)."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_PDG_SLICE,
                                                backward_slice_by_template)
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_returns"], r["sum_slice"], r["max_slice"])
           for r in backward_slice_by_template(docs).collect()}
    assert got == {tpl: (2 * n, 2 * s, mx)
                   for tpl, (n, s, mx) in TEMPLATE_PDG_SLICE.items()}


def test_rarity_buckets_semantics(spark):
    """rarity_buckets vs a hand-computed unigram-surprisal corpus: the
    common token scores low (head), the rare token high (tail), and
    floor(log2) comes out as the exact bit length."""
    from propertygraph_spark.ops.text import rarity_buckets
    # corpus: 'a' x 14 + 'z' x 2 -> total 16; surprisal(a)=log2(16/14)
    # =0 bits, surprisal(z)=log2(16/2)=3 bits
    df = spark.createDataFrame(
        [(1, "a a a a a a a"), (2, "a a a a a a a"), (3, "z z"),
         (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in rarity_buckets(df, head_lt=1000,
                                   middle_lt=2500).collect()}
    assert got[1]["surprisal_milli"] == 0          # 7 tokens x 0 bits
    assert got[1]["bucket"] == "head"
    assert got[3]["surprisal_milli"] == 3000       # 2 tokens x 3 bits
    assert got[3]["bucket"] == "tail"
    assert got[4]["n_tokens"] == 0                 # empty doc -> 0/head
    assert got[4]["surprisal_milli"] == 0
    assert got[4]["bucket"] == "head"
    assert got[1]["n_tokens"] == 7


def test_bm25_ranking_semantics(spark):
    """bm25_topk orders docs by the classic trade-offs: more query-term
    hits beat fewer; at equal tf the SHORTER doc wins (length
    normalization); a doc with no query term never appears."""
    from propertygraph_spark.ops.text import bm25_topk
    filler = " ".join(["x"] * 40)
    df = spark.createDataFrame(
        [(1, "q q q " + filler),        # 3 hits, long
         (2, "q " + filler),            # 1 hit, long
         (3, "q q q x x"),              # 3 hits, short -> best
         (4, filler)],                  # no hit -> absent
        "doc_id long, text string")
    rows = bm25_topk(df, ["q"], top_k=10).collect()
    order = [r["doc_id"] for r in rows]
    assert order[0] == 3, order            # short + max tf wins
    assert order.index(1) < order.index(2)  # tf dominates at equal len
    assert 4 not in order
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_eval_fuzzy_contamination_flags_neardup_of_eval(spark):
    """eval_fuzzy_contamination: a train doc near-duplicate to an EVAL
    doc (doc_id % mod == 0) is flagged; unrelated train docs and
    near-dups of other TRAIN docs are not; eval docs never appear."""
    from propertygraph_spark.ops.dedup import eval_fuzzy_contamination
    base = " ".join(f"w{i}" for i in range(40))
    other = " ".join(f"v{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, base),                      # eval (0 % 13 == 0)
         (1, base + " tail edit"),       # train near-dup of eval -> flag
         (2, other),                     # train, unrelated
         (3, other + " tail edit")],     # train near-dup of TRAIN only
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in eval_fuzzy_contamination(df, eval_mod=13).collect()}
    assert 1 in got and got[1]["n_eval_docs"] == 1
    assert got[1]["n_band_hits"] >= 1
    assert 0 not in got and 2 not in got and 3 not in got


def test_forward_slice_small_corpus(spark):
    """Distributed scoped-closure FORWARD slicing on an 8-doc corpus
    doubles the per-doc frozen constants (max stays) — the exact dual
    of the backward-slice contract."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_PDG_FSLICE,
                                                forward_slice_by_template)
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_params"], r["sum_slice"], r["max_slice"])
           for r in forward_slice_by_template(docs).collect()}
    assert got == {tpl: (2 * n, 2 * s, mx)
                   for tpl, (n, s, mx) in TEMPLATE_PDG_FSLICE.items()}


def test_sign_codes_and_ann_sign_topk(spark):
    """sign_codes packs sign bits into the right halves (dim-32
    boundary pinned) and ann_sign_topk puts a bit-identical vector at
    rank 1 while an orthogonal-signed one ranks behind it."""
    from propertygraph_spark.ops.similarity import ann_sign_topk, sign_codes
    base = [0.1] * 64
    flipped = [-x for x in base]
    near = list(base)
    near[0] = 0.2                       # same signs as base
    onebit = [0.1] * 32 + [-0.1] * 32   # hi half flipped
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, flipped), (4, onebit)],
        "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: (r["sig_lo"], r["sig_hi"])
             for r in sign_codes(df).collect()}
    assert codes[1] == (2**32 - 1, 2**32 - 1)   # all 64 bits set
    assert codes[3] == (0, 0)                   # all negative
    assert codes[4] == (2**32 - 1, 0)           # exactly the lo half
    got = [r for r in ann_sign_topk(df, k=3, shortlist=3).collect()
           if r["vec_id"] == 1]
    ranked = sorted(got, key=lambda r: r["rnk"])
    assert ranked[0]["neighbor_id"] == 2        # same code, top cosine
    assert ranked[0]["cos_pm"] >= 990_000
    assert [r["neighbor_id"] for r in ranked].index(3) > 0


def test_closeness_hand_graph(spark):
    """closeness_int on a 3-node path: head reaches 2 nodes at total
    distance 3 -> (2^2 * 1e6) / (2 * 3) = 666666 ppm; middle 500000;
    tail 0 (reaches nothing). Both strategies, exact integers."""
    from propertygraph_spark.ops.graph import closeness_int
    df = spark.createDataFrame([("p", 0, 1), ("p", 1, 2)],
                               "scope string, src long, dst long")
    for bounded in (True, False):
        got = sorted(tuple(r) for r in closeness_int(
            df, scope="scope", bounded_scopes=bounded).collect())
        assert got == [("p", 0, 666666, 2, 3), ("p", 1, 500000, 1, 1),
                       ("p", 2, 0, 0, 0)], bounded


def test_clone2_collapses_renamed_literals(spark):
    """Two docs from the same template (different embedded literals)
    land in ONE clone group with TWO raw keys; docs from different
    templates never share a group (per-template rollup pins it)."""
    from propertygraph_spark.ops.kgdocs import clone2_by_template
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_methods"], r["n_raw_keys"],
                      r["n_clone_groups"])
           for r in clone2_by_template(docs).collect()}
    assert got == {t: (2, 2, 1) for t in range(4)}


def test_media_phash_pairs_identical_and_perturbed(spark):
    """perceptual_hash: identical payload halves (same text) -> hamming
    0 pair; a payload differing in many pixels doesn't pair; the
    banded candidate join misses nothing the brute-force check finds
    at distance <= 3."""
    from propertygraph_spark.ops.multimodal import (media_phash_pairs,
                                                    perceptual_hash,
                                                    synthesize_media)
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "entirely different")],
        "doc_id long, text string")
    media = synthesize_media(docs)
    ph = {r["doc_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert ph[1] == ph[2]                    # same md5(text) half
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in media_phash_pairs(media).collect()}
    assert got.get((1, 2)) == 0
    # brute force over the 3 hashes: every pair at distance <= 3 must
    # appear in the banded output (pigeonhole completeness)
    import itertools
    for a, b in itertools.combinations(sorted(ph), 2):
        d = bin(ph[a] ^ ph[b]).count("1")
        assert ((a, b) in got) == (d <= 3), (a, b, d)


def test_api_bigrams_ordered_small_corpus(spark):
    """api_bigrams on an 8-doc corpus doubles each template's frozen
    adjacent-pair counts, and the pairs are ORDERED (node_id
    sequence), which the unordered co-occurrence op cannot express:
    template 3's two getValue calls link to different fqns, so the
    bigram direction is pinned."""
    from propertygraph_spark.ops.kgdocs import api_bigrams
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    got = {(r["api_from"], r["api_to"]): r["n_occurrences"]
           for r in api_bigrams(docs).collect()}
    assert got[("org.acme.util.Text.getValue",
                "java.lang.String.getValue")] == 2
    assert ("java.lang.String.getValue",
            "org.acme.util.Text.getValue") not in got
    assert all(v % 2 == 0 for v in got.values())


def test_mutual_knn_prunes_asymmetric_hub_edges(spark):
    """mutual_knn with k=1 on three 2-D vectors: A and B are each
    other's nearest neighbor (mutual edge), C's nearest is A but A's
    top-1 is B — the asymmetric C->A edge must be pruned. Passing a
    precomputed kNN table gives identical rows."""
    from propertygraph_spark.ops.similarity import cosine_topk, mutual_knn
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.02]), (3, [0.9, 0.44])],
        "vec_id long, embedding array<float>")
    got = sorted(tuple(r) for r in mutual_knn(emb, k=1).collect())
    assert len(got) == 1
    src, dst, cos_pm, rnk_fwd, rnk_back = got[0]
    assert (src, dst) == (1, 2)
    assert rnk_fwd == 1 and rnk_back == 1
    assert cos_pm > 999_000

    via_knn = sorted(tuple(r) for r in mutual_knn(
        emb, knn=cosine_topk(emb, k=1)).collect())
    assert via_knn == got

    # k=2 on 3 vectors: every directed edge exists, so all 3 pairs are
    # mutual — the canonical direction is src < dst exactly once each
    got2 = sorted((r["src"], r["dst"])
                  for r in mutual_knn(emb, k=2).collect())
    assert got2 == [(1, 2), (1, 3), (2, 3)]


def test_negative_samples_filtered_and_deterministic(spark):
    """negative_samples: every emitted row's corrupted tail is drawn
    from the callee vocabulary, is NEVER a true edge of the same
    caller (filtered protocol), at most k draws per positive edge
    survive, and regeneration is bit-identical (deterministic md5
    draws — reproducible distributed regeneration)."""
    from propertygraph_spark.ops.kgdocs import call_graph, negative_samples
    docs = spark.createDataFrame([(i, "t") for i in range(8)],
                                 "doc_id long, text string")
    edges = {(r["caller"], r["callee"])
             for r in call_graph(docs).collect()}
    vocab = {c for _, c in edges}
    rows = [tuple(r) for r in negative_samples(docs, k=3).collect()]
    assert rows
    per_edge: dict = {}
    for caller, callee, neg_idx, neg in rows:
        assert (caller, callee) in edges
        assert neg in vocab
        assert (caller, neg) not in edges  # filtered
        assert 0 <= neg_idx < 3
        per_edge[(caller, callee)] = per_edge.get((caller, callee), 0) + 1
    assert all(n <= 3 for n in per_edge.values())
    rows2 = [tuple(r) for r in negative_samples(docs, k=3).collect()]
    assert rows2 == rows


def test_betweenness_hand_graphs(spark):
    """betweenness_int exact integers, both strategies: on a 3-node
    path the middle node mediates the single (0,2) pair (stress 1,
    bc_fppm 1e6); on the 4-node diamond each middle node carries one
    of the two (0,3) shortest paths (stress 1, bc_fppm floor(1e6/2) =
    500000) — the case where stress and betweenness diverge."""
    from propertygraph_spark.ops.graph import betweenness_int
    path = spark.createDataFrame([("p", 0, 1), ("p", 1, 2)],
                                 "scope string, src long, dst long")
    dia = spark.createDataFrame(
        [("d", 0, 1), ("d", 0, 2), ("d", 1, 3), ("d", 2, 3)],
        "scope string, src long, dst long")
    for bounded in (True, False):
        got = sorted(tuple(r) for r in betweenness_int(
            path, scope="scope", bounded_scopes=bounded).collect())
        assert got == [("p", 0, 0, 0), ("p", 1, 1, 1_000_000),
                       ("p", 2, 0, 0)], bounded
        got = sorted(tuple(r) for r in betweenness_int(
            dia, scope="scope", bounded_scopes=bounded).collect())
        assert got == [("d", 0, 0, 0), ("d", 1, 1, 500_000),
                       ("d", 2, 1, 500_000), ("d", 3, 0, 0)], bounded


def test_gram_int8_exact_hand_vectors(spark):
    """gram_int8 on two hand vectors quantizing to integer codes:
    v1=[1,0.5] -> absmax 1, scale 127 -> codes [127, 64] (63.5 + 0.5
    rounds half-up); v2=[-2,2] -> codes [-127, 127]. Gram entries are
    the exact integer sums; partition layout must not change them."""
    from propertygraph_spark.ops.similarity import gram_int8
    emb = spark.createDataFrame(
        [(1, [1.0, 0.5]), (2, [-2.0, 2.0])],
        "vec_id long, embedding array<float>")
    want = {(0, 0, 127 * 127 + 127 * 127),
            (0, 1, 127 * 64 + (-127) * 127),
            (1, 1, 64 * 64 + 127 * 127)}
    got = {tuple(r) for r in gram_int8(emb).collect()}
    assert got == want
    got2 = {tuple(r) for r in gram_int8(emb.repartition(4)).collect()}
    assert got2 == want


# ------------------------------------------------------------ BPE training

def test_bpe_train_hand_merges(spark):
    """Sennrich merge loop on a hand corpus: 'ab'x3 + 'abc'x2 ->
    round 1 merges (a,b) with count 5, round 2 merges (ab,c) with
    count 2, then no pairs remain and the loop stops early."""
    from propertygraph_spark.ops.text import bpe_train
    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abc")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    assert got == [(1, "a", "b", "ab", 5), (2, "ab", "c", "abc", 2)]


def test_bpe_train_greedy_overlap_and_tiebreak(spark):
    """'aaaa': the (a,a) pair counts 3 (adjacent index pairs) but the
    greedy leftmost merge yields exactly two 'aa' symbols — replace()'s
    non-overlapping scan IS the BPE merge rule; round 2 then merges
    (aa,aa). Tie-breaks are lexicographic on (left, right)."""
    from propertygraph_spark.ops.text import bpe_train
    docs = spark.createDataFrame([(1, "aaaa")],
                                 "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, n_merges=2).collect()]
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]

    ties = spark.createDataFrame([(1, "ba bc")],
                                 "doc_id long, text string")
    first = bpe_train(ties, n_merges=1).collect()[0]
    assert (first["left_sym"], first["right_sym"]) == ("b", "a")


def test_bpe_train_stable_under_repartition(spark):
    from propertygraph_spark.ops.text import bpe_train
    docs = spark.createDataFrame(
        [(i, "lo low lower lowest " * (1 + i % 3)) for i in range(24)],
        "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(docs.repartition(7),
                                     n_merges=4).collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(2),
                                     n_merges=4).collect()]
    assert a == b and len(a) == 4
    # every merge's pair count is positive and non-increasing merges
    # need not hold in general, but counts are positive integers
    assert all(row[4] >= 1 for row in a)


# ------------------------------------------------- API link prediction

def test_api_link_prediction_frozen_corpus(spark):
    """On the 4-template corpus the callee sets per caller class are
    frozen; every shared-caller callee pair scores n_common=1 and
    aa_ppm = 1e6 div floor(log2(out_degree)) of its single shared
    caller (deg 2 -> 1e6, deg 3 -> 1e6: floor(log2(3)) = 1)."""
    from propertygraph_spark.ops.kgdocs import api_link_prediction
    docs = spark.createDataFrame([(i, "") for i in range(8)],
                                 "doc_id long, text string")
    got = {(r["api_a"], r["api_b"]): (r["n_common"], r["aa_ppm"])
           for r in api_link_prediction(docs).collect()}
    want_pairs = {
        ("org.acme.util.Text.length", "org.acme.util.Text.put"),
        ("java.lang.String.length", "java.lang.String.parseInt"),
        ("java.lang.String.length", "java.lang.String.put"),
        ("java.lang.String.parseInt", "java.lang.String.put"),
        ("java.lang.String.getValue", "org.acme.util.Text.getValue"),
    }
    assert set(got) == want_pairs
    assert all(v == (1, 1_000_000) for v in got.values())


# ------------------------------------------------- HLL audience overlap

def test_audience_overlap_hll_register_algebra(spark, tmp_path):
    """Identical user sets -> identical registers -> est_a == est_b ==
    est_union and exact overlap = set size; the union estimate can
    never fall below either side (register-wise max)."""
    import datetime as dt
    from propertygraph_spark.ops.relational import audience_overlap_hll
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(200):
        for t in ("A", "B"):          # identical audiences
            rows.append((eid, base, u, t, 1.0, "{}")); eid += 1
    for u in range(500, 800):         # C: disjoint audience
        rows.append((eid, base, u, "C", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {(r["type_a"], r["type_b"]): r for r in
           audience_overlap_hll(spark, str(tmp_path)).collect()}
    ab = out[("A", "B")]
    assert ab["exact_overlap"] == 200
    assert ab["est_a"] == ab["est_b"] == ab["est_union"]
    assert ab["est_overlap"] == ab["est_a"]
    for k, r in out.items():
        assert r["est_union"] >= max(r["est_a"], r["est_b"]), k
    ac = out[("A", "C")]
    assert ac["exact_overlap"] == 0
    # disjoint 200 + 300 users: union estimate must clearly exceed
    # either side (no accuracy claim at m=64, just separation)
    assert ac["est_union"] > ac["est_a"] and ac["est_union"] > ac["est_b"]


# -------------------------------------------------- PCA power iteration

def test_pca_power_matches_host_replay(spark):
    """Integer power iteration on a hand Gram: 3x [1,0] + 1x [1,1]
    quantize to codes [127,0]/[127,127]; the milli-vector after each
    round must equal a direct Python replay of u = G v,
    v = (u*1000) div max|u| (trunc-toward-zero division)."""
    from propertygraph_spark.ops.similarity import pca_power
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),
         (4, [1.0, 1.0])],
        "vec_id long, embedding array<float>")
    G = [[4 * 127 * 127, 127 * 127], [127 * 127, 127 * 127]]

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    v = [1000, 1000]
    for _ in range(8):
        u = [G[0][0] * v[0] + G[0][1] * v[1],
             G[1][0] * v[0] + G[1][1] * v[1]]
        m = max(abs(x) for x in u)
        v = [trunc_div(x * 1000, m) for x in u]
    got = [r["v_milli"] for r in pca_power(emb, iters=8).collect()]
    assert got == v
    # dominant direction: dim 0 carries the mass (3 of 4 vectors are
    # pure e0), so it is the max-normalized 1000 entry
    assert got[0] == 1000 and 0 < got[1] < 1000
    # stable under repartition (integer sums are order-insensitive)
    got2 = [r["v_milli"]
            for r in pca_power(emb.repartition(3), iters=8).collect()]
    assert got2 == got


# --------------------------------------- FOW control dependence (hand)

def test_fow_stats_hand_graphs():
    """Host-replay FOW on textbook shapes: a diamond if yields one
    cdep per branch arm and no self-deps; a while loop yields body +
    header dependence with the header SELF-dependent (the classic FOW
    loop signature); straight-line code yields none."""
    from propertygraph_spark.ops.kgdocs import _fow_stats

    def t(m, a, b):
        return {"pred": "cfg_next", "method_id": m, "subj": a, "obj": b}

    diamond = [t("m", 0, 1), t("m", 0, 2), t("m", 1, 3), t("m", 2, 3)]
    assert _fow_stats(diamond) == (2, 0)
    while_loop = [t("m", 1, 2), t("m", 2, 1), t("m", 1, 3)]
    assert _fow_stats(while_loop) == (2, 1)
    straight = [t("m", 0, 1), t("m", 1, 2)]
    assert _fow_stats(straight) == (0, 0)


def test_control_dep_fow_distributed_matches_frozen(spark):
    """The three-kernel composition (reversed-CFG dominators ->
    ipostdom closure -> join/anti-join) over the 8-doc corpus must
    reproduce the host-frozen per-template constants exactly, scaled
    by the two docs per template; templates with zero cdep edges
    (straight-line try/catch) emit no row."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_CFG_FOW,
                                                control_dep_fow_by_template)
    docs = spark.createDataFrame([(i, "") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_cdep_edges"], r["n_self_deps"])
           for r in control_dep_fow_by_template(docs).collect()}
    want = {tpl: (2 * n, 2 * s)
            for tpl, (n, s) in TEMPLATE_CFG_FOW.items() if n > 0}
    assert got == want
    # the while template carries the loop self-dependence signature
    assert any(s > 0 for _, s in got.values())


def test_dead_stores_distributed_matches_frozen(spark):
    """Distributed dead-store detection over the 8-doc corpus equals
    the host-frozen per-template (n_defs, n_dead) constants x 2 docs;
    the loop template's unconsumed accumulator and the try/catch
    template's dead local are the nonzero rows."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_DEAD_STORES,
                                                dead_stores_by_template)
    docs = spark.createDataFrame([(i, "") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_def_nodes"], r["n_dead_stores"])
           for r in dead_stores_by_template(docs).collect()}
    want = {tpl: (2 * d, 2 * dd)
            for tpl, (d, dd) in TEMPLATE_DEAD_STORES.items() if d > 0}
    assert got == want
    assert sum(dd for _, dd in got.values()) > 0  # detector fires


def test_cfg_diameter_distributed_matches_frozen(spark):
    """Diameter/peripheral rollup over the 8-doc corpus equals the
    Floyd-Warshall-frozen per-template constants (sum scales by docs,
    max does not)."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_CFG_ECC,
                                                cfg_diameter_by_template)
    docs = spark.createDataFrame([(i, "") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["sum_diameter"], r["max_diameter"],
                      r["sum_peripheral"])
           for r in cfg_diameter_by_template(docs).collect()}
    want = {tpl: (2 * s, m, 2 * np)
            for tpl, (s, m, np) in TEMPLATE_CFG_ECC.items()}
    assert got == want


def test_ast_paths_hand_tree_and_frozen(spark):
    """code2vec path contexts on a hand tree: root 1 with children
    2, 3; 2 has leaves 4, 5; 3 is a leaf. Leaf pairs: (4,5) len 2,
    (4,3) len 3, (5,3) len 3 -> 3 contexts, sum 8, 3 leaves. The
    distributed rollup over the 8-doc corpus equals the
    undirected-BFS-frozen constants."""
    from propertygraph_spark.ops.kgdocs import (TEMPLATE_AST_PATHS,
                                                _k_ast_paths,
                                                ast_paths_by_template)
    es = [(1, 2), (1, 3), (2, 4), (2, 5)]
    assert list(_k_ast_paths(es)) == [(3, 3, 8)]
    # truncation: same tree with max_len=2 keeps only the (4,5) pair
    assert list(_k_ast_paths(es, max_len=2)) == [(3, 1, 2)]

    docs = spark.createDataFrame([(i, "") for i in range(8)],
                                 "doc_id long, text string")
    got = {r["tpl"]: (r["n_leaf_nodes"], r["n_path_contexts"],
                      r["sum_path_len"])
           for r in ast_paths_by_template(docs).collect()}
    want = {tpl: (2 * l, 2 * c, 2 * s)
            for tpl, (l, c, s) in TEMPLATE_AST_PATHS.items()}
    assert got == want


def test_bpe_apply_compression_profile(spark):
    """Tokenizer application: merges learned on the 'ab'-heavy corpus
    compress 'ab...' words while the lang whose words never contain
    the merged pairs stays at one symbol per char; counts match a
    hand replay."""
    from propertygraph_spark.ops.text import bpe_apply
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab abc abc", "aa"),
         (2, "xy xz", "bb")],
        "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in bpe_apply(docs, n_merges=2).collect()}
    # merges learned globally: (a,b) cnt 6 -> 'ab'; then (ab,c) cnt 2
    aa = out["aa"]
    assert aa["n_tokens"] == 6 and aa["n_chars"] == 14
    # 'ab' -> 1 symbol (x4 words... freq 4), 'abc' -> 1 symbol (freq 2)
    assert aa["n_symbols"] == 4 * 1 + 2 * 1
    assert aa["symbols_per_char_pm"] == 6 * 1000 // 14
    bb = out["bb"]
    # 'xy'/'xz' untouched by the merges: 2 symbols each
    assert bb["n_tokens"] == 2 and bb["n_symbols"] == 4
    assert bb["symbols_per_char_pm"] == 1000


def test_curation_funnel_monotone_and_hand_counts(spark):
    """Funnel stages are monotone and match a hand corpus: two good
    English docs sharing identical text (dedup drops one), one doc
    whose predicted language contradicts its label, one low-quality
    doc (pure punctuation)."""
    from propertygraph_spark.ops.text import STOPWORDS, curation_funnel
    good = ("the quick brown fox and the lazy dog walk with a friend "
            * 20)
    docs = spark.createDataFrame(
        [(1, good, "en"), (2, good, "en"),
         (3, good, "fr"),                     # label contradicts content
         (4, "!!! ??? ;;; ***", "en")],       # fails the quality gate
        "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in curation_funnel(docs).collect()}
    en = out["en"]
    assert (en["n_total"], en["n_lang_ok"], en["n_quality_ok"],
            en["n_unique"]) == (3, 2, 2, 1)
    fr = out["fr"]
    assert fr["n_total"] == 1 and fr["n_lang_ok"] == 0
    for r in out.values():
        assert (r["n_total"] >= r["n_lang_ok"] >= r["n_quality_ok"]
                >= r["n_unique"])


def test_session_window_native_boundary_and_pca_project(spark, tmp_path):
    """Native F.session_window merges sessions whose windows TOUCH: a
    gap of EXACTLY the gap length still merges (boundary inclusive —
    sessions break only on gap > g, matching the custom rule), a
    31-minute gap splits; session_end = last event + gap. And
    pca_project_hist: projections bucket deterministically, counts sum
    to the corpus, identical under repartition."""
    import datetime as dt

    from propertygraph_spark.ops.relational import session_window_native
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=29), 7, "view", 2.0, "{}"),
        (3, base + dt.timedelta(minutes=59), 7, "view", 4.0, "{}"),
        # exactly 30 min later: still the SAME session (inclusive)
        (4, base + dt.timedelta(minutes=89), 7, "view", 8.0, "{}"),
        # 31 min later: breaks
        (5, base + dt.timedelta(minutes=120), 7, "view", 16.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = session_window_native(spark, str(tmp_path)).collect()
    assert [r["n_events"] for r in out] == [4, 1]
    assert out[0]["sum_value_x1000"] == 15000
    assert out[0]["session_end"] == base + dt.timedelta(minutes=119)
    assert out[1]["session_end"] == base + dt.timedelta(minutes=150)

    from propertygraph_spark.ops.similarity import pca_project_hist
    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0], i % 3) for i in range(60)],
        "vec_id long, embedding array<float>, label int")
    h = pca_project_hist(emb, iters=4, n_buckets=4).collect()
    assert sum(r["n_vecs"] for r in h) == 60
    assert all(0 <= r["bucket"] < 4 for r in h)
    h2 = pca_project_hist(emb.repartition(5), iters=4,
                          n_buckets=4).collect()
    assert sorted(map(tuple, h)) == sorted(map(tuple, h2))
