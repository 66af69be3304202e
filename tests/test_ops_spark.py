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


def test_minhash_lsh_candidates(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["n_bands"]
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert pairs[(0, 1)] == 4              # identical docs collide in all bands
    assert (0, 4) not in pairs             # unrelated docs don't collide


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
