"""Third-implementation cross-checks: each dedup/text operator compared
against an INDEPENDENT pure-Python reference implementation on seeded
random corpora (the DuckDB oracle is implementation #2; this is #3 —
three codebases agreeing on md5-exact outputs leaves little room for a
shared bug)."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from propertygraph_spark.ops import dedup, similarity, text

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta the and of "
         "data spark row").split()


def random_docs(seed: int, n: int = 8):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(0, 14))]
        rows.append((i, " ".join(words)))
    if n >= 2 and rng.random() < 0.8:
        rows[1] = (1, rows[0][1])  # plant an exact duplicate
    return rows


def docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long")


def _toks(t: str):
    return [w for w in t.split() if w]


def _shingles(t: str, k: int = 3):
    toks = _toks(t)
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ngram_jaccard_vs_python(spark, seed):
    rows = random_docs(seed)
    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["jaccard_pm"])
           for r in dedup.ngram_jaccard_pairs(
               docs_df(spark, rows), threshold_pm=1).collect()}
    want = {}
    sh = {i: _shingles(t) for i, t in rows}
    for a in sh:
        for b in sh:
            if a >= b or not (sh[a] & sh[b]):
                continue
            inter = len(sh[a] & sh[b])
            jpm = math.floor(inter * 1000 / len(sh[a] | sh[b]))
            if jpm >= 1:
                want[(a, b)] = (inter, jpm)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_simhash_vs_python(spark, seed):
    rows = random_docs(seed)
    got = {r["doc_id"]: r["simhash16"]
           for r in dedup.simhash(docs_df(spark, rows)).collect()}
    want = {}
    for i, t in rows:
        toks = _toks(t)
        if not toks:
            continue  # no tokens -> no groupBy row
        votes = [0] * 16
        for tok in toks:
            hv = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
            for b in range(16):
                votes[b] += 1 if (hv >> b) & 1 else -1
        want[i] = sum(1 << b for b in range(16) if votes[b] > 0)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minhash_signature_vs_python(spark, seed):
    rows = random_docs(seed)
    sig_df = dedup.minhash_signatures(docs_df(spark, rows))
    got = {r["doc_id"]: [r[f"h{i}"] for i in range(dedup.N_MINHASH)]
           for r in sig_df.collect()}
    want = {}
    for i, t in rows:
        sh = _shingles(t)
        if not sh:
            continue
        want[i] = [min(hashlib.md5(f"{j}|{s}".encode()).hexdigest()
                       for s in sh)
                   for j in range(dedup.N_MINHASH)]
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_quantize_vs_python(spark, seed):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], 0)
            for i in range(6)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    # read back the float32-truncated values Spark actually stores
    stored = {r["vec_id"]: [float(x) for x in r["embedding"]]
              for r in emb.collect()}
    got = {r["vec_id"]: (r["scale_pm"], r["code_sum"], r["code_max"],
                         r["code_min"])
           for r in similarity.quantize_int8(emb).collect()}
    for vid, vec in stored.items():
        absmax = max(abs(x) for x in vec)
        scale = 127.0 / absmax if absmax > 0 else 0.0
        codes = [math.floor(x * scale + 0.5) for x in vec]
        assert got[vid] == (math.floor(scale * 1_000_000), sum(codes),
                            max(codes), min(codes))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fingerprint_vs_python(spark, seed):
    rows = random_docs(seed)
    got = {r["doc_id"]: (r["content_md5"], r["min_shingle_md5"])
           for r in text.fingerprint(docs_df(spark, rows)).collect()}
    for i, t in rows:
        sh = _shingles(t)
        want_min = min((hashlib.md5(s.encode()).hexdigest() for s in sh),
                       default=None)
        assert got[i] == (hashlib.md5(t.encode()).hexdigest(), want_min)
