"""Similarity search over the embeddings table (embedding: array<float>).

- brute-force cosine top-k: exact baseline as a broadcast-index BLAS
  block matmul (map-only; at 100 TB shard the index and loop shards).
- LSH / IVF ANN: the scale paths. Bucketing is deterministic (literal
  md5-parity hyperplane signs / md5-seeded centroids — reproducible on
  any cluster, and inlined identically in the SQL oracles); the exact
  rerank is a bucket-grouped BLAS matmul behind ONE bucket-key shuffle.

Cosine is reported as cos_pm = floor(1e6 * cos) (per-micro) so tiny
float-tail differences cannot flip the oracle value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_PLANES = 8


def _topk_against(q_ids, cos_pm, c_ids, k):
    """THE rerank kernel, shared by every exact/ANN variant: per query
    row, exclude self, order by (-cos_pm, neighbor_id), keep k. Yields
    (query_id, neighbor_id, cos_pm, rank). Any change to quantization or
    tie-breaking lives HERE (and in the SQL oracle twins) exactly once."""
    import numpy as np
    for qi in range(len(q_ids)):
        mask = c_ids != q_ids[qi]
        cand_ids = c_ids[mask]
        cand = cos_pm[qi][mask]
        order = np.lexsort((cand_ids, -cand))[:k]
        for r, j in enumerate(order, start=1):
            yield (q_ids[qi], cand_ids[j], cand[j], r)


def cosine_topk(emb: DataFrame, k: int = 5,
                index_block_rows: int = 500_000) -> DataFrame:
    """Exact top-k cosine neighbors per vector (brute force baseline).

    Executed as a SHARDED block matmul: the index side is split into
    broadcast-sized blocks of ~<= ``index_block_rows`` vectors
    (block = pmod(xxhash64(vec_id), n_blocks) — hash-uniform for any id
    distribution); each pass collects ONE block,
    broadcasts it, and every Arrow batch of query vectors does one
    numpy/BLAS matmul + lexsort against it, keeping its per-block top-k.
    Global top-k = window rank over the union of per-block partials
    (global winners are necessarily per-block winners, so the reduction
    is exact). The driver never holds more than one block — no full-table
    collect, so the index can be arbitrarily large; a single-block index
    stays the round-1 map-only zero-shuffle plan.

    This beats the per-pair Catalyst-fold cross join by ~30x (BLAS
    vectorization); the only shuffle is the final rank over
    n_queries x k x n_blocks partial rows (multi-block case only).
    """
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cos_pm", LongType(), False),
        StructField("rnk", LongType(), False),
    ])

    n_index = emb.count()
    n_blocks = max(1, -(-n_index // index_block_rows))
    sc = emb.sparkSession.sparkContext
    queries = emb.select("vec_id", "embedding")

    def block_pass(bc, with_rank: bool):
        def batches(it):
            import pandas as pd
            b_ids, b_M, b_norm = bc.value
            for pdf in it:
                q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                Q = np.array([list(e) for e in pdf["embedding"]],
                             dtype=np.float64)
                q_norm = np.sqrt((Q * Q).sum(axis=1))
                cos = (Q @ b_M.T) / np.outer(q_norm, b_norm)
                cos_pm = np.floor(cos * 1_000_000).astype(np.int64)
                out = [(q, c, s, r if with_rank else 0)
                       for q, c, s, r in _topk_against(q_ids, cos_pm,
                                                       b_ids, k)]
                yield pd.DataFrame(
                    out, columns=["vec_id", "neighbor_id", "cos_pm", "rnk"])
        return batches

    from pyspark.sql.window import Window
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_pm"), F.asc("neighbor_id"))

    def reduce_topk(parts):
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        return (allp.drop("rnk")
                .withColumn("rnk", F.row_number().over(w).cast("long"))
                .filter(F.col("rnk") <= k))

    _prefetch_group = "cosine_topk_prefetch"

    def load_block(blk):
        # tag the prefetch collect with its own job group (thread-local)
        # so the error path can interrupt a RUNNING collect via
        # cancelJobGroup — Future.cancel() is a no-op once the call has
        # started (ADVICE r4)
        sc.setJobGroup(_prefetch_group, "cosine_topk block prefetch",
                       interruptOnCancel=True)
        block_df = emb.select("vec_id", "embedding")
        if n_blocks > 1:
            # hash-partition the index: pmod of the RAW id would collapse
            # structured ids (snowflake ids all ≡ 0 mod n) into one block
            # and defeat the bounded collect
            block_df = block_df.filter(
                F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)) == blk)
        return block_df.collect()

    # one-ahead prefetch: block i+1's collect job runs on a side thread
    # while block i's matmul pass runs — the Spark scheduler interleaves
    # the two jobs' tasks, so the driver-side collect latency hides
    # behind the compute pass instead of serializing with it. Still at
    # most TWO blocks resident driver-side (current + prefetched).
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1)
    partials = []
    nxt = None
    try:
        nxt = pool.submit(load_block, 0)
        for blk in range(n_blocks):
            rows = nxt.result()
            nxt = None
            if blk + 1 < n_blocks:
                nxt = pool.submit(load_block, blk + 1)
                # surface a prefetch failure on THIS iteration, not one
                # block later: a fast-failing submit (analysis error)
                # resolves almost immediately, so peek without blocking
                if nxt.done() and nxt.exception() is not None:
                    raise nxt.exception()
            if not rows:
                continue
            ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
            M = np.array([list(r["embedding"]) for r in rows],
                         dtype=np.float64)
            m_norm = np.sqrt((M * M).sum(axis=1))
            bc = sc.broadcast((ids, M, m_norm))
            partial = queries.mapInPandas(
                block_pass(bc, with_rank=(n_blocks == 1)), schema)
            if n_blocks > 1:
                # materialize THIS block's partial top-k now (n_queries x
                # k small rows) so the block broadcast can be released
                # before the next pass — otherwise every block's broadcast
                # stays referenced by the lazy union until the final
                # action, and 200 blocks would pin 200 x block_size on
                # the executors
                partial = partial.localCheckpoint(eager=True)
                bc.unpersist()
            partials.append(partial)
            if len(partials) >= 8:
                # running top-k compaction: fold the accumulated partials
                # back to n_queries x k rows every 8 blocks, so the final
                # reduction reads O(n_queries x k x 8) rows instead of
                # n_queries x k x n_blocks (10^9-row window at 200 blocks)
                partials = [reduce_topk(partials)
                            .localCheckpoint(eager=True)]
    finally:
        # on an exception the in-flight collect must not keep running
        # against the session (ADVICE r3): cancel it if still queued,
        # interrupt it via its job group if already RUNNING (ADVICE r4 —
        # otherwise the blocking shutdown below awaits a hung collect
        # indefinitely before the original exception propagates), then
        # wait for the worker thread to drain before returning
        if nxt is not None and not nxt.cancel():
            try:
                sc.cancelJobGroup(_prefetch_group)
            except Exception:
                pass  # session already stopped — nothing to interrupt
        pool.shutdown(wait=True)

    if not partials:  # empty index
        return emb.sparkSession.createDataFrame([], schema)
    if n_blocks == 1:
        return partials[0]
    return reduce_topk(partials)


def mutual_knn(emb: DataFrame, k: int = 5,
               knn: DataFrame | None = None) -> DataFrame:
    """Mutual k-NN graph over an embedding column — the neighborhood
    graph semantic-clustering pipelines build before community/CC steps
    (SemDeDup-style curation, UMAP/HDBSCAN preprocessing): an
    undirected edge (src, dst) survives iff EACH endpoint ranks the
    other inside its own top-k. Mutuality prunes hub vectors'
    asymmetric fan-in, which is what makes the downstream clustering
    robust.

    Built as a composition: the exact blocked-broadcast ``cosine_topk``
    (or any ANN variant passed via ``knn`` — the contract is only
    (vec_id, neighbor_id, cos_pm, rnk)) produces the directed n*k edge
    table; one self-equi-join on the reversed key keeps mutual pairs,
    and ``src < dst`` canonicalizes direction. The join shuffles only
    n*k rows (never the raw vectors), so the mutuality step costs the
    same at 10^9 vectors as any edge-table shuffle; the kNN stage is
    localCheckpointed so its BLAS passes run once, not once per join
    side."""
    directed = (knn if knn is not None else cosine_topk(emb, k=k)) \
        .select("vec_id", "neighbor_id", "cos_pm", "rnk") \
        .localCheckpoint(eager=False)
    rev = directed.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("rnk").alias("rnk_back"))
    return (directed.join(rev, ["vec_id", "neighbor_id"])
            .filter(F.col("vec_id") < F.col("neighbor_id"))
            .select(F.col("vec_id").alias("src"),
                    F.col("neighbor_id").alias("dst"),
                    "cos_pm",
                    F.col("rnk").alias("rnk_fwd"),
                    F.col("rnk_back")))


def plane_signs(j: int, dims: int) -> list:
    """Deterministic +-1 pattern for hyperplane j: parity of the first
    hex char of md5('<j>|<dim>') — computed host-side once (the same
    derivation the SQL oracle inlines as literals)."""
    import hashlib
    return [
        (int(hashlib.md5(f"{j}|{i}".encode()).hexdigest()[0], 16) % 2) * 2 - 1
        for i in range(dims)]


def lsh_bucket(emb: DataFrame, n_planes: int = N_PLANES,
               dims: int = 64) -> DataFrame:
    """Sign-bit sketch: bucket = sum over planes j of 2^j * [dot(v, s_j)>=0]
    where s_j is the deterministic +-1 pattern, inlined as a literal
    array (computing it per row via md5 expressions cost dims x planes
    md5 calls per vector). One pass, map-only."""
    sketch_bits = []
    for j in range(n_planes):
        signs = F.array(*[F.lit(s) for s in plane_signs(j, dims)])
        # slice to the actual vector length: zip_with pads the shorter
        # side with nulls, which would null the whole projection
        proj = F.aggregate(
            F.zip_with(F.col("embedding"),
                       F.slice(signs, 1, F.size("embedding")),
                       lambda x, s: x.cast("double") * s),
            F.lit(0.0), lambda acc, v: acc + v)
        sketch_bits.append(F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    bucket = sketch_bits[0]
    for b in sketch_bits[1:]:
        bucket = bucket + b
    return emb.select("vec_id", "embedding", bucket.alias("bucket"))


def ann_lsh_topk(emb: DataFrame, k: int = 5,
                 n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k: exact cosine rerank restricted to same-bucket
    candidates. Join shuffles on the 8-bit bucket key only."""
    return _topk_within_bucket(lsh_bucket(emb, n_planes), k)


def lsh_multitable_buckets(emb: DataFrame, n_tables: int = 12,
                           planes_per_table: int = 5,
                           dims: int = 64) -> DataFrame:
    """L independent sign-bucketings exploded into one (vec_id,
    embedding, bucket) column — bucket = table * 2^b + local bucket, so
    the downstream rerank groups per (table, local bucket) with a
    single key. Table t uses planes j = t*b .. t*b+b-1 of the SAME
    deterministic ``plane_signs`` family the single-table path uses
    (the SQL oracle inlines the identical literals). Map-only; the
    explode multiplies shuffle rows by L — the classic multi-table LSH
    cost paid for recall."""
    buckets = []
    for t in range(n_tables):
        bits = []
        for jj in range(planes_per_table):
            signs = F.array(*[F.lit(s) for s in
                              plane_signs(t * planes_per_table + jj, dims)])
            proj = F.aggregate(
                F.zip_with(F.col("embedding"),
                           F.slice(signs, 1, F.size("embedding")),
                           lambda x, s: x.cast("double") * s),
                F.lit(0.0), lambda acc, v: acc + v)
            bits.append(F.when(proj >= 0, F.lit(1 << jj))
                        .otherwise(F.lit(0)))
        local = bits[0]
        for b in bits[1:]:
            local = local + b
        buckets.append(local + F.lit(t * (1 << planes_per_table)))
    return emb.select("vec_id", "embedding",
                      F.explode(F.array(*buckets)).alias("bucket"))


def ann_lsh_mt_topk(emb: DataFrame, k: int = 5, n_tables: int = 12,
                    planes_per_table: int = 5) -> DataFrame:
    """Multi-table LSH top-k (VERDICT r4 #6: single-table recall@5 was
    ~0.02 on the isotropic synthetic embeddings — sign buckets split
    weakly-concentrated neighbors almost always; L independent tables
    recover recall ~1-(1-p^b)^L). Per-composite-bucket exact rerank,
    then a union dedup + one global window: a union-top-k pair is
    top-k inside every bucket the two share (in-bucket candidates are
    a subset of union candidates), so per-bucket top-k loses nothing —
    the same exactness reduction cosine_topk's block fold uses."""
    from pyspark.sql.window import Window
    per = _topk_within_bucket(
        lsh_multitable_buckets(emb, n_tables, planes_per_table), k)
    # pair dedup via max(), not dropDuplicates: the same pair surfacing
    # from two buckets carries BLAS scores that can differ by one ulp
    # (different matrix shapes per bucket), and dropDuplicates would
    # keep an arbitrary one — max() is deterministic, and the SQL twin
    # (identical fold in every table) collapses to the same value
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_pm"),
                                             F.asc("neighbor_id"))
    return (per.groupBy("vec_id", "neighbor_id")
            .agg(F.max("cos_pm").alias("cos_pm"))
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k))


def ivf_assign(emb: DataFrame, n_cells: int = 8,
               centroids=None) -> DataFrame:
    """IVF coarse quantizer with deterministic centroid seeding: the
    n_cells vectors with the smallest md5(vec_id) digests act as
    centroids (content-stable — no random state, reproducible on any
    cluster); every vector is assigned to its max-cosine centroid.

    The centroid set is an index artifact (collected + broadcast, like a
    trained quantizer would be); assignment is a map-only numpy pass.
    Pass ``centroids`` to share one trained quantizer across passes."""
    import numpy as np

    if centroids is None:
        centroids = _ivf_centroids(emb, n_cells)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                                   LongType, StructField, StructType)
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("bucket", IntegerType(), False),
    ])

    def assign(it):
        import pandas as pd
        cent = bc.value
        for pdf in it:
            if len(pdf) == 0:  # empty Arrow batch: nothing to assign
                continue
            Q = np.array([list(e) for e in pdf["embedding"]],
                         dtype=np.float64)
            Qn = Q / np.sqrt((Q * Q).sum(axis=1, keepdims=True))
            # quantize the argmax criterion (per-nano): BLAS matmul and a
            # sequential fold can differ in the last ulp, which near a tie
            # would move a vector to a different cell; floor(cos*1e9)
            # collapses such near-ties, and numpy argmax's first-max rule
            # == the SQL twin's seed_rank ASC tiebreak
            cos_q = np.floor((Qn @ cent.T) * 1_000_000_000)
            cells = cos_q.argmax(axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": pdf["embedding"],
                                "bucket": cells})

    return emb.select("vec_id", "embedding").mapInPandas(assign, schema)


def _topk_within_bucket(bucketed: DataFrame, k: int) -> DataFrame:
    """Exact cosine rerank restricted to same-bucket candidates (shared
    by the LSH and IVF paths): ONE shuffle on the bucket key, then a
    numpy/BLAS pairwise matmul per bucket inside applyInPandas (the
    per-pair Catalyst fold is interpreted — a 250-vector cell means
    60k folds x dims; BLAS does the block in microseconds)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cos_pm", LongType(), False),
        StructField("rnk", LongType(), False),
    ])

    def per_bucket(pdf):
        import pandas as pd
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(columns=["vec_id", "neighbor_id",
                                         "cos_pm", "rnk"])
        M = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
        nrm = np.sqrt((M * M).sum(axis=1))
        cos = (M @ M.T) / np.outer(nrm, nrm)
        cos_pm = np.floor(cos * 1_000_000).astype(np.int64)
        out = list(_topk_against(ids, cos_pm, ids, k))
        return pd.DataFrame(out, columns=["vec_id", "neighbor_id",
                                          "cos_pm", "rnk"])

    return (bucketed.select("vec_id", "bucket", "embedding")
            .groupBy("bucket").applyInPandas(per_bucket, schema))


def _ivf_centroids(emb: DataFrame, n_cells: int):
    """Deterministic md5-seeded, L2-normalized centroid matrix (shared by
    the assign and probe paths so their cell ids agree)."""
    import numpy as np

    seeds = (emb.select("vec_id", "embedding",
                        F.md5(F.col("vec_id").cast("string")).alias("h"))
             .orderBy("h").limit(n_cells).collect())
    if not seeds:  # empty corpus/partition: 0-cell quantizer, not a crash
        return np.zeros((0, 1), dtype=np.float64)
    C = np.array([list(r["embedding"]) for r in seeds], dtype=np.float64)
    return C / np.sqrt((C * C).sum(axis=1, keepdims=True))


def ivf_probe_assign(emb: DataFrame, n_cells: int = 8,
                     nprobe: int = 2, centroids=None) -> DataFrame:
    """Query-side multi-probe: each vector lists its top-``nprobe`` cells
    by quantized cosine (floor(cos*1e9) desc, seed rank asc — the same
    bit-stable criterion as ivf_assign). One map-only pass; output
    (vec_id, embedding, cell, probe_rank). Pass ``centroids`` to share
    one trained quantizer with the assign pass."""
    import numpy as np

    if centroids is None:
        centroids = _ivf_centroids(emb, n_cells)
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                                   LongType, StructField, StructType)
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("cell", IntegerType(), False),
        StructField("probe_rank", IntegerType(), False),
    ])

    def probe(it):
        import pandas as pd
        cent = bc.value
        for pdf in it:
            if len(pdf) == 0:  # empty Arrow batch: nothing to probe
                continue
            Q = np.array([list(e) for e in pdf["embedding"]],
                         dtype=np.float64)
            Qn = Q / np.sqrt((Q * Q).sum(axis=1, keepdims=True))
            cos_q = np.floor((Qn @ cent.T) * 1_000_000_000)
            out = []
            for i in range(len(pdf)):
                order = np.lexsort((np.arange(cent.shape[0]), -cos_q[i]))
                for r, c in enumerate(order[:nprobe]):
                    out.append((pdf["vec_id"].iloc[i],
                                pdf["embedding"].iloc[i], int(c), r))
            yield pd.DataFrame(
                out, columns=["vec_id", "embedding", "cell", "probe_rank"])

    return emb.select("vec_id", "embedding").mapInPandas(probe, schema)


def ann_ivf_topk(emb: DataFrame, k: int = 5, n_cells: int = 8,
                 nprobe: int = 1) -> DataFrame:
    """Approximate top-k via IVF cells (data-adaptive partitioning; the
    scale path when hyperplane buckets split true neighbors — cells
    follow the data distribution).

    ``nprobe`` is the classic IVF recall/cost knob: queries search their
    ``nprobe`` nearest cells (index vectors still live in exactly one
    cell, so no candidate is generated twice). nprobe=1 keeps the
    symmetric single-shuffle bucket rerank; nprobe>1 unions tagged
    query-probes with the cell-assigned index and reranks per cell, then
    takes the global top-k with one window — two shuffles total (cell,
    then vec_id)."""
    import numpy as np

    if nprobe <= 1:
        return _topk_within_bucket(ivf_assign(emb, n_cells), k)

    # ONE trained quantizer shared by both passes (computing it twice
    # would run a redundant seed job and ship two broadcasts)
    C = _ivf_centroids(emb, n_cells)
    index = ivf_assign(emb, n_cells, centroids=C).select(
        F.col("bucket").alias("cell"), "vec_id", "embedding",
        F.lit(0).alias("is_query"))
    probes = ivf_probe_assign(emb, n_cells, nprobe, centroids=C).select(
        "cell", "vec_id", "embedding", F.lit(1).alias("is_query"))
    tagged = index.unionByName(probes)

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cos_pm", LongType(), False),
    ])

    def per_cell(pdf):
        import pandas as pd
        q = pdf[pdf["is_query"] == 1]
        c = pdf[pdf["is_query"] == 0]
        if len(q) == 0 or len(c) == 0:
            return pd.DataFrame(columns=["vec_id", "neighbor_id", "cos_pm"])
        Q = np.array([list(e) for e in q["embedding"]], dtype=np.float64)
        M = np.array([list(e) for e in c["embedding"]], dtype=np.float64)
        q_ids = q["vec_id"].to_numpy(dtype=np.int64)
        c_ids = c["vec_id"].to_numpy(dtype=np.int64)
        cos = (Q @ M.T) / np.outer(np.sqrt((Q * Q).sum(axis=1)),
                                   np.sqrt((M * M).sum(axis=1)))
        cos_pm = np.floor(cos * 1_000_000).astype(np.int64)
        out = [(qid, cid, s)
               for qid, cid, s, _r in _topk_against(q_ids, cos_pm, c_ids, k)]
        return pd.DataFrame(out, columns=["vec_id", "neighbor_id", "cos_pm"])

    partial = tagged.groupBy("cell").applyInPandas(per_cell, schema)
    from pyspark.sql.window import Window
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_pm"), F.asc("neighbor_id"))
    return (partial.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k))


# ----------------------------------------------------------- IVF-PQ ANN

N_PQ_SUBSPACES = 8
N_PQ_CODES = 16


def _pq_codebook(emb: DataFrame, n_codes: int = N_PQ_CODES):
    """Deterministic PQ codebook seeds: the ``n_codes`` RAW vectors with
    the smallest md5(vec_id) digests (same content-stable seeding rule
    as ``_ivf_centroids``, but un-normalized — PQ quantizes raw
    subvector geometry; the coarse IVF quantizer handles direction).
    Subspace m's codeword ``c`` is row c's dims [m*sub, (m+1)*sub)."""
    import numpy as np

    seeds = (emb.select("vec_id", "embedding",
                        F.md5(F.col("vec_id").cast("string")).alias("h"))
             .orderBy("h").limit(n_codes).collect())
    if not seeds:  # empty corpus: 0-code codebook, not a crash
        return np.zeros((0, 1), dtype=np.float64)
    return np.array([list(r["embedding"]) for r in seeds], dtype=np.float64)


def _pq_term_lut(X, codebook, n_subspaces: int):
    """Quantized per-(vector, codeword, subspace) squared-L2 partials:
    lut[i, m, c] = sum over subspace m's dims of
    floor((x_d - c_d)^2 * 1e6). The floor happens PER DIMENSION, so the
    sum is an integer sum — order-independent, hence bit-identical
    between numpy here and the SQL oracle's list fold (a float-sum of 8
    doubles would round differently under numpy's pairwise summation
    vs SQL's sequential fold)."""
    import numpy as np

    n_codes, dims = codebook.shape
    sub = dims // n_subspaces
    # (B, K, D) per-dimension quantized terms, then per-subspace sums
    term = np.floor(((X[:, None, :] - codebook[None, :, :]) ** 2)
                    * 1_000_000).astype(np.int64)
    return (term.reshape(len(X), n_codes, n_subspaces, sub)
            .sum(axis=3).transpose(0, 2, 1))  # (B, M, K)


def ivfpq_encode(emb: DataFrame, n_cells: int = 8,
                 n_subspaces: int = N_PQ_SUBSPACES,
                 n_codes: int = N_PQ_CODES,
                 centroids=None, codebook=None) -> DataFrame:
    """IVF cell assignment + PQ encoding in ONE map-only Arrow pass:
    (vec_id, embedding, cell, codes array<int>). codes[m] = argmin over
    the codebook of the quantized subspace-m squared-L2 (first-min rule
    == the SQL twin's ``d_pm ASC, code ASC`` tiebreak; codebook rows are
    in md5-seed order). At 10^12 vectors this is the pass that shrinks
    the index to n_subspaces bytes + 1 cell id per vector — the
    inverted-file + product-quantization layout of Jégou et al. 2011
    ("Product quantization for nearest neighbor search", public), which
    is the standard architecture at this scale."""
    import numpy as np

    if centroids is None:
        centroids = _ivf_centroids(emb, n_cells)
    if codebook is None:
        codebook = _pq_codebook(emb, n_codes)
    sc = emb.sparkSession.sparkContext
    bc_cent = sc.broadcast(centroids)
    bc_cb = sc.broadcast(codebook)

    from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                                   LongType, StructField, StructType)
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("cell", IntegerType(), False),
        StructField("codes", ArrayType(IntegerType()), False),
    ])

    def encode(it):
        import pandas as pd
        cent, cb = bc_cent.value, bc_cb.value
        # chunk the Arrow batch: _pq_term_lut's (B, K, D) per-dimension
        # tensor at the default 10k-row batch would be ~100s of MB per
        # task; 1024-row chunks keep it O(10 MB) regardless of batch
        # size (the same bound the query-side query_chunk enforces).
        # Row-independent math, so chunking never changes a code.
        chunk = 1024
        for pdf in it:
            for lo in range(0, len(pdf), chunk):
                sub = pdf.iloc[lo:lo + chunk]
                X = np.array([list(e) for e in sub["embedding"]],
                             dtype=np.float64)
                Xn = X / np.sqrt((X * X).sum(axis=1, keepdims=True))
                # identical quantized cell criterion to ivf_assign
                cos_q = np.floor((Xn @ cent.T) * 1_000_000_000)
                cells = cos_q.argmax(axis=1).astype(np.int32)
                lut = _pq_term_lut(X, cb, n_subspaces)     # (B, M, K)
                codes = lut.argmin(axis=2).astype(np.int32)  # first-min
                yield pd.DataFrame({
                    "vec_id": sub["vec_id"].reset_index(drop=True),
                    "embedding": sub["embedding"].reset_index(drop=True),
                    "cell": cells, "codes": list(codes)})

    return emb.select("vec_id", "embedding").mapInPandas(encode, schema)


def ann_ivfpq_topk(emb: DataFrame, k: int = 5, n_cells: int = 8,
                   n_subspaces: int = N_PQ_SUBSPACES,
                   n_codes: int = N_PQ_CODES,
                   query_chunk: int = 1024) -> DataFrame:
    """IVF-PQ asymmetric-distance top-k — the 10^12-vector scale path:
    candidates bounded by the IVF cell, scored against PQ codes via an
    ADC lookup table (query builds an (M x K) integer LUT once, every
    candidate costs M integer gathers — no float math per pair, and the
    index stores M small ints per vector instead of dims floats).
    Ranking: quantized squared L2 ASC, neighbor_id ASC. One shuffle
    (the cell key); queries are chunked so the (chunk x cell x M)
    gather tensor stays O(MBs) however large a cell gets.

    Exactness contract with the SQL oracle: every arithmetic step is
    floor-quantized per dimension then integer-summed (see
    ``_pq_term_lut``), so the DuckDB twin reproduces scores exactly."""
    import numpy as np

    C = _ivf_centroids(emb, n_cells)
    cb = _pq_codebook(emb, n_codes)
    encoded = ivfpq_encode(emb, n_cells, n_subspaces, n_codes,
                           centroids=C, codebook=cb)
    bc_cb = emb.sparkSession.sparkContext.broadcast(cb)

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("adc_pm", LongType(), False),
        StructField("rnk", LongType(), False),
    ])

    def per_cell(pdf):
        import pandas as pd
        if len(pdf) < 2:
            return pd.DataFrame(columns=["vec_id", "neighbor_id",
                                         "adc_pm", "rnk"])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        X = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
        codes = np.array([list(c) for c in pdf["codes"]], dtype=np.int64)
        m_idx = np.arange(n_subspaces)
        out = []
        for lo in range(0, len(ids), query_chunk):
            hi = min(lo + query_chunk, len(ids))
            lut = _pq_term_lut(X[lo:hi], bc_cb.value, n_subspaces)
            # adc[i, j] = sum_m lut[i, m, codes[j, m]] — integer gathers:
            # index arrays (M,) x (B, M) broadcast to (B, M), applied to
            # lut's trailing two axes -> (chunk, B, M), then sum over M
            adc = lut[:, m_idx[None, :], codes].sum(axis=2)
            for qi in range(hi - lo):
                mask = ids != ids[lo + qi]
                cand_ids, cand = ids[mask], adc[qi][mask]
                order = np.lexsort((cand_ids, cand))[:k]
                out.extend((ids[lo + qi], cand_ids[j], cand[j], r)
                           for r, j in enumerate(order, start=1))
        return pd.DataFrame(out, columns=["vec_id", "neighbor_id",
                                          "adc_pm", "rnk"])

    return (encoded.groupBy("cell").applyInPandas(per_cell, schema))


def ann_ivfpq_refine_topk(emb: DataFrame, k: int = 5, refine: int = 32,
                          n_cells: int = 8,
                          n_subspaces: int = N_PQ_SUBSPACES,
                          n_codes: int = N_PQ_CODES,
                          query_chunk: int = 1024) -> DataFrame:
    """IVF-PQ with an exact REFINE stage — the production IVFPQ+refine
    layout: per query, the cheap ADC integer scan shortlists the
    ``refine`` best candidates (by quantized distance, neighbor_id
    tiebreak), then ONLY those pay an exact cosine, and the top-k is
    taken on the exact score. Recovers the recall the PQ distortion
    loses (up to the IVF cell-restriction ceiling — compare
    ``recall_at_5_ivfpq`` vs ``recall_at_5_ivfpq_refine`` vs
    ``recall_at_5_ivf_nprobe1`` in the bench record) while still
    scanning the cell with M-byte codes: exact distances touch
    ``refine`` vectors per query, not |cell|. Measured on the sf0.1
    synthetic embeddings (isotropic — near-worst-case for PQ, no
    cluster structure for the codebook to exploit): recall@5
    0.062 (no refine) -> 0.168 / 0.216 / 0.249 at refine 32/64/128 vs
    the 0.259 in-cell ceiling; real corpora with cluster structure sit
    far closer to the ceiling at small ``refine``. Same single cell-key
    shuffle, no joins; output matches the other ANN paths
    (vec_id, neighbor_id, cos_pm, rnk) so the recall harness and
    oracle conventions carry over."""
    import numpy as np

    C = _ivf_centroids(emb, n_cells)
    cb = _pq_codebook(emb, n_codes)
    encoded = ivfpq_encode(emb, n_cells, n_subspaces, n_codes,
                           centroids=C, codebook=cb)
    bc_cb = emb.sparkSession.sparkContext.broadcast(cb)

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("vec_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("cos_pm", LongType(), False),
        StructField("rnk", LongType(), False),
    ])

    def per_cell(pdf):
        import pandas as pd
        if len(pdf) < 2:
            return pd.DataFrame(columns=["vec_id", "neighbor_id",
                                         "cos_pm", "rnk"])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        X = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
        codes = np.array([list(c) for c in pdf["codes"]], dtype=np.int64)
        nrm = np.sqrt((X * X).sum(axis=1))
        m_idx = np.arange(n_subspaces)
        out = []
        for lo in range(0, len(ids), query_chunk):
            hi = min(lo + query_chunk, len(ids))
            lut = _pq_term_lut(X[lo:hi], bc_cb.value, n_subspaces)
            adc = lut[:, m_idx[None, :], codes].sum(axis=2)
            for qi in range(hi - lo):
                q = lo + qi
                # integer index of the non-self candidates: the exact
                # stage below gathers `refine` ROWS of X, never a
                # |cell|-wide boolean-masked copy per query (which would
                # make the refine pass O(|cell|^2 x dims) in memory
                # traffic on exactly the big skewed cells it exists for)
                idx = np.flatnonzero(ids != ids[q])
                cand_ids, cand_adc = ids[idx], adc[qi][idx]
                short = np.lexsort((cand_ids, cand_adc))[:refine]
                sel = idx[short]
                sids = ids[sel]
                # exact cosine only for the shortlist (gather rows)
                Xc = X[sel]
                cos = (X[q] @ Xc.T) / (nrm[q] * np.sqrt((Xc * Xc)
                                                        .sum(axis=1)))
                cos_pm = np.floor(cos * 1_000_000).astype(np.int64)
                order = np.lexsort((sids, -cos_pm))[:k]
                out.extend((ids[q], sids[j], cos_pm[j], r)
                           for r, j in enumerate(order, start=1))
        return pd.DataFrame(out, columns=["vec_id", "neighbor_id",
                                          "cos_pm", "rnk"])

    return (encoded.groupBy("cell").applyInPandas(per_cell, schema))


def embedding_near_dupes(emb: DataFrame, threshold_pm: int = 950_000) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via the LSH
    buckets — the embedding leg of the dedup suite. Same bucket-grouped
    BLAS pattern as _topk_within_bucket."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType
    schema = StructType([
        StructField("vec_a", LongType(), False),
        StructField("vec_b", LongType(), False),
        StructField("cos_pm", LongType(), False),
    ])

    def per_bucket(pdf):
        import pandas as pd
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(columns=["vec_a", "vec_b", "cos_pm"])
        M = np.array([list(e) for e in pdf["embedding"]], dtype=np.float64)
        nrm = np.sqrt((M * M).sum(axis=1))
        cos_pm = np.floor((M @ M.T) / np.outer(nrm, nrm)
                          * 1_000_000).astype(np.int64)
        ii, jj = np.where(cos_pm >= threshold_pm)
        out = [(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])),
                int(cos_pm[i][j]))
               for i, j in zip(ii, jj) if ids[i] < ids[j]]
        return pd.DataFrame(out, columns=["vec_a", "vec_b", "cos_pm"])

    return (lsh_bucket(emb).select("vec_id", "bucket", "embedding")
            .groupBy("bucket").applyInPandas(per_bucket, schema))


def semantic_dedup_clusters(emb: DataFrame,
                            threshold_pm: int = 950_000) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", public): cluster high-cosine embedding pairs into
    connected components and keep ONE representative per component —
    the embedding-space twin of ``ops.dedup.dedup_clusters``.

    Pairs come from the LSH-bucketed BLAS kernel
    (``embedding_near_dupes`` — candidates bounded per bucket, never
    all-pairs); components from the shared CC engine (driver union-find
    fast path under its size threshold, pointer-jumping loop above it);
    representative = min vec_id. Returns (vec_id, cluster_id,
    is_keeper) for EVERY vector — singletons are their own keepers."""
    from propertygraph_spark.pipeline.canonicalize import (
        connected_components)

    pairs = (embedding_near_dupes(emb, threshold_pm)
             .select(F.col("vec_a").alias("src"),
                     F.col("vec_b").alias("dst")))
    comp = connected_components(pairs)
    # unbounded output: no terminal orderBy (the oracle hash compare is
    # order-insensitive; a global sort would be a pointless exchange)
    return (emb.select("vec_id")
            .join(comp.withColumnRenamed("id", "vec_id"), "vec_id", "left")
            .select("vec_id",
                    F.coalesce("component", "vec_id").alias("cluster_id"))
            .withColumn("is_keeper",
                        (F.col("cluster_id") == F.col("vec_id"))
                        .cast("int")))


def centroid_by_label(emb: DataFrame) -> DataFrame:
    """Per-label centroid + dispersion: element-wise mean via posexplode +
    groupBy (the classic columnar unpivot — shuffles (label, dim) keyed
    partial sums, never whole vectors).

    Each element is integer-scaled (floor(x * 1e6) as BIGINT) BEFORE the
    sum: integer addition is associative, so partial-aggregation order can
    never flip the result — floor-of-float-sum is a last-ulp parity flake
    between engines."""
    d = emb.select("vec_id", "label",
                   F.posexplode("embedding").alias("dim", "x"))
    x_pm = F.floor(F.col("x").cast("double") * 1000000).cast("long")
    return (d.groupBy("label", "dim")
            .agg(F.sum(x_pm).alias("sum_x_pm"),
                 F.count("*").alias("n"))
            .filter(F.col("dim") < 4))


def quantize_int8(emb: DataFrame) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the storage
    path for training-data pipelines: 4x smaller than float32). Pure
    Catalyst: per-vector scale = 127 / max|x|, code_i = floor(x_i * scale
    + 0.5) (explicit half-up — round() differs between engines on ties).
    Emits the scale (per-micro) and code checksums so the oracle can
    verify the full codebook without materializing arrays."""
    absmax = F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))
    d = emb.select("vec_id", "embedding", absmax.alias("absmax"))
    scale = F.when(F.col("absmax") > 0, 127.0 / F.col("absmax")) \
             .otherwise(F.lit(0.0))
    d = d.withColumn("scale", scale)
    codes = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * F.col("scale") + 0.5)
        .cast("int"))
    return (d.withColumn("codes", codes)
            .select(
                "vec_id",
                F.floor(F.col("scale") * 1_000_000).cast("long")
                .alias("scale_pm"),
                F.aggregate("codes", F.lit(0).cast("long"),
                            lambda acc, c: acc + c).alias("code_sum"),
                F.aggregate("codes", F.lit(0).cast("long"),
                            lambda acc, c: acc + F.abs(c))
                .alias("code_abs_sum"),
                F.array_max("codes").alias("code_max"),
                F.array_min("codes").alias("code_min")))


def matryoshka_truncate(emb: DataFrame, dims: int = 8) -> DataFrame:
    """Matryoshka-style embedding truncation: keep the first ``dims``
    dimensions and report how much L2 energy survives (per-mille) plus
    both norms as per-micro integers. Pure Catalyst sequential folds
    (F.aggregate == DuckDB list_sum-of-list_transform fold order, the
    cross-engine-stable float form); map-only at any scale — the
    downstream ANN ops run unchanged on the truncated column."""
    v2 = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"))
    full = v2(F.col("embedding"))
    trunc = v2(F.slice("embedding", 1, dims))
    return emb.select(
        "vec_id",
        F.lit(dims).cast("long").alias("dims_kept"),
        F.floor(F.sqrt(full) * 1_000_000).cast("long")
        .alias("norm_full_pm"),
        F.floor(F.sqrt(trunc) * 1_000_000).cast("long")
        .alias("norm_trunc_pm"),
        F.when(full > 0, F.floor(trunc * 1000 / full)).otherwise(0)
        .cast("long").alias("energy_kept_pm"))


def kmeans_cells(emb: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """Lloyd's k-means over the embedding table in EXACT integer
    arithmetic — the clustering primitive behind IVF training,
    SemDeDup-style cluster pruning and corpus cartography, made
    bit-reproducible across engines and cluster sizes: vectors quantize
    to milli-units (floor(x*1000 + 0.5), the codebase's explicit
    half-up), init centroids are the md5(vec_id)-ordered first k
    vectors (the IVF seeding rule), assignment is argmin integer
    squared Euclidean distance with ties to the LOWER cell id, and the
    update is the per-dimension integer mean (floor). Empty cells keep
    their previous centroid. Returns (cell, n_members, inertia) from a
    final assignment against the iterated centroids.

    Scale shape: centroids are a bounded index artifact (k x d ints —
    collected and broadcast into the assignment expression exactly like
    the trained IVF quantizer); each iteration is one map-only
    assignment + one (cell, dim)-keyed integer-sum aggregation whose
    output is k*d rows regardless of corpus size. No floats anywhere
    after quantization, so summation order cannot show."""
    q = emb.select("vec_id", F.expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000"
        " + 0.5) as bigint))").alias("v")).localCheckpoint(eager=False)
    seeds = (q.select("v", F.md5(F.col("vec_id").cast("string")).alias("h"))
             .orderBy("h").limit(k).collect())
    cents = [list(r["v"]) for r in seeds]
    kk = len(cents)  # corpus smaller than k degrades cleanly

    def enc_col(cs) -> F.Column:
        """min over cells of d2 * kk + cell — lexicographic (d2, cell)
        argmin in one BIGINT (d2 <= (2*max_milli)^2 * dims ~ 2.6e8 at
        unit-norm 64-dim inputs, nowhere near overflow)."""
        terms = []
        for ci, c in enumerate(cs):
            arr = F.array(*[F.lit(int(x)).cast("long") for x in c])
            d2 = F.aggregate(
                F.zip_with("v", arr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"), lambda acc, x: acc + x)
            terms.append(d2 * kk + ci)
        return F.least(*terms) if len(terms) > 1 else terms[0]

    for _ in range(iters):
        asg = (q.select("v", enc_col(cents).alias("enc"))
               .select("v", F.expr(f"enc % {kk}").alias("cell")))
        upd = (asg.select("cell", F.posexplode("v").alias("dim", "val"))
               .groupBy("cell", "dim")
               .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
               .collect())
        by_cell: dict = {}
        for r in upd:
            s, n = int(r["s"]), int(r["n"])
            # truncate toward zero (Python // floors; SQL integer
            # division truncates — match the oracle on negative sums)
            by_cell.setdefault(r["cell"], {})[r["dim"]] = \
                s // n if s >= 0 else -((-s) // n)
        cents = [
            [by_cell[ci][d] for d in range(len(cents[ci]))]
            if ci in by_cell else cents[ci]
            for ci in range(kk)]
    final = (q.select(enc_col(cents).alias("enc"))
             .select(F.expr(f"enc % {kk}").alias("cell"),
                     F.expr(f"enc div {kk}").alias("d2")))
    return (final.groupBy("cell")
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.sum("d2").cast("long").alias("inertia"))
            .select(F.col("cell").cast("long"), "n_members", "inertia")
            .orderBy("cell"))


def sign_codes(emb: DataFrame) -> DataFrame:
    """64-bit binary sign quantization (the RaBitQ/'binary embedding'
    compression point): bit d of the code is sign(embedding[d]) > 0,
    packed into two BIGINT halves (sig_lo dims 0-31, sig_hi dims
    32-63 — a single 64-bit word would need bit 63 and overflow signed
    arithmetic on both engines). Pure Catalyst — one sequential
    aggregate per half, no UDF; the identical integer expression runs
    in the SQL twin."""
    def half(lo: int) -> F.Column:
        return F.expr(
            f"aggregate(sequence({lo}, {lo + 31}), 0L, (acc, d) -> "
            f"acc + CASE WHEN element_at(embedding, d + 1) > 0 "
            f"THEN shiftleft(1L, d - {lo}) ELSE 0L END)")
    return emb.select("vec_id", "embedding",
                      half(0).alias("sig_lo"), half(32).alias("sig_hi"))


def ann_sign_topk(emb: DataFrame, k: int = 5,
                  shortlist: int = 32) -> DataFrame:
    """ANN via binary sign codes + exact rerank: Hamming distance over
    the 64-bit sign code is the cheap proxy (16 bytes/vector — a 16x
    compression of the 64-float vector), the ``shortlist`` nearest
    codes per query are then reranked by EXACT cosine, keeping k.

    Scale shape: the code table (vec_id, sig_lo, sig_hi) is collected
    and broadcast ONCE — 16 bytes/vector means 10^8 vectors fit in
    ~1.6 GB, far beyond where the raw vectors stopped broadcasting; at
    10^9+ the same pattern shards into code blocks exactly like
    cosine_topk's index blocks (per-block shortlists union, then one
    rank — omitted here, the block machinery is cosine_topk's).
    Queries stream through mapInArrow: per Arrow batch ONE vectorized
    xor + byte-table popcount against the whole code matrix (numpy has
    no int64 popcount until 2.x; a 256-entry uint8 lookup over the
    bytes view is branch-free and allocation-bounded), per-query
    top-``shortlist`` by (hamming, neighbor_id). The rerank joins the
    shortlist back to the embeddings on the UNIQUE vec_id key and
    scores with the SEQUENTIAL Catalyst fold — bit-identical to the
    oracle's list_sum, no BLAS reassociation in the checked output.
    """
    import numpy as np
    import pyarrow as pa

    coded = sign_codes(emb)
    rows = coded.select("vec_id", "sig_lo", "sig_hi").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    lo = np.array([r["sig_lo"] for r in rows], dtype=np.int64)
    hi = np.array([r["sig_hi"] for r in rows], dtype=np.int64)
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((ids, lo, hi))
    pop = np.array([bin(i).count("1") for i in range(256)],
                   dtype=np.uint16)

    def per_batch(it):
        c_ids, c_lo, c_hi = bc.value
        for batch in it:
            q_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            q_lo = batch.column("sig_lo").to_numpy(zero_copy_only=False)
            q_hi = batch.column("sig_hi").to_numpy(zero_copy_only=False)
            out_q, out_n, out_h = [], [], []
            for qi in range(len(q_ids)):
                x = (q_lo[qi] ^ c_lo).view(np.uint8).reshape(-1, 8)
                y = (q_hi[qi] ^ c_hi).view(np.uint8).reshape(-1, 8)
                ham = pop[x].sum(axis=1) + pop[y].sum(axis=1)
                mask = c_ids != q_ids[qi]
                cand_ids, cand_h = c_ids[mask], ham[mask]
                order = np.lexsort((cand_ids, cand_h))[:shortlist]
                out_q.extend([q_ids[qi]] * len(order))
                out_n.extend(cand_ids[order])
                out_h.extend(cand_h[order].astype(np.int64))
            yield pa.RecordBatch.from_pydict(
                {"vec_id": out_q, "neighbor_id": out_n, "hamming": out_h})

    short = coded.select("vec_id", "sig_lo", "sig_hi").mapInArrow(
        per_batch, "vec_id long, neighbor_id long, hamming long")
    dot = ("aggregate(zip_with(qe, ne, (x, y) -> "
           "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, x) -> a + x)")
    nrm = ("sqrt(aggregate(transform({0}, x -> "
           "CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, x) -> a + x))")
    q_emb = emb.select(F.col("vec_id").alias("vec_id"),
                       F.col("embedding").alias("qe"))
    n_emb = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").alias("ne"))
    from pyspark.sql import Window
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_pm"),
                                             F.asc("neighbor_id"))
    return (short.join(q_emb, "vec_id").join(n_emb, "neighbor_id")
            .withColumn("cos_pm",
                        F.expr(f"CAST(floor({dot} / ({nrm.format('qe')} * "
                               f"{nrm.format('ne')}) * 1000000) AS BIGINT)"))
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k)
            .select("vec_id", "neighbor_id", "cos_pm", "rnk"))


def gram_int8(emb: DataFrame) -> DataFrame:
    """Distributed integer Gram matrix X^T X over the int8-quantized
    embedding column — the one-pass sufficient statistic corpus-scale
    PCA / whitening / linear-probe fits reduce to (the D x D Gram is
    all the driver-side eigendecomposition needs; the corpus itself
    never leaves the executors). Quantization uses ``quantize_int8``'s
    exact arithmetic (scale 127/absmax, half-up floor), so every sum
    is INTEGER: order-insensitive, overflow-safe to ~10^14 vectors at
    D=64, and bit-identical to the SQL twin — a float Gram would
    depend on reduction order.

    Scale shape: each Arrow batch computes its own D x D Gram with one
    BLAS matmul and emits D*(D+1)/2 upper-triangle partial rows; the
    only shuffle is the (i, j)-keyed sum of those partials — rows per
    partition are a function of D alone, independent of corpus size.
    Returns (i, j, dot_sum) for 0 <= i <= j < D."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, \
        StructType
    schema = StructType([
        StructField("i", IntegerType(), False),
        StructField("j", IntegerType(), False),
        StructField("dot_sum", LongType(), False),
    ])

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array([list(e) for e in pdf["embedding"]],
                         dtype=np.float64)
            absmax = np.abs(X).max(axis=1)
            scale = np.where(absmax > 0, 127.0 / absmax, 0.0)
            C = np.floor(X * scale[:, None] + 0.5).astype(np.int64)
            G = C.T @ C
            iu, ju = np.triu_indices(G.shape[0])
            yield pd.DataFrame({"i": iu.astype(np.int32),
                                "j": ju.astype(np.int32),
                                "dot_sum": G[iu, ju]})

    partials = emb.select("embedding").mapInPandas(batches, schema)
    return (partials.groupBy("i", "j")
            .agg(F.sum("dot_sum").alias("dot_sum")))


def pca_power(emb: DataFrame, iters: int = 8) -> DataFrame:
    """Top principal direction of the int8-quantized embedding corpus by
    INTEGER power iteration over the Gram matrix — the step that turns
    ``gram_int8``'s sufficient statistic into an actual component
    without ever loading the corpus on the driver. Starting from the
    all-1000 vector, each round computes u = G v (one bounded join +
    bounded agg over the D x D Gram rows) and renormalizes to milli
    scale by the max-abs entry: v' = (u * 1000) div max|u|. Every
    operation is BIGINT; integer division truncates toward zero in
    BOTH engines (Spark ``div``, DuckDB ``//`` — the kmeans_cells
    contract), so the DuckDB twin (an unrolled per-round CTE chain) is
    bit-identical. Returns (dim, v_milli) — the milli-scaled direction
    (sign follows the deterministic all-ones start; eigenvectors are
    sign-ambiguous by nature).

    Scale shape: the corpus is touched exactly ONCE (gram_int8's
    map-only partial Grams + one (i,j)-keyed sum); all ``iters``
    rounds run on the BOUNDED D x D table — D^2 join rows per round,
    corpus-size independent. Overflow bound: |u| <= D * n * 127^2 *
    1000, BIGINT-safe to n ~ 10^9 vectors at D = 64; past that,
    pre-scale the Gram by one integer div (same truncation contract)
    before iterating."""
    g = gram_int8(emb)
    sym = g.union(
        g.filter(F.col("i") != F.col("j"))
        .select(F.col("j").alias("i"), F.col("i").alias("j"), "dot_sum")
    ).localCheckpoint(eager=True)
    v = (sym.select("i").distinct()
         .withColumn("v", F.lit(1000).cast("long")))
    for _ in range(iters):
        u = (sym.join(v.select(F.col("i").alias("j"), "v"), "j")
             .groupBy("i")
             .agg(F.sum(F.col("dot_sum") * F.col("v")).alias("u")))
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m")).collect()[0]["m"]
        if not m:
            break
        # checkpoint the D-row vector per round: round R's plan must
        # not re-chain rounds 1..R-1's joins (plan growth dominated
        # the wall time before data did — measured 19 s -> ~2 s at
        # sf0.1 for 8 rounds over the same Gram)
        v = u.select("i", F.expr(f"(u * 1000) div {int(m)}")
                     .alias("v")).localCheckpoint(eager=True)
    return (v.select(F.col("i").cast("long").alias("dim"),
                     F.col("v").cast("long").alias("v_milli"))
            .orderBy("dim"))


def pca_project_hist(emb: DataFrame, iters: int = 8,
                     n_buckets: int = 16) -> DataFrame:
    """PCA projection histogram — the drift/separability surface that
    makes pca_power actionable: every embedding's int8 codes are
    projected onto the learned milli-scaled principal direction
    (integer dot product), bucketed into ``n_buckets`` fixed-width
    bins over the observed projection range, and counted per LABEL —
    how each class distributes along the corpus's dominant axis (the
    1-D view behind embedding-drift monitors and quick separability
    checks). All integer: codes are quantize_int8's exact arithmetic,
    the direction is pca_power's BIGINT vector, the bin rule is the
    curriculum/zorder fixed-width integer formula.

    Scale shape: the direction is a 64-entry literal (one bounded
    collect of the power iteration's output); projection is MAP-ONLY
    over the corpus; the range is one 1-row min/max aggregate (the
    engine's scalar-threshold pattern) and the histogram one
    bounded-key (label x bucket) agg."""
    vec = [int(r["v_milli"]) for r in pca_power(emb, iters).collect()]
    if not vec:
        return emb.sparkSession.createDataFrame(
            [], "label long, bucket long, n_vecs long")
    arr = "array(" + ", ".join(f"{x}L" for x in vec) + ")"
    absmax = F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, v: F.greatest(acc, F.abs(v.cast("double"))))
    d = emb.select("label", "embedding", absmax.alias("absmax"))
    scale = F.when(F.col("absmax") > 0, 127.0 / F.col("absmax")) \
             .otherwise(F.lit(0.0))
    codes = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * scale + 0.5).cast("long"))
    proj = F.expr(
        f"aggregate(zip_with(codes, {arr}, (c, w) -> c * w), "
        f"0L, (a, x) -> a + x)")
    p = d.withColumn("codes", codes).select("label", proj.alias("p"))
    row = p.agg(F.min("p").alias("mn"), F.max("p").alias("mx")) \
           .collect()[0]
    mn, mx = int(row["mn"]), int(row["mx"])
    bucket = F.expr(f"least({n_buckets - 1}, "
                    f"(p - {mn}) * {n_buckets} div {mx - mn + 1})")
    return (p.select(F.col("label").cast("long").alias("label"),
                     bucket.cast("long").alias("bucket"))
            .groupBy("label", "bucket")
            .agg(F.count("*").alias("n_vecs"))
            .orderBy("label", "bucket"))
