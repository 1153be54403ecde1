"""Corpus-curation queries (round 6): within-doc repetition signals and
leakage-safe dataset splitting. Operator library: operators/curation.py.

Complements the round-5 curation family: ``q_text_dup_ngram_frac``
measures CROSS-doc boilerplate; ``q_text_rep_ngram`` measures WITHIN-doc
repetition (the other half of the Gopher repetition filters), and
``q_split_leakage_safe`` closes the train/eval contamination loop that
``q_text_decontaminate`` detects — duplicates are forced into the same
split by hashing their cluster representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_open_source_spark.catalog import load_table
from etl_open_source_spark.operators import curation as C
from etl_open_source_spark.operators.sampling import sql_det_hash
from etl_open_source_spark.operators.text import ascii_fold
from etl_open_source_spark.registry import query


@query(
    "q_text_rep_ngram",
    oracle="""
WITH d AS (SELECT doc_id, string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS ws FROM documents),
g AS (
  -- correlated series (unnest form): exact at ANY document length —
  -- the old fixed GENERATE_SERIES(1, 2048) silently truncated long
  -- docs (caught by the round-10 multi-MB-document axis)
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
  FROM (SELECT doc_id, ws, unnest(generate_series(1, LEN(ws) - 1)) AS i FROM d)
),
c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS rep_pos,
       ROUND(CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt), 6) AS rep_frac,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_frac
FROM c GROUP BY doc_id
""",
    tags=("llm", "curation"),
)
def q_text_rep_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repeated-bigram fraction + top-bigram share (the Gopher
    repetition filters, Rae et al. 2021 §A1.1) — high values flag
    templated/spammy docs. Grams never cross docs, so both aggregates
    combine map-side and skew is bounded by doc length at any corpus
    size. The oracle's position series is CORRELATED (unnest of
    generate_series over each doc's own length), so the differential is
    exact at any document length — the multi-MB axis runs it on
    200 KB+ docs."""
    d = load_table(spark, sf_dir, "documents")
    return C.rep_ngram_stats(d, "doc_id", "text", n=2)


@query(
    "q_split_leakage_safe",
    oracle=f"""
WITH r AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS rep FROM documents
)
SELECT doc_id, rep,
       CASE WHEN ({sql_det_hash("rep")}) % 10000 < 9000
            THEN 'train' ELSE 'heldout' END AS split
FROM r
""",
    tags=("llm", "curation", "sampling"),
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 90/10 train/heldout split: the split coin is thrown
    on each doc's exact-duplicate cluster representative (min doc_id per
    identical text), so copies of a document can never straddle the
    split — the standard guard against eval contamination via dups.

    Costs one window shuffle, keyed here on the raw text for oracle
    parity; the 100 TB deployment should key the window on a 128-bit
    content hash (e.g. md5) instead so shuffle rows stay narrow —
    same clusters, same splits. The assignment itself is a scan-local
    deterministic hash. Near-dup safety composes the same way: feed
    connected_components(minhash_lsh_pairs(...)) reps into
    cluster_safe_split."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text")
    reps = d.select("doc_id", F.min("doc_id").over(w).alias("rep"))
    return C.cluster_safe_split(reps, "rep", train_frac=0.9).select(
        "doc_id", "rep", "split"
    )


@query(
    "q_text_hashvec",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS word FROM documents
)
SELECT doc_id,
       CAST(('0x' || SUBSTR(MD5(word), 1, 8)) AS BIGINT) % 64 AS bucket,
       COUNT(*) AS cnt
FROM w GROUP BY doc_id, bucket
""",
    tags=("llm", "curation"),
)
def q_text_hashvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing ("hashing trick") bag-of-words: each word maps to
    one of 64 buckets via an md5-prefix hash (md5 chosen because every
    engine computes it identically — cross-engine reproducible features),
    emitted long-form as (doc, bucket, count) so downstream model feeds
    pivot or sparse-assemble as they choose. Fixed dimensionality with no
    vocabulary table is the point at 100 TB: no fit pass, no vocab join,
    one map-side-combinable aggregate whose key space is bounded by
    docs x 64."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), " ")).alias("word")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("bigint"), F.lit(64)
    )
    return (
        words.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_text_normalize_ws",
    oracle="""
WITH messy AS (
  SELECT doc_id,
         '  ' || REPLACE(text, ' the ', '  the' || CHR(9) || ' ') || '
' AS raw
  FROM documents
),
norm AS (
  SELECT doc_id, raw,
         TRIM(REGEXP_REPLACE(raw, '\\s+', ' ', 'g')) AS clean
  FROM messy
)
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(raw, ' ')) AS BIGINT) AS raw_tokens,
       CAST(LEN(STRING_SPLIT(clean, ' ')) AS BIGINT) AS clean_tokens,
       CAST(LENGTH(raw) - LENGTH(clean) AS BIGINT) AS chars_removed,
       MD5(clean) AS clean_md5
FROM norm
""",
    tags=("llm", "curation"),
)
def q_text_normalize_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace normalization (operators/text.py normalize_ws) — the
    CCNet-style pre-tokenization cleanup every messy corpus needs BEFORE
    the engine's single-space tokenization contract applies (see the
    text.py module docstring). The fixture text is deliberately dirtied
    (leading spaces, doubled spaces, a tab, a trailing newline), then
    normalized; naive single-space token counts on the raw text overcount
    (empty-string tokens) while the cleaned text counts true words — the
    md5 pins the normalized bytes exactly in both engines.

    Scan-local regexp — zero shuffles at any scale; at 100 TB this runs
    fused into the ingest scan."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("  "),
        F.regexp_replace("text", " the ", "  the\t "),
        F.lit("\n"),
    )
    clean = F.trim(F.regexp_replace(raw, r"\s+", " "))
    return d.select(
        "doc_id",
        F.size(F.split(raw, " ")).cast("bigint").alias("raw_tokens"),
        F.size(F.split(clean, " ")).cast("bigint").alias("clean_tokens"),
        (F.length(raw) - F.length(clean)).cast("bigint").alias("chars_removed"),
        F.md5(clean).alias("clean_md5"),
    )


def _pq_codes_codebook(m: int = 4, k: int = 4, dsub: int = 16) -> list[list[list[float]]]:
    """Deterministic literal PQ codebook shared by the Spark query and its
    DuckDB oracle: every value is n/16 (4 fractional bits — exactly
    representable in binary AND in its shortest decimal repr), so the SQL
    literal parses to the bit-identical double on both engines."""
    return [
        [
            [((s * 131 + c * 17 + d * 7) % 97 - 48) / 16.0 for d in range(dsub)]
            for c in range(k)
        ]
        for s in range(m)
    ]


def _pq_codes_oracle(m: int = 4, k: int = 4, dsub: int = 16) -> str:
    """DuckDB SQL mirroring pq_encode step for step over the literal
    codebook — cast-to-double, left-to-right sum-of-squares fold (IEEE:
    the 0.0 seed is exact, so the fold equals Spark's aggregate), finite
    positive-norm filter, unit-normalize, per-subspace L2 argmin with
    first-minimum tie break (list_position == array_position: both return
    the FIRST match, 1-indexed)."""
    cb = _pq_codes_codebook(m, k, dsub)
    cb_sql = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(repr(x) for x in code) + "]" for code in sub) + "]"
            for sub in cb
        )
        + "]"
    )
    # one scalar INT column per subspace — never an array: the driver
    # hasher cannot digest nested types (test_oracle_contract.py pins
    # this registry-wide)
    code_exprs = [
        f"CAST(list_position(d{s}, list_aggregate(d{s}, 'min')) - 1 AS INTEGER)"
        f" AS code{s}"
        for s in range(m)
    ]
    # per-subspace distance arrays, one projection layer
    dist_cols = ", ".join(
        "["
        + ", ".join(
            "list_reduce([(un[{b}+CAST(i AS INT)] - cb[{s1}][{c1}][CAST(i AS INT)])"
            " * (un[{b}+CAST(i AS INT)] - cb[{s1}][{c1}][CAST(i AS INT)])"
            " FOR i IN generate_series(1, {dsub})], (a, b) -> a + b)".format(
                b=s * dsub, s1=s + 1, c1=c + 1, dsub=dsub
            )
            for c in range(k)
        )
        + f"] AS d{s}"
        for s in range(m)
    )
    return f"""
WITH cbt AS (SELECT {cb_sql} AS cb),
v AS (
  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb FROM embeddings
),
n AS (
  -- len(emb) > 0: DuckDB's list_reduce([]) is a hard error where
  -- Spark's aggregate folds the 0.0 seed to norm 0 (then drops the
  -- row); NULL arrays give len NULL and drop here too, matching the
  -- engine's NULL-norm drop. NULL elements / NaN / Inf propagate to a
  -- non-finite or NULL norm and fall to the isfinite filter below —
  -- same rows dropped on both sides.
  SELECT vec_id, emb,
         sqrt(list_reduce([x * x FOR x IN emb], (a, b) -> a + b)) AS nrm
  FROM v WHERE len(emb) > 0
),
u AS (
  SELECT vec_id, [x / nrm FOR x IN emb] AS un
  FROM n WHERE isfinite(nrm) AND nrm > 0
),
d AS (
  SELECT vec_id, {dist_cols} FROM u CROSS JOIN cbt
)
SELECT vec_id, {", ".join(code_exprs)}
FROM d
"""


@query(
    "q_sim_pq_codes",
    oracle=_pq_codes_oracle(),
    tags=("llm", "similarity"),
)
def q_sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode against a LITERAL codebook (m=4 x 4 codes) — the exact,
    driver-hashable half of the PQ pipeline (VERDICT r8 item 5): encode is
    deterministic scan-local arithmetic (slice → L2 fold → first-min
    argmin), so with the trained-k-means codebook replaced by a fixed
    literal, a DuckDB oracle can replay it bit-for-bit. q_sim_pq /
    q_sim_ivfpq keep the trained codebooks (rows-only by design); this row
    proves the encode arithmetic they share. Zero exchanges: codebook
    ships as a literal expression, the encode fuses into the scan. The
    m codes unwrap to scalar INT columns (code0..code3) — the driver
    hasher can't digest array cells (oracle-contract pin)."""
    from etl_open_source_spark.operators import similarity as S2

    e = load_table(spark, sf_dir, "embeddings")
    enc = S2.pq_encode(e, _pq_codes_codebook())
    return enc.select(
        "vec_id", *[enc["codes"][s].alias(f"code{s}") for s in range(4)]
    )


@query("q_sim_pq", oracle=None, tags=("llm", "similarity", "approx"))
def q_sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-5 (m=8 subspaces x 16 codes): corpus
    vectors live as 8-code signatures (vs 64 floats — 32x compression)
    and queries score them by asymmetric distance (exact query subvector
    vs centroid, summed from literal-codebook lookups). Completes the ANN
    portfolio: brute force (q_sim_topk, exactness baseline), IVF
    (q_sim_ann, bucket pruning), sign-LSH (q_dedup_embedding, pair
    mining) — PQ is the memory-compression axis the others lack.

    Rows-only (k-means training is iterative, not SQL-expressible);
    recall@5 vs the exact baseline and encode determinism are pinned in
    tests/test_llm_ops.py. Scan-local encode/score: the only exchange is
    the per-query top-k window. Empty-input contract: a corpus with no
    usable vectors → empty result; the fit's own first-row probe raises
    EmptyTrainingSet and is mapped here, so non-empty runs pay no extra
    isEmpty() action (same as q_sim_ann — ADVICE r10)."""
    from etl_open_source_spark.operators import similarity as S2

    e = load_table(spark, sf_dir, "embeddings")
    try:
        books = S2.pq_train(e, m=8, k=16, seed=42)
    except S2.EmptyTrainingSet:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adist double, rnk bigint"
        )
    queries = e.filter(F.col("vec_id") < 50)
    return S2.pq_topk(queries, e, books, k=5, rerank=50).withColumnRenamed("rank", "rnk")


@query("q_sim_ivfpq", oracle=None, tags=("llm", "similarity", "approx"))
def q_sim_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-5 — the standard billion-scale composition, stacked
    from this repo's own pieces: k-means|| coarse centroids prune to 4 of
    16 buckets per query, PQ codes (m=8 x 16) stand in for raw vectors
    inside the probed buckets (ADC over codes), and only the 50-candidate
    shortlist touches raw floats for the exact cosine re-rank. Per-query
    cost: 16 probe scores + ~|C|/4 ADC lookups + 50 exact dots — vs |C|
    exact dots for q_sim_topk.

    Rows-only (two trained quantizers); recall floor and the
    bucket-pruning evidence are pinned in tests/test_llm_ops.py.
    Empty-input contract: a corpus with no usable vectors → empty
    result; the coarse fit's first-row probe raises EmptyTrainingSet
    and is mapped here (same as q_sim_ann — ADVICE r10)."""
    from etl_open_source_spark.operators import similarity as S2

    e = load_table(spark, sf_dir, "embeddings")
    try:
        centroids = S2.kmeans_centroids(e, n=16, seed=42)
    except S2.EmptyTrainingSet:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, adist double, rnk bigint"
        )
    books = S2.pq_train(e, m=8, k=16, seed=42)
    queries = e.filter(F.col("vec_id") < 50)
    return S2.ivfpq_topk(
        queries, e, centroids, books,
        k=5, nprobe=4, rerank=50,
    ).withColumnRenamed("rank", "rnk")


@query(
    "q_text_winnowing",
    oracle="""
WITH g AS (
  SELECT doc_id,
         [list_reduce([CAST(ascii(substr(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), CAST(i AS INT) + o, 1)) AS BIGINT)
                       FOR o IN generate_series(0, 4)],
                      (a, b) -> (a * 257 + b) % 2147483647)
          FOR i IN generate_series(1, GREATEST(0, length(text) - 4))] AS hs
  FROM documents
),
wins AS (
  SELECT doc_id,
         unnest([struct_pack(j := CAST(j AS INT),
                             win := list_slice(hs, CAST(j AS INT), CAST(j AS INT) + 3))
                 FOR j IN generate_series(1, GREATEST(1, len(hs) - 3))]) AS s
  FROM g WHERE len(hs) > 0
),
sel AS (
  SELECT DISTINCT doc_id,
         CAST(s.j - 1 + len(s.win)
              - list_position(list_reverse(s.win), list_aggregate(s.win, 'min'))
              + 1 AS BIGINT) AS pos,
         list_aggregate(s.win, 'min') AS fp
  FROM wins
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sel,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
       MIN(pos) AS first_pos,
       MAX(pos) AS last_pos,
       MD5(STRING_AGG(CAST(pos AS VARCHAR) || ':' || CAST(fp AS VARCHAR), '|'
                      ORDER BY CAST(pos AS VARCHAR) || ':' || CAST(fp AS VARCHAR))) AS set_md5
FROM sel GROUP BY doc_id
""",
    tags=("llm", "text", "dedup"),
)
def q_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm —
    operators/text.py::winnow_fingerprints): k=5 char-gram hashes, w=4
    windows, rightmost-min selection. Any shared substring of length
    >= k+w-1 = 8 chars between two documents shares a fingerprint, which
    is the guarantee position-based sampling lacks — the selection feeds
    the same inverted-index join as q_dedup_ngram for partial-overlap
    detection.

    The oracle digests each doc's full selection SET (count, distinct
    count, position span, md5 over the sorted pos:fp pairs) so every
    selected fingerprint and position is value-checked without shipping
    |selections| rows through the compare. Engine shape: scan-local
    array folds + one explode, then one doc-keyed aggregate — a single
    exchange over selection rows (~len/(w+1)·2 per doc)."""
    d = load_table(spark, sf_dir, "documents")
    from etl_open_source_spark.operators.text import winnow_fingerprints

    sel = winnow_fingerprints(d, "doc_id", "text", k=5, w=4)
    pair = F.concat(
        F.col("pos").cast("string"), F.lit(":"), F.col("fp").cast("string")
    )
    return (
        sel.select("doc_id", F.col("pos"), F.col("fp"), pair.alias("pair"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sel"),
            F.countDistinct("fp").cast("bigint").alias("n_distinct_fp"),
            F.min("pos").alias("first_pos"),
            F.max("pos").alias("last_pos"),
            F.md5(F.concat_ws("|", F.array_sort(F.collect_list("pair")))).alias(
                "set_md5"
            ),
        )
    )


@query(
    "q_dedup_winnowing",
    oracle="""
WITH g AS (
  SELECT doc_id,
         [list_reduce([CAST(ascii(substr(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), CAST(i AS INT) + o, 1)) AS BIGINT)
                       FOR o IN generate_series(0, 4)],
                      (a, b) -> (a * 257 + b) % 2147483647)
          FOR i IN generate_series(1, GREATEST(0, length(text) - 4))] AS hs
  FROM documents
),
wins AS (
  SELECT doc_id,
         unnest([struct_pack(j := CAST(j AS INT),
                             win := list_slice(hs, CAST(j AS INT), CAST(j AS INT) + 3))
                 FOR j IN generate_series(1, GREATEST(1, len(hs) - 3))]) AS s
  FROM g WHERE len(hs) > 0
),
fps AS (
  SELECT DISTINCT doc_id, list_aggregate(s.win, 'min') AS fp
  FROM wins
),
capped AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM fps a JOIN capped USING (fp) JOIN fps b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
FROM pairs WHERE n_shared >= 8
""",
    tags=("llm", "dedup"),
)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap candidate pairs from shared winnowing fingerprints
    — the positional complement to q_dedup_containment: winnowing
    GUARANTEES a fingerprint inside every shared run of >= k+w-1 chars,
    so a long quoted passage between otherwise-different documents
    surfaces even when whole-document resemblance and containment both
    stay low. Pairs sharing >= 8 fingerprints are candidates; the exact
    span verify (or q_dedup_containment) runs on candidates only. (The
    threshold is corpus-dependent: the synthetic fixture draws words
    from a tiny vocabulary, so at >= 2 nearly every pair matches — a
    real web corpus separates at low thresholds.)

    Scale shape: the SAME inverted-index discipline as q_dedup_ngram —
    distinct (doc, fp) postings, a max-doc-freq cap (50) drops
    boilerplate fingerprints whose posting lists would explode the
    self-join quadratically, then one equi-join on the fingerprint and a
    pair-count aggregate. Fingerprint count is already ~2/(w+1) of gram
    count by winnowing's density bound, so the index is ~3x smaller than
    the full-shingle one."""
    d = load_table(spark, sf_dir, "documents")
    from etl_open_source_spark.operators.text import winnow_fingerprints

    fps = winnow_fingerprints(d, "doc_id", "text", k=5, w=4).select(
        "doc_id", "fp"
    ).distinct()
    capped = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df")).filter(
        F.col("__df") <= 50
    ).select("fp")
    postings = fps.join(capped, "fp")
    a = postings.select(F.col("doc_id").alias("id_a"), "fp")
    b = postings.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 8)
    )
