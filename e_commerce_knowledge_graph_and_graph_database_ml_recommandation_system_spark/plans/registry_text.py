"""Registry entries: dedup / text-analysis / similarity operators over the
``documents`` and ``embeddings`` tables (the 100-TB training-data-pipeline
surface). Imported by plans/registry for side-effect registration.

Oracle-parity notes: shingling, MinHash and SimHash use the md5-based 32-bit
hash (functions/text.py) so DuckDB reproduces signatures bit-for-bit; all
SQL is generated from the same constants as the Spark code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import SQL_MD5_INT32, SQL_NORMALIZE, SQL_WORDS, sql_word_ngrams
from ..operators import components as cc
from ..operators import dedup as dd
from ..operators import similarity as sim
from ..operators import text_analysis as ta
from ..operators.dedup import MINHASH_PRIME, _A, _B
from ..sources.tables import load_table
from .registry import register, shared_positive_pairs, shared_sim_graph

# ---------------------------------------------------------------------------
# dedup: exact
# ---------------------------------------------------------------------------

_NORM = SQL_NORMALIZE.format(c="text")


@register(
    "dedup_exact",
    f"""
SELECT canonical_doc_id, dup_count FROM (
    SELECT MIN(doc_id) AS canonical_doc_id, COUNT(*) AS dup_count
    FROM (SELECT doc_id, {_NORM} AS norm FROM documents)
    GROUP BY norm
) WHERE dup_count > 1
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup(load_table(spark, "documents", sf_dir))


# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard
# ---------------------------------------------------------------------------

_SHINGLES_CTE = f"""
sh AS (
    SELECT DISTINCT doc_id, unnest({sql_word_ngrams("text", 3)}) AS shingle
    FROM documents
)
"""


@register(
    "dedup_ngram_jaccard",
    f"""
WITH {_SHINGLES_CTE.strip().replace("sh AS", "sh0 AS")},
-- hot-shingle cap mirrored from ngram_jaccard_pairs (df > 1000 dropped)
sh AS (
    SELECT * FROM sh0 WHERE shingle NOT IN (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.5
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs_shared(spark, sf_dir)


# ---------------------------------------------------------------------------
# dedup: MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------

_N_HASHES = 16
_SIG_EXPRS = ",\n           ".join(
    f"MIN(({_A[i]} * h + {_B[i]}) % {MINHASH_PRIME}) AS sig_{i}" for i in range(_N_HASHES)
)
_SIG_COALESCE = ",\n       ".join(
    f"COALESCE(sig_{i}, {MINHASH_PRIME}) AS sig_{i}" for i in range(_N_HASHES)
)

_MINHASH_CTE = f"""
{_SHINGLES_CTE.strip()},
hashed AS (
    SELECT doc_id, {SQL_MD5_INT32.format(c="shingle")} AS h FROM sh
),
rawsigs AS (
    SELECT doc_id,
           {_SIG_EXPRS}
    FROM hashed GROUP BY doc_id
),
sigs AS (
    SELECT d.doc_id,
       {_SIG_COALESCE}
    FROM documents d LEFT JOIN rawsigs USING (doc_id)
)
"""


def _clusters_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One near-dup cluster relation (simhash hamming<=3, exact-collapse
    pre-pass, pointer-jumping CC) per (app, sf_dir): FOUR registry entries
    (dedup_clusters, dedup_canonical_docs, corpus_curation,
    corpus_curation_semantic) each re-ran the eager CC closure in one
    verification pass (~4 s apiece at sf0.01 — r6 wall budget)."""
    from ._memo import memo

    return memo(
        spark,
        ("dedup_clusters_sh3", sf_dir),
        lambda: cc.dedup_clusters_collapsed(
            load_table(spark, "documents", sf_dir),
            lambda d: dd.simhash_near_dup(d, max_hamming=3),
        ),
    )


def _shingles_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (doc_id, shingle) relation per (app, sf_dir) — the base of the
    Jaccard/MinHash family; shared for the same verify-wall reason as
    _sigs_shared."""
    from ._memo import memo

    return memo(
        spark,
        ("doc_shingles_3", sf_dir),
        lambda: dd.doc_shingles(load_table(spark, "documents", sf_dir), 3),
    )


def _jaccard_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact shared-shingle Jaccard pair relation (n=3, threshold 0.5)
    per (app, sf_dir): dedup_ngram_jaccard and lsh_recall_audit otherwise
    each run the full capped shingle self-join in one verification pass
    (r6 verdict #1 — the recall audit recomputed the exact-pair relation
    the dedup suite already built)."""
    from ._memo import memo

    return memo(
        spark,
        ("jaccard_pairs_3_05", sf_dir),
        lambda: dd.ngram_jaccard_pairs(
            load_table(spark, "documents", sf_dir), n=3, threshold=0.5,
            sh=_shingles_shared(spark, sf_dir),
        ),
    )


def _lsh_verified_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One LSH-then-verify pair relation per (app, sf_dir), shared by
    minhash_lsh_verified and lsh_recall_audit (same verify-wall rationale
    as _jaccard_pairs_shared)."""
    from ._memo import memo

    return memo(
        spark,
        ("lsh_verified_3_05", sf_dir),
        lambda: dd.minhash_lsh_verified(
            load_table(spark, "documents", sf_dir), n=3, num_hashes=_N_HASHES,
            bands=_BANDS, threshold=0.5,
            sigs=_sigs_shared(spark, sf_dir), sh=_shingles_shared(spark, sf_dir),
        ),
    )


def _sigs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One MinHash signature table per (app, sf_dir): five registry entries
    (signatures, lsh_pairs, lsh_verified, recall audit, skew-cap audit)
    otherwise each re-run the shingle+hash pipeline in a single driver
    verification pass (verify-wall budget, r4 verdict #10)."""
    from ._memo import memo

    return memo(
        spark,
        ("minhash_sigs", sf_dir),
        lambda: dd.minhash_signatures(load_table(spark, "documents", sf_dir), n=3, num_hashes=_N_HASHES),
    )


@register(
    "minhash_signatures",
    f"""
WITH {_MINHASH_CTE.strip()}
SELECT * FROM sigs
""",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sigs_shared(spark, sf_dir)


_BANDS = 4
_ROWS = _N_HASHES // _BANDS
_BAND_SELECTS = "\n    UNION ALL\n    ".join(
    "SELECT doc_id, concat_ws('_', '{b}', {cols}) AS band_key FROM sigs".format(
        b=b, cols=", ".join(f"sig_{b * _ROWS + r}" for r in range(_ROWS))
    )
    for b in range(_BANDS)
)


@register(
    "minhash_lsh_pairs",
    f"""
WITH {_MINHASH_CTE.strip()},
banded0 AS (
    {_BAND_SELECTS}
),
-- hot-bucket cap mirrored from minhash_lsh_pairs (buckets > 1000 dropped)
banded AS (
    SELECT * FROM banded0 WHERE band_key NOT IN (
        SELECT band_key FROM banded0 GROUP BY band_key HAVING COUNT(*) > 1000
    )
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_pairs(
        load_table(spark, "documents", sf_dir),
        n=3, num_hashes=_N_HASHES, bands=_BANDS,
        sigs=_sigs_shared(spark, sf_dir),
    )


@register(
    "skew_cap_audit",
    f"""
WITH {_MINHASH_CTE.strip()},
banded0 AS (
    {_BAND_SELECTS}
),
basket AS (
    SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
hot_cust AS (
    SELECT c, COUNT(*) AS n FROM basket GROUP BY c HAVING COUNT(*) > 200
),
hot_shingle AS (
    SELECT shingle, COUNT(*) AS n FROM sh GROUP BY shingle HAVING COUNT(*) > 1000
),
hot_bucket AS (
    SELECT band_key, COUNT(*) AS n FROM banded0 GROUP BY band_key HAVING COUNT(*) > 1000
)
SELECT 'copurchase_hot_customers' AS cap, CAST(200 AS BIGINT) AS threshold,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hot_cust) AS hits,
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM hot_cust) AS rows_dropped
UNION ALL
SELECT 'jaccard_hot_shingles', CAST(1000 AS BIGINT),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hot_shingle),
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM hot_shingle)
UNION ALL
SELECT 'lsh_hot_buckets', CAST(1000 AS BIGINT),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM hot_bucket),
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM hot_bucket)
""",
)
def q_skew_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-silent-caps audit (COVERAGE.md rule): one row per production skew
    hatch — the copurchase hot-basket cap (registry_relational.py), the
    n-gram-Jaccard hot-shingle cap and the MinHash-LSH hot-bucket cap
    (operators/dedup.py) — reporting how many keys the cap fires on and how
    many underlying rows that drops, at the exact thresholds the registered
    queries run with. All-zero rows are the audit's PASS state at test SF;
    at 100 TB this is the query an operator runs before trusting a dedup
    or market-basket result."""
    docs = load_table(spark, "documents", sf_dir)
    # the distinct (customer, product) purchase incidence IS the memo-shared
    # positive-pair relation (r11 consolidation: this audit was the last
    # consumer re-deriving the identical orders⋈lineitem+distinct per run)
    basket = shared_positive_pairs(spark, sf_dir).select(
        F.col("ckey").alias("c"), F.col("pkey").alias("p")
    )

    def _cap_row(keyed: DataFrame, cap: str, threshold: int) -> DataFrame:
        hot = keyed.filter(F.col("n") > threshold)
        return hot.agg(
            F.lit(cap).alias("cap"),
            F.lit(threshold).cast("long").alias("threshold"),
            F.count(F.lit(1)).cast("long").alias("hits"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("rows_dropped"),
        )

    cust = basket.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
    shingle = (
        _shingles_shared(spark, sf_dir).groupBy("shingle").agg(F.count(F.lit(1)).alias("n"))
    )
    bucket = (
        dd.lsh_band_stack(docs, 3, _N_HASHES, _BANDS, sigs=_sigs_shared(spark, sf_dir))
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        _cap_row(cust, "copurchase_hot_customers", 200)
        .unionByName(_cap_row(shingle, "jaccard_hot_shingles", 1000))
        .unionByName(_cap_row(bucket, "lsh_hot_buckets", 1000))
    )


@register(
    "minhash_lsh_verified",
    f"""
WITH {_MINHASH_CTE.strip()},
banded0 AS (
    {_BAND_SELECTS}
),
banded AS (
    SELECT * FROM banded0 WHERE band_key NOT IN (
        SELECT band_key FROM banded0 GROUP BY band_key HAVING COUNT(*) > 1000
    )
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT cand.doc_a, cand.doc_b, COUNT(*) AS inter
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b AND sb.shingle = sa.shingle
    GROUP BY cand.doc_a, cand.doc_b
)
SELECT doc_a, doc_b,
       ROUND(COALESCE(inter.inter, 0) / (sa.n_sh + sb.n_sh - COALESCE(inter.inter, 0)), 6) AS jaccard
FROM cand
LEFT JOIN inter USING (doc_a, doc_b)
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(COALESCE(inter.inter, 0) / (sa.n_sh + sb.n_sh - COALESCE(inter.inter, 0)), 6) >= 0.5
""",
)
def q_minhash_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-then-verify near-dup: banded candidates + exact Jaccard on the
    candidate set only — the candidate-bounded verification join that
    replaces ngram_jaccard_pairs' corpus-bounded self-join at scale."""
    return _lsh_verified_shared(spark, sf_dir)


@register(
    "lsh_recall_audit",
    f"""
WITH {_MINHASH_CTE.strip()},
shc AS (
    SELECT * FROM sh WHERE shingle NOT IN (
        SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 1000
    )
),
ex_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shc GROUP BY doc_id),
ex_inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
exact AS (
    SELECT doc_a, doc_b,
           ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM ex_inter
    JOIN ex_sizes sa ON sa.doc_id = doc_a
    JOIN ex_sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(inter / (sa.n_sh + sb.n_sh - inter), 6) >= 0.5
),
banded0 AS (
    {_BAND_SELECTS}
),
banded AS (
    SELECT * FROM banded0 WHERE band_key NOT IN (
        SELECT band_key FROM banded0 GROUP BY band_key HAVING COUNT(*) > 1000
    )
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
v_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
v_inter AS (
    SELECT cand.doc_a, cand.doc_b, COUNT(*) AS inter
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b AND sb.shingle = sa.shingle
    GROUP BY cand.doc_a, cand.doc_b
),
found AS (
    SELECT doc_a, doc_b
    FROM cand
    LEFT JOIN v_inter USING (doc_a, doc_b)
    JOIN v_sizes sa ON sa.doc_id = doc_a
    JOIN v_sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(COALESCE(v_inter.inter, 0) / (sa.n_sh + sb.n_sh - COALESCE(v_inter.inter, 0)), 6) >= 0.5
)
SELECT CAST(LEAST(floor(round(e.jaccard * 10, 9)), 9) AS INT) AS jaccard_band,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       ROUND(AVG(CASE WHEN f.doc_a IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS recall
FROM exact e LEFT JOIN found f USING (doc_a, doc_b)
GROUP BY 1
""",
)
def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability: RECALL of the scale path (MinHash-LSH banded
    candidates, verified) against the exact shared-shingle Jaccard pair
    set, per jaccard decile — the audit a production dedup pipeline runs
    on a sample before trusting the banded join at full corpus scale
    (precision is already pytest-gated as verified ⊆ exact; recall is the
    quantity LSH actually trades). Fully hash-checked: both pair sets are
    deterministic, so even the recall ratios match DuckDB exactly."""
    exact = _jaccard_pairs_shared(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    found = (
        _lsh_verified_shared(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("found", F.lit(1))
    )
    j = exact.join(found, ["doc_a", "doc_b"], "left").na.fill({"found": 0})
    return j.groupBy(
        F.least(F.floor(F.round(F.col("jaccard") * 10, 9)), F.lit(9)).cast("int").alias("jaccard_band")
    ).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum("found").cast("long").alias("n_found"),
        F.round(F.avg(F.col("found").cast("double")), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# dedup: SimHash + banded near-dup
# ---------------------------------------------------------------------------

_SIMHASH_CTE = f"""
toks AS (
    SELECT DISTINCT doc_id, unnest({SQL_WORDS.format(c="text")}) AS tok FROM documents
),
th AS (
    SELECT doc_id, {SQL_MD5_INT32.format(c="tok")} AS h FROM toks WHERE tok <> ''
),
bitw AS (
    SELECT doc_id, j, SUM(((h >> j) & 1) * 2 - 1) AS w
    FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
    GROUP BY doc_id, j
),
sims AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN w > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
    FROM bitw GROUP BY doc_id
)
"""


@register(
    "simhash",
    f"""
WITH {_SIMHASH_CTE.strip()}
SELECT * FROM sims
""",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash(load_table(spark, "documents", sf_dir))


@register(
    "simhash_near_dup",
    f"""
WITH {_SIMHASH_CTE.strip()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_near_dup(load_table(spark, "documents", sf_dir), max_hamming=3)


# ---------------------------------------------------------------------------
# dedup: connected-component clustering + canonical selection
# ---------------------------------------------------------------------------

# transitive closure of the simhash near-dup pair graph via recursive
# min-label spread (UNION = set semantics bounds the walk); cluster id =
# min doc_id of the component — the same invariant the Spark
# connected_components operator converges to.
_CLUSTERS_CTE = f"""
{_SIMHASH_CTE.strip()},
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
sym AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
),
walk(id, comp) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT sym.d, walk.comp FROM walk JOIN sym ON walk.id = sym.s
),
comp AS (SELECT id AS doc_id, MIN(comp) AS cluster_id FROM walk GROUP BY id),
csize AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id)
"""


@register(
    "dedup_clusters",
    f"""
WITH RECURSIVE {_CLUSTERS_CTE.strip()}
SELECT doc_id, cluster_id, cluster_size FROM comp JOIN csize USING (cluster_id)
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-collapse first (provably identical output, enforced by the
    # uncollapsed oracle): pair volume scales with distinct content
    return _clusters_shared(spark, sf_dir)


_EN_SW_FWD = ", ".join(f"'{s}'" for s in ta.LANG_STOPWORDS["en"])

_QUALITY_SCORE_CTE = f"""
qual AS (
    SELECT doc_id,
           ROUND(LEAST(len({SQL_WORDS.format(c="text")}) / 20.0, 1.0) * 0.3
             + (1.0 - LEAST((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                            / NULLIF(CAST(length(text) AS DOUBLE), 0), 1.0)) * 0.2
             + LEAST(len(list_intersect(list_distinct({SQL_WORDS.format(c="text")}), [{_EN_SW_FWD}])) / 3.0, 1.0) * 0.3
             + COALESCE(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        / NULLIF(CAST(length(text) AS DOUBLE), 0), 0.0) * 0.2, 6) AS quality_score
    FROM documents
)
"""


@register(
    "dedup_canonical_docs",
    f"""
WITH RECURSIVE {_CLUSTERS_CTE.strip()},
{_QUALITY_SCORE_CTE.strip()},
ranked AS (
    SELECT comp.cluster_id, comp.doc_id, csize.cluster_size, qual.quality_score,
           ROW_NUMBER() OVER (PARTITION BY comp.cluster_id
                              ORDER BY qual.quality_score DESC, comp.doc_id ASC) AS rn
    FROM comp JOIN csize USING (cluster_id) JOIN qual USING (doc_id)
)
SELECT cluster_id, doc_id AS canonical_doc_id, cluster_size, quality_score
FROM ranked WHERE rn = 1
""",
)
def q_dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    clusters = _clusters_shared(spark, sf_dir)
    return cc.canonical_docs(clusters, ta.quality_scores(docs))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "token_stats",
    f"""
WITH w AS (SELECT doc_id, text, {SQL_WORDS.format(c="text")} AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS ws_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est_tokens,
       CAST(len(list_distinct(ws)) AS BIGINT) AS distinct_tokens,
       ROUND(len(list_distinct(ws)) / NULLIF(len(ws), 0), 6) AS ttr
FROM w
""",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = ta.token_stats(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        "bpe_est_tokens",
        F.col("distinct_tokens").cast("long").alias("distinct_tokens"),
        "ttr",
    )


_EN_SW = ", ".join(f"'{s}'" for s in ta.LANG_STOPWORDS["en"])


@register(
    "quality_scores",
    f"""
WITH base AS (
    SELECT doc_id, text,
           {SQL_WORDS.format(c="text")} AS ws,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct,
           len(list_intersect(list_distinct({SQL_WORDS.format(c="text")}), [{_EN_SW}])) AS stop_hits,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
    FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(ws) AS INTEGER) AS n_words,
       ROUND(punct / NULLIF(CAST(n_chars AS DOUBLE), 0), 6) AS punct_ratio,
       ROUND(stop_hits / NULLIF(CAST(len(ws) AS DOUBLE), 0), 6) AS stopword_ratio,
       ROUND((length({_NORM}) - (len(ws) - 1)) / NULLIF(len(ws), 0), 6) AS mean_word_len,
       ROUND(n_alpha / NULLIF(CAST(n_chars AS DOUBLE), 0), 6) AS alpha_ratio,
       ROUND(LEAST(len(ws) / 20.0, 1.0) * 0.3
             + (1.0 - LEAST(punct / NULLIF(CAST(n_chars AS DOUBLE), 0), 1.0)) * 0.2
             + LEAST(stop_hits / 3.0, 1.0) * 0.3
             + COALESCE(n_alpha / NULLIF(CAST(n_chars AS DOUBLE), 0), 0.0) * 0.2, 6) AS quality_score
FROM base
""",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = ta.quality_scores(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_words").cast("int").alias("n_words"),
        "punct_ratio",
        "stopword_ratio",
        "mean_word_len",
        "alpha_ratio",
        "quality_score",
    )


_LANGS = sorted(ta.LANG_STOPWORDS)
_HIT_SQL = ",\n       ".join(
    "CAST(len(list_intersect(list_distinct({ws}), [{sw}])) AS INTEGER) AS hits_{lang}".format(
        ws=SQL_WORDS.format(c="text"),
        sw=", ".join(f"'{s}'" for s in ta.LANG_STOPWORDS[lang]),
        lang=lang,
    )
    for lang in _LANGS
)
_BEST_SQL = "GREATEST({})".format(", ".join(f"hits_{lang}" for lang in _LANGS))
_PRED_SQL = "CASE "
for lang in _LANGS:
    _PRED_SQL += f"WHEN best > 0 AND hits_{lang} = best THEN '{lang}' "
_PRED_SQL += "ELSE 'und' END"


@register(
    "lang_id",
    f"""
WITH hits AS (
    SELECT doc_id,
       {_HIT_SQL}
    FROM documents
),
best AS (SELECT *, {_BEST_SQL} AS best FROM hits)
SELECT doc_id, {", ".join(f"hits_{lang}" for lang in _LANGS)}, {_PRED_SQL} AS pred_lang
FROM best
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = ta.lang_id(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        *[F.col(f"hits_{lang}").cast("int").alias(f"hits_{lang}") for lang in _LANGS],
        "pred_lang",
    )


@register(
    "lang_id_confusion",
    f"""
WITH hits AS (
    SELECT doc_id, lang,
       {_HIT_SQL}
    FROM documents
),
best AS (SELECT *, {_BEST_SQL} AS best FROM hits)
SELECT lang AS true_lang, {_PRED_SQL} AS pred_lang, COUNT(*) AS n
FROM best GROUP BY 1, 2
""",
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion counts of the stopword-voting
    heuristic against the documents table's ground-truth ``lang`` column —
    one aggregate over the per-doc argmax."""
    docs = load_table(spark, "documents", sf_dir)
    pred = ta.lang_id(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fingerprints",
    f"""
SELECT doc_id, md5({_NORM}) AS fingerprint,
       {SQL_MD5_INT32.format(c=_NORM)} AS fingerprint32
FROM documents
""",
)
def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.fingerprints(load_table(spark, "documents", sf_dir))


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "ann_brute_topk",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM pairs
)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 5
""",
)
def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # size-dispatched: brute-BLAS at dim-table scale (identical semantics to
    # sim.brute_topk, ~20× faster), LSH bucket join above the broadcast cap
    return sim.ann_topk(load_table(spark, "embeddings", sf_dir), k=5)


@register(
    "embedding_near_dup",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
""",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sim.embedding_near_dup(load_table(spark, "embeddings", sf_dir), threshold=0.35)


@register(
    "ann_lsh_topk",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes AS (
    SELECT t.t, p.p,
           list_transform(range(64), d ->
               ('0x' || substr(md5(concat('p_', t.t, '_', p.p, '_', d)), 1, 8))::BIGINT
               / 2147483648.0 - 1.0) AS w
    FROM (SELECT UNNEST(range(8)) AS t) t, (SELECT UNNEST(range(4)) AS p) p
),
bits AS (
    SELECT e.vec_id, pl.t,
           SUM(CASE WHEN list_dot_product(e.v, pl.w) >= 0
                    THEN CAST(pow(2.0, pl.p) AS BIGINT) ELSE 0 END) AS code
    FROM e CROSS JOIN planes pl
    GROUP BY e.vec_id, pl.t
),
buckets AS (SELECT vec_id, concat_ws('_', t, code) AS bucket FROM bits),
cand AS (
    SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
    FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
sims AS (
    SELECT c.query_id, c.neighbor_id,
           ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
    FROM cand c
    JOIN e ea ON ea.vec_id = c.query_id
    JOIN e eb ON eb.vec_id = c.neighbor_id
)
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM sims)
WHERE rank <= 5
""",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN gets a FULL hash oracle: the md5-seeded hyperplanes,
    sign buckets, any-table candidate union, exact-cosine verify, and
    top-k are all reproducible in DuckDB (the md5 plane derivation exists
    precisely so the numpy and SQL paths can never drift). Recall-vs-brute
    remains a pytest invariant; this pins the ANN result itself."""
    return sim.lsh_topk(load_table(spark, "embeddings", sf_dir), k=5, n_planes=4, n_tables=8, dim=64)


@register(
    "knn_similarity_graph",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM pairs
),
topk AS (SELECT query_id AS src, neighbor_id AS dst, cosine AS similarity FROM ranked WHERE rank <= 5),
sym AS (
    SELECT src, dst, similarity FROM topk
    UNION ALL
    SELECT dst AS src, src AS dst, similarity FROM topk
)
SELECT src, dst, MAX(similarity) AS similarity FROM sym GROUP BY src, dst
""",
)
def q_knn_similarity_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shared_sim_graph(spark, sf_dir)


@register(
    "pii_scrub",
    """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS INTEGER) AS n_urls,
       regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                      'https?://[^\\s]+', '<URL>', 'g') AS scrubbed,
       CAST(length(regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                      'https?://[^\\s]+', '<URL>', 'g')) AS BIGINT) AS scrubbed_len
FROM documents
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.pii_scrub(load_table(spark, "documents", sf_dir))


_GRAMS2 = sql_word_ngrams("text", 2)

@register(
    "repetition_scores",
    f"""
WITH w AS (SELECT doc_id, {SQL_WORDS.format(c="text")} AS ws FROM documents),
grams AS (
    SELECT doc_id, len(ws) AS n_tokens, unnest({_GRAMS2.replace("text", "text")}) AS g
    FROM documents JOIN w USING (doc_id)
),
per_gram AS (SELECT doc_id, n_tokens, g, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3),
top AS (SELECT doc_id, n_tokens, MAX(c) AS top_bigram_count FROM per_gram GROUP BY 1, 2),
toks AS (
    SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tokens
    FROM (SELECT doc_id, t, COUNT(*) AS c
          FROM (SELECT doc_id, unnest(ws) AS t FROM w)
          GROUP BY doc_id, t) GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.ws) AS BIGINT) AS n_tokens,
       CAST(COALESCE(top.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
       ROUND(COALESCE(top.top_bigram_count, 0) * 2 / NULLIF(CAST(len(w.ws) AS DOUBLE), 0), 6) AS top_bigram_frac,
       ROUND(COALESCE(toks.dup_tokens, 0) / NULLIF(CAST(len(w.ws) AS DOUBLE), 0), 6) AS dup_token_frac
FROM w LEFT JOIN top ON w.doc_id = top.doc_id LEFT JOIN toks ON w.doc_id = toks.doc_id
""",
)
def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ta.repetition_scores(load_table(spark, "documents", sf_dir), n=2)


_WS = SQL_WORDS.format(c="text")

@register(
    "document_chunks",
    f"""
WITH w AS (SELECT doc_id, {_WS} AS ws FROM documents),
n AS (
    SELECT doc_id, ws,
           CASE WHEN len(ws) <= 64 THEN 1
                ELSE CAST(ceil((len(ws) - 64) / 48.0) AS INTEGER) + 1 END AS n_chunks
    FROM w
),
e AS (SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_idx FROM n)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(len(ws[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(ws[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text
FROM e
""",
)
def q_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunking (64-token windows, 16 overlap) — pretraining
    window prep; chunk boundaries identical across engines by construction."""
    return ta.chunk_documents(load_table(spark, "documents", sf_dir), chunk_tokens=64, overlap=16)


@register(
    "corpus_split_stats",
    f"""
WITH b AS (
    SELECT doc_id,
           {SQL_MD5_INT32.format(c="CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
           len({SQL_WORDS.format(c="text")}) AS n_tokens
    FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM b GROUP BY 1
""",
)
def q_corpus_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split of the corpus (80/10/10 by md5 of doc_id —
    engine-neutral, stable under re-ingest) with per-split doc and token
    totals — the split audit a data pipeline records next to the corpus."""
    from ..functions.text import md5_int32, words as _words

    docs = load_table(spark, "documents", sf_dir)
    b = docs.select(
        F.pmod(md5_int32(F.col("doc_id").cast("string")), F.lit(100)).alias("bucket"),
        F.size(_words(F.col("text"))).alias("n_tokens"),
    )
    return (
        b.select(
            F.when(F.col("bucket") < 80, "train")
            .when(F.col("bucket") < 90, "val")
            .otherwise("test")
            .alias("split"),
            "n_tokens",
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").cast("long").alias("total_tokens"))
    )


# ---------------------------------------------------------------------------
# corpus curation: the full training-data pipeline end-to-end
# ---------------------------------------------------------------------------


@register(
    "corpus_curation",
    f"""
WITH RECURSIVE {_CLUSTERS_CTE.strip()},
{_QUALITY_SCORE_CTE.strip()},
canon AS (
    SELECT cluster_id, doc_id, cluster_size, quality_score FROM (
        SELECT comp.cluster_id, comp.doc_id, csize.cluster_size, qual.quality_score,
               ROW_NUMBER() OVER (PARTITION BY comp.cluster_id
                                  ORDER BY qual.quality_score DESC, comp.doc_id ASC) AS rn
        FROM comp JOIN csize USING (cluster_id) JOIN qual USING (doc_id)
    ) WHERE rn = 1 AND quality_score >= 0.7
),
hits AS (
    SELECT doc_id,
       {_HIT_SQL}
    FROM documents
),
best AS (SELECT *, {_BEST_SQL} AS best FROM hits),
lang AS (SELECT doc_id, {_PRED_SQL} AS pred_lang FROM best),
wtoks AS (SELECT doc_id, CAST(len({SQL_WORDS.format(c="text")}) AS BIGINT) AS ws_tokens FROM documents)
SELECT lang.pred_lang,
       COUNT(*) AS n_docs,
       CAST(SUM(canon.cluster_size) AS BIGINT) AS n_docs_represented,
       CAST(SUM(wtoks.ws_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(CAST(canon.quality_score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
FROM canon JOIN lang USING (doc_id) JOIN wtoks USING (doc_id)
GROUP BY lang.pred_lang
""",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline one real corpus pass would run: near-dup
    cluster (simhash + connected components) -> keep the best-quality doc
    per cluster -> quality gate (>= 0.7) -> per-language corpus stats
    (kept docs, docs represented by the kept ones, whitespace tokens,
    decimal-exact mean quality). Every stage is the already-oracle-checked
    operator; this entry hash-checks their composition end to end."""
    docs = load_table(spark, "documents", sf_dir)
    clusters = _clusters_shared(spark, sf_dir)
    kept = cc.canonical_docs(clusters, ta.quality_scores(docs)).filter(
        F.col("quality_score") >= 0.7
    )
    lang = ta.lang_id(docs).select("doc_id", "pred_lang")
    toks = ta.token_stats(docs).select("doc_id", F.col("ws_tokens").cast("long").alias("ws_tokens"))
    joined = (
        kept.withColumnRenamed("canonical_doc_id", "doc_id")
        .join(lang, "doc_id")
        .join(toks, "doc_id")
    )
    q_dec = F.col("quality_score").cast("decimal(18,6)")
    return joined.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("cluster_size").alias("n_docs_represented"),
        F.sum("ws_tokens").alias("total_tokens"),
        F.round(F.sum(q_dec).cast("double") / F.count(F.lit(1)), 6).alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# sequence packing + deterministic IVF (round-3 breadth)
# ---------------------------------------------------------------------------


@register(
    "document_packing",
    f"""
WITH t AS (
    SELECT doc_id,
           len({SQL_WORDS.format(c="text")}) AS tokens,
           ('0x' || substr(md5(concat('pack_', doc_id)), 1, 8))::BIGINT AS h
    FROM documents
),
b AS (SELECT *, CAST(h % 32 AS INTEGER) AS bucket FROM t),
p AS (
    SELECT bucket, tokens,
           COALESCE(SUM(tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
    FROM b
)
SELECT bucket, CAST(prefix // 256 AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS seq_tokens,
       ROUND(SUM(tokens) / 256.0, 6) AS fill_ratio
FROM p GROUP BY bucket, seq_id
""",
)
def q_document_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chop into 256-token training windows,
    md5-sharded into 32 independent buckets — the per-bucket window is the
    100-TB hatch: no global sort, shards pack in parallel)."""
    return ta.pack_sequences(load_table(spark, "documents", sf_dir), budget=256, n_buckets=32)


@register(
    "ann_ivf_hash_topk",
    """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           ('0x' || substr(md5(concat('ivf_', vec_id)), 1, 8))::BIGINT AS h
    FROM embeddings
),
cent AS (
    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell
    FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 16)
),
sims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_dot_product(e.v, c.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos
    FROM e CROSS JOIN cent c
),
ranked_cells AS (
    SELECT vec_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS r
    FROM sims
),
assign AS (SELECT vec_id, cell FROM ranked_cells WHERE r = 1),
probe AS (SELECT vec_id, cell FROM ranked_cells WHERE r <= 2),
cand AS (
    SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id
    FROM probe p JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id
),
res AS (
    SELECT c.query_id, c.neighbor_id,
           ROUND(list_dot_product(ea.v, eb.v) /
                 (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine
    FROM cand c JOIN e ea ON ea.vec_id = c.query_id JOIN e eb ON eb.vec_id = c.neighbor_id
)
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM res)
WHERE rank <= 5
""",
)
def _ivf_hash_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized ivf_hash_topk(k=5, n_cells=16, n_probe=2) — consumed by
    ann_ivf_hash_topk and the probe-depth audit's middle point."""
    from ._memo import memo

    return memo(
        spark,
        ("ivf_hash_topk_5_16_2", sf_dir),
        lambda: sim.ivf_hash_topk(
            load_table(spark, "embeddings", sf_dir), k=5, n_cells=16, n_probe=2
        ),
    )


def q_ann_ivf_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-centroid IVF ANN (md5-sampled coarse quantizer) — the
    hash-oracle-checked sibling of the KMeans ``ann_ivf_topk``: same
    index/probe/re-rank dataflow, reproducible centroids, so the FULL
    approximate result is pinned cross-engine. Recall-vs-brute stays a
    pytest invariant for both variants."""
    return _ivf_hash_shared(spark, sf_dir)


_SPLIT_CASE = (
    f"CASE WHEN {SQL_MD5_INT32.format(c='CAST(doc_id AS VARCHAR)')} % 100 < 80 THEN 'train' "
    f"WHEN {SQL_MD5_INT32.format(c='CAST(doc_id AS VARCHAR)')} % 100 < 90 THEN 'val' "
    "ELSE 'test' END"
)


@register(
    "decontamination",
    f"""
WITH lab AS (
    SELECT doc_id, text, {_SPLIT_CASE} AS split FROM documents
),
tg AS (
    SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS g
    FROM (SELECT unnest({sql_word_ngrams("text", 8)}) AS g FROM lab WHERE split = 'train')
),
eg AS (
    SELECT DISTINCT doc_id, split, ('0x' || substr(md5(g), 1, 15))::BIGINT AS g
    FROM (SELECT doc_id, split, unnest({sql_word_ngrams("text", 8)}) AS g
          FROM lab WHERE split <> 'train')
),
tot AS (SELECT doc_id, split, COUNT(*) AS n_grams FROM eg GROUP BY doc_id, split),
hit AS (SELECT doc_id, split, COUNT(*) AS n_overlap
        FROM eg WHERE g IN (SELECT g FROM tg) GROUP BY doc_id, split)
SELECT l.doc_id, l.split,
       CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       ROUND(COALESCE(COALESCE(h.n_overlap, 0) / NULLIF(t.n_grams, 0), 0), 6) AS overlap_rate,
       CAST(COALESCE(h.n_overlap, 0) > 0 AS INT) AS contaminated
FROM lab l LEFT JOIN tot t USING (doc_id, split) LEFT JOIN hit h USING (doc_id, split)
WHERE l.split <> 'train'
""",
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage audit: verbatim 8-gram overlap between the md5-hash
    train split and each val/test doc (the GPT-3/Llama-style n-gram
    decontamination check, run as a gram-hash semi-join)."""
    return ta.decontaminate_splits(load_table(spark, "documents", sf_dir), n=8)


@register(
    "stratified_corpus_sample",
    f"""
WITH {_QUALITY_SCORE_CTE.strip()},
strata AS (
    SELECT d.doc_id, d.lang,
           CAST(LEAST(FLOOR(q.quality_score * 5), 4) AS INTEGER) AS q_bucket,
           q.quality_score,
           md5(concat('s_', d.doc_id)) AS h
    FROM documents d JOIN qual q USING (doc_id)
)
SELECT lang, q_bucket, rank, doc_id, quality_score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, q_bucket
                                   ORDER BY h, doc_id) AS rank
      FROM strata)
WHERE rank <= 3
""",
)
def q_stratified_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic corpus sampling: per (language × quality
    quintile) stratum, the 3 docs with the smallest md5('s_' || doc_id) —
    the seeded equivalent of uniform-per-stratum sampling used to build
    balanced eval/annotation sets from a curated corpus. Strata windows
    partition by (lang, bucket) — embarrassingly parallel, no global sort;
    quality buckets come from the oracle-checked quality_scores operator,
    so both engines bucket identically."""
    docs = load_table(spark, "documents", sf_dir)
    qual = ta.quality_scores(docs).select("doc_id", "quality_score")
    strata = (
        docs.select("doc_id", "lang")
        .join(qual, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.least(F.floor(F.col("quality_score") * 5), F.lit(4)).cast("int").alias("q_bucket"),
            "quality_score",
            F.md5(F.concat(F.lit("s_"), F.col("doc_id").cast("string"))).alias("h"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "q_bucket").orderBy("h", "doc_id")
    return (
        strata.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "q_bucket", "rank", "doc_id", "quality_score")
    )


@register(
    "corpus_mixture_weights",
    f"""
WITH t AS (SELECT source, len({SQL_WORDS.format(c="text")}) AS tokens FROM documents),
agg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS total_tokens
    FROM t GROUP BY source
),
tot AS (SELECT CAST(SUM(total_tokens) AS DOUBLE) AS all_toks, COUNT(*) AS n_sources FROM agg)
SELECT source, n_docs, total_tokens,
       ROUND(total_tokens / all_toks, 6) AS token_share,
       ROUND((1.0 / n_sources) / (total_tokens / all_toks), 6) AS mix_weight
FROM agg CROSS JOIN tot
""",
)
def q_corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing audit: per-source token shares and the up/down-
    sampling weight that would equalize the mixture (the pretraining
    data-mixing step; target = uniform across sources, swap the literal
    for a tuned mixture in production). One groupBy over sources + a
    1-row totals broadcast — no row-scale shuffle beyond the count."""
    from ..functions.text import words as _words

    docs = load_table(spark, "documents", sf_dir)
    agg = (
        docs.select("source", F.size(_words(F.col("text"))).alias("tokens"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("tokens").cast("long").alias("total_tokens"))
    )
    tot = agg.agg(
        F.sum("total_tokens").cast("double").alias("all_toks"),
        F.count("*").alias("n_sources"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens") / F.col("all_toks"), 6).alias("token_share"),
        F.round((1.0 / F.col("n_sources")) / (F.col("total_tokens") / F.col("all_toks")), 6).alias(
            "mix_weight"
        ),
    )


@register(
    "incremental_dedup",
    f"""
WITH {_SIMHASH_CTE.strip()},
bat AS (
    SELECT doc_id, ('0x' || substr(md5(concat('b_', doc_id)), 1, 8))::BIGINT % 2 AS batch
    FROM documents
),
sb AS (SELECT s.doc_id, s.simhash, b.batch FROM sims s JOIN bat b USING (doc_id)),
bands AS (
    SELECT doc_id, simhash, batch,
           concat_ws('_', g.b, (simhash >> (g.b * 8)) & 255) AS band_key
    FROM sb CROSS JOIN (SELECT UNNEST(range(4)) AS b) g
),
cand AS (
    SELECT DISTINCT n.doc_id, e.doc_id AS dup_of,
           bit_count(xor(n.simhash, e.simhash)) AS hamming
    FROM bands n JOIN bands e ON n.band_key = e.band_key
    WHERE n.batch = 1 AND e.batch = 0
),
best AS (
    SELECT doc_id, dup_of, hamming
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY hamming ASC, dup_of ASC) AS rn
          FROM cand WHERE hamming <= 3)
    WHERE rn = 1
)
SELECT n.doc_id,
       CAST(b.dup_of IS NOT NULL AS INT) AS is_dup,
       b.dup_of,
       b.hamming
FROM (SELECT doc_id FROM bat WHERE batch = 1) n
LEFT JOIN best b USING (doc_id)
""",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch near-dup admission check: the new ingest batch screened
    against the existing corpus through the lossless 4-band SimHash join
    (dedupe-before-admit — the incremental-injection analog of the
    reference's dvid batches, upgraded to near-dup matching)."""
    return dd.incremental_dedup(load_table(spark, "documents", sf_dir), n_batches=2, max_hamming=3)


@register(
    "vocab_top_tokens",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({SQL_WORDS.format(c="text")}) AS tok FROM documents
),
freq AS (
    SELECT tok,
           CAST(COUNT(*) AS BIGINT) AS term_freq,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM tok WHERE tok <> '' GROUP BY tok
)
SELECT rank, tok, term_freq, doc_freq,
       ROUND(doc_freq / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents), 6) AS doc_frac
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY term_freq DESC, tok ASC) AS rank FROM freq)
WHERE rank <= 50
""",
)
def q_vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-construction audit: the corpus's top-50 tokens by term
    frequency with document frequency and coverage fraction — the token-
    census a tokenizer-training / vocab-pruning pass starts from. One
    explode + one (token) aggregate with map-side combine; the final
    top-50 is a tiny TakeOrdered over the token census, never a global
    row sort."""
    docs = load_table(spark, "documents", sf_dir)
    from ..functions.text import words as _words
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    freq = tok.groupBy("tok").agg(
        F.count("*").alias("term_freq"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.orderBy(F.desc("term_freq"), F.asc("tok"))
    return (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "rank",
            "tok",
            "term_freq",
            "doc_freq",
            F.round(F.col("doc_freq") / F.col("n"), 6).alias("doc_frac"),
        )
    )


@register(
    "tfidf_top_terms",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({SQL_WORDS.format(c="text")}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE tok <> '' GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf,
           ROUND(tf.tf * LN(n.n_docs / df.df), 6) AS tfidf
    FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, rank, tok, tf, tfidf
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, tok ASC) AS rank
      FROM scored)
WHERE rank <= 5
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-5 TF-IDF terms (tf · ln(N/df)) — the keyword/topic
    signal a retrieval or doc-tagging pipeline derives per document. Two
    token aggregates (per-doc tf, corpus df — both map-side combinable)
    joined on token, then a per-doc ranking window; the df side is
    vocabulary-sized, broadcastable at any corpus scale."""
    from pyspark.sql import Window

    from ..functions.text import words as _words

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "rank", "tok", "tf", "tfidf")
    )


# ---------------------------------------------------------------------------
# duplicate-span coverage, unigram-LM scoring, SemDeDup (round-3 breadth)
# ---------------------------------------------------------------------------

_WS8 = SQL_WORDS.format(c="text")


@register(
    "duplicate_span_coverage",
    f"""
WITH w AS (SELECT doc_id, {_WS8} AS ws FROM documents),
inst AS (
    SELECT doc_id, u.pos, md5(u.g) AS gh
    FROM (SELECT doc_id,
                 unnest(CASE WHEN len(ws) >= 8 THEN
                     list_transform(range(1, len(ws) - 6),
                                    i -> struct_pack(pos := i, g := array_to_string(ws[i:i+7], ' ')))
                     ELSE [] END) AS u
          FROM w)
),
dupg AS (SELECT gh FROM inst GROUP BY gh HAVING COUNT(*) >= 2),
cov AS (
    SELECT DISTINCT i.doc_id, i.pos + d.d AS tpos
    FROM inst i JOIN dupg USING (gh) CROSS JOIN (SELECT unnest(range(8)) AS d) d
),
cnt AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM cov GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(w.ws) AS BIGINT) AS n_tokens,
       CAST(COALESCE(cnt.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(COALESCE(cnt.dup_tokens, 0) / CAST(len(w.ws) AS DOUBLE), 6) AS dup_coverage
FROM w LEFT JOIN cnt USING (doc_id)
""",
)
def q_duplicate_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of tokens inside a corpus-duplicated 8-gram — the
    n-gram-granular form of exact-substring dedup (Lee et al. 2021)."""
    return ta.duplicate_span_coverage(load_table(spark, "documents", sf_dir), n=8)


@register(
    "unigram_logprob",
    f"""
WITH toks AS (
    SELECT doc_id, tok FROM (SELECT doc_id, unnest({_WS8}) AS tok FROM documents)
    WHERE tok <> ''
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM vocab),
nlp AS (
    SELECT tok, CAST(ROUND(LN(n_total / cnt), 9) AS DECIMAL(18,10)) AS nlp
    FROM vocab CROSS JOIN tot
),
dt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(c * nlp.nlp) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS avg_neg_logprob
FROM dt JOIN nlp USING (tok)
GROUP BY doc_id
""",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity-style scoring (the SQL-expressible first-order
    form of CCNet/KenLM quality filtering); docs with zero non-empty
    tokens carry no probability mass and drop out on both engines."""
    return ta.unigram_logprob(load_table(spark, "documents", sf_dir))


@register(
    "semdedup_prune",
    """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           ('0x' || substr(md5(concat('ivf_', vec_id)), 1, 8))::BIGINT AS h
    FROM embeddings
),
cent AS (
    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell
    FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT 16)
),
sims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_dot_product(e.v, c.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos
    FROM e CROSS JOIN cent c
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS r
        FROM sims
    ) WHERE r = 1
),
pairs AS (
    -- zero-norm convention (shared with the Spark path): cosine with a
    -- zero vector is 0.0, via NULLIF on the norm product (dot is 0 there)
    SELECT b.vec_id AS vec_id,
           ROUND(COALESCE(list_dot_product(ea.v, eb.v) /
                 NULLIF(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)), 0), 0.0), 6) AS cos
    FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
)
SELECT m.vec_id, CAST(m.cell AS INT) AS cell,
       CAST(COALESCE(SUM(CASE WHEN p.cos >= 0.4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_lower_dups,
       ROUND(COALESCE(MAX(p.cos), -1.0), 6) AS max_lower_cos,
       CAST(COALESCE(SUM(CASE WHEN p.cos >= 0.4 THEN 1 ELSE 0 END), 0) > 0 AS INT) AS pruned
FROM assign m LEFT JOIN pairs p USING (vec_id)
GROUP BY m.vec_id, m.cell
""",
)
def _semdedup_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One semdedup(threshold=0.4, n_cells=16) relation per (app, sf_dir):
    semdedup_prune and corpus_curation_semantic run the IDENTICAL
    quantizer-assignment + per-cell gemm pipeline (r11 consolidation —
    the assignment's centroid-cosine array expression was each query's
    single most expensive stage); same rows, same schema, plan audits
    capture with the memo disabled."""
    from ._memo import memo

    return memo(
        spark,
        ("semdedup_t04_c16", sf_dir),
        lambda: sim.semdedup(load_table(spark, "embeddings", sf_dir), threshold=0.4, n_cells=16),
    )


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): within-cluster embedding near-dup
    pruning over the deterministic md5-sampled coarse quantizer."""
    return _semdedup_shared(spark, sf_dir)


_SEMDEDUP_KEPT_CTE = """
se AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           ('0x' || substr(md5(concat('ivf_', vec_id)), 1, 8))::BIGINT AS h
    FROM embeddings
),
scent AS (
    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell
    FROM (SELECT * FROM se ORDER BY h, vec_id LIMIT 16)
),
ssims AS (
    SELECT se.vec_id, c.cell,
           ROUND(list_dot_product(se.v, c.cv) /
                 (sqrt(list_dot_product(se.v, se.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos
    FROM se CROSS JOIN scent c
),
sassign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS r
        FROM ssims
    ) WHERE r = 1
),
spairs AS (
    -- zero-norm convention shared with the Spark semdedup stage: cosine 0.0
    SELECT b.vec_id AS vec_id,
           ROUND(COALESCE(list_dot_product(ea.v, eb.v) /
                 NULLIF(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)), 0), 0.0), 6) AS cos
    FROM sassign a JOIN sassign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN se ea ON ea.vec_id = a.vec_id JOIN se eb ON eb.vec_id = b.vec_id
),
skept AS (
    SELECT m.vec_id FROM sassign m LEFT JOIN spairs p USING (vec_id)
    GROUP BY m.vec_id
    HAVING COALESCE(SUM(CASE WHEN p.cos >= 0.4 THEN 1 ELSE 0 END), 0) = 0
)
"""


@register(
    "corpus_curation_semantic",
    f"""
WITH RECURSIVE {_CLUSTERS_CTE.strip()},
{_QUALITY_SCORE_CTE.strip()},
canon AS (
    SELECT cluster_id, doc_id, cluster_size, quality_score FROM (
        SELECT comp.cluster_id, comp.doc_id, csize.cluster_size, qual.quality_score,
               ROW_NUMBER() OVER (PARTITION BY comp.cluster_id
                                  ORDER BY qual.quality_score DESC, comp.doc_id ASC) AS rn
        FROM comp JOIN csize USING (cluster_id) JOIN qual USING (doc_id)
    ) WHERE rn = 1 AND quality_score >= 0.7
),
{_SEMDEDUP_KEPT_CTE.strip()},
hits AS (
    SELECT doc_id,
       {_HIT_SQL}
    FROM documents
),
best AS (SELECT *, {_BEST_SQL} AS best FROM hits),
lang AS (SELECT doc_id, {_PRED_SQL} AS pred_lang FROM best),
wtoks AS (SELECT doc_id, CAST(len({SQL_WORDS.format(c="text")}) AS BIGINT) AS ws_tokens FROM documents)
SELECT lang.pred_lang,
       COUNT(*) AS n_docs,
       CAST(SUM(canon.cluster_size) AS BIGINT) AS n_docs_represented,
       CAST(SUM(wtoks.ws_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(CAST(canon.quality_score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
FROM canon
JOIN skept ON canon.doc_id = skept.vec_id
JOIN lang USING (doc_id) JOIN wtoks USING (doc_id)
GROUP BY lang.pred_lang
""",
)
def q_corpus_curation_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_curation + the semantic layer: the doc must ALSO survive
    SemDeDup embedding pruning (vec_id ≡ doc_id in the corpus) — i.e. the
    full modern curation stack: lexical near-dup clustering -> best-doc
    selection -> quality gate -> semantic near-dup pruning -> per-language
    corpus stats. Every stage is an already-oracle-checked operator; this
    pins their composition. 100-TB posture is the union of the stages':
    banded pair joins, pointer-jumping CC, per-cell gemms — no new
    all-pairs or driver-bound step is introduced by the composition."""
    docs = load_table(spark, "documents", sf_dir)
    clusters = _clusters_shared(spark, sf_dir)
    kept = cc.canonical_docs(clusters, ta.quality_scores(docs)).filter(
        F.col("quality_score") >= 0.7
    )
    sem_kept = (
        _semdedup_shared(spark, sf_dir)
        .filter(F.col("pruned") == 0)
        .select(F.col("vec_id").alias("doc_id"))
    )
    lang = ta.lang_id(docs).select("doc_id", "pred_lang")
    toks = ta.token_stats(docs).select("doc_id", F.col("ws_tokens").cast("long").alias("ws_tokens"))
    joined = (
        kept.withColumnRenamed("canonical_doc_id", "doc_id")
        .join(sem_kept, "doc_id")
        .join(lang, "doc_id")
        .join(toks, "doc_id")
    )
    q_dec = F.col("quality_score").cast("decimal(18,6)")
    return joined.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("cluster_size").alias("n_docs_represented"),
        F.sum("ws_tokens").alias("total_tokens"),
        F.round(F.sum(q_dec).cast("double") / F.count(F.lit(1)), 6).alias("avg_quality"),
    )


@register(
    "kmv_vocab_sketch",
    f"""
WITH toks AS (
    SELECT DISTINCT source, tok
    FROM (SELECT source, unnest({_WS8}) AS tok FROM documents)
    WHERE tok <> ''
),
h AS (
    SELECT source, tok AS v,
           {SQL_MD5_INT32.format(c="concat('kmv_', tok)")} AS h
    FROM toks
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC, v ASC) AS rn
    FROM h
),
agg AS (
    SELECT source, COUNT(*) AS n_exact,
           MAX(CASE WHEN rn = 16 THEN h END) AS h_k
    FROM ranked GROUP BY source
)
SELECT source,
       CAST(n_exact AS BIGINT) AS n_exact,
       h_k,
       CASE WHEN h_k IS NOT NULL THEN ROUND(15.0 * 4294967296.0 / h_k, 6)
            ELSE CAST(n_exact AS DOUBLE) END AS estimate,
       ROUND(ABS(CASE WHEN h_k IS NOT NULL THEN ROUND(15.0 * 4294967296.0 / h_k, 6)
                      ELSE CAST(n_exact AS DOUBLE) END - n_exact) / n_exact, 6) AS rel_error
FROM agg
""",
)
def q_kmv_vocab_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (k=16) of the per-source token vocabulary
    — a mergeable cardinality sketch with a FULL hash oracle (md5-KMV is
    engine-agnostic, unlike HLL register layouts); exact count rides along
    to expose the realized relative error."""
    from ..functions.text import words as _words
    from ..operators.aggregates import kmv_distinct_sketch

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("source", F.explode(_words(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    return kmv_distinct_sketch(toks, ["source"], "tok", k=16)


@register(
    "ddsketch_doc_lengths",
    """
WITH vals AS (SELECT CAST(length(text) AS DOUBLE) AS v FROM documents),
n AS (SELECT COUNT(*) AS n FROM vals),
hist AS (
    SELECT CASE WHEN v <= 0 THEN -1000000000
                ELSE CAST(floor(round(ln(v) / ln(1.02), 9)) AS BIGINT) END AS bucket,
           COUNT(*) AS cnt
    FROM vals GROUP BY 1
),
cum AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum FROM hist),
qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
est AS (
    SELECT q.q, n.n,
           ROUND(CASE WHEN b.bucket = -1000000000 THEN 0.0
                      ELSE POWER(1.02, b.bucket) END, 6) AS est
    FROM qs q CROSS JOIN n,
    LATERAL (SELECT bucket FROM cum WHERE cum.cum >= CEIL(q.q * n.n)
             ORDER BY bucket LIMIT 1) b
),
ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM vals),
ex AS (
    SELECT q.q, MIN(r.v) AS exact
    FROM qs q CROSS JOIN n JOIN ranked r ON r.rn >= CEIL(q.q * n.n)
    GROUP BY q.q
)
SELECT e.q, CAST(e.n AS BIGINT) AS n, e.est,
       ROUND(ex.exact, 6) AS exact,
       ROUND(CASE WHEN ex.exact <> 0 THEN ABS(e.est - ex.exact) / ABS(ex.exact)
                  ELSE ABS(e.est) END, 6) AS rel_error
FROM est e JOIN ex ON e.q = ex.q
""",
)
def q_ddsketch_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch log-bucket quantile sketch (gamma=1.02 → ≤2% relative
    error) over document character lengths — completes the mergeable
    sketch family (KMV distincts, CMS frequencies, DDSketch quantiles)
    with a FULL hash oracle: bucket assignment and representatives are
    pure float arithmetic, identical cross-engine (unlike t-digest/GK,
    whose internals are implementation-defined). The exact rank value
    rides along to expose realized error."""
    from ..operators.aggregates import ddsketch_quantiles

    docs = load_table(spark, "documents", sf_dir).select(
        F.length("text").alias("n_chars")
    )
    return ddsketch_quantiles(docs, "n_chars", quantiles=(0.5, 0.9, 0.99), gamma=1.02)


@register(
    "cms_token_frequencies",
    f"""
WITH toks AS (
    SELECT tok FROM (SELECT unnest({_WS8}) AS tok FROM documents) WHERE tok <> ''
),
grid AS (
    SELECT row, bucket, COUNT(*) AS cell FROM (
        SELECT d.d AS row,
               {SQL_MD5_INT32.format(c="concat('cms', d.d, '_', tok)")} % 256 AS bucket
        FROM toks CROSS JOIN (SELECT UNNEST(range(4)) AS d) d
    ) GROUP BY row, bucket
),
exact AS (SELECT tok, COUNT(*) AS n_exact FROM toks GROUP BY tok),
top AS (SELECT * FROM exact ORDER BY n_exact DESC, tok ASC LIMIT 20),
est AS (
    SELECT t.tok, t.n_exact, MIN(g.cell) AS cms_estimate
    FROM (SELECT tok, n_exact, d.d AS row,
                 {SQL_MD5_INT32.format(c="concat('cms', d.d, '_', tok)")} % 256 AS bucket
          FROM top CROSS JOIN (SELECT UNNEST(range(4)) AS d) d) t
    JOIN grid g ON g.row = t.row AND g.bucket = t.bucket
    GROUP BY t.tok, t.n_exact
)
SELECT tok, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - n_exact AS BIGINT) AS overestimate
FROM est
""",
)
def q_cms_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch token-frequency estimates for the exact top-20
    tokens — the deterministic md5-celled CMS grid under a FULL hash
    oracle; overestimate exposes realized collision error (always >= 0 by
    the CMS guarantee)."""
    from ..functions.text import words as _words
    from ..operators.aggregates import cms_token_frequencies

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(F.explode(_words(F.col("text"))).alias("tok")).filter(F.col("tok") != "")
    return cms_token_frequencies(toks, value_col="tok", depth=4, width=256, top_n=20)


def _bloom_oracle_sql(n: int = 8, m_bits: int = 65536, k_hashes: int = 3) -> str:
    """DuckDB mirror of operators/text_analysis.bloom_gram_prefilter —
    identical md5 bit positions, 63 usable bits per word (sign bit never
    participates), bit_or bitmap, k-way probe joins."""
    grams = sql_word_ngrams("text", n)
    md5i = SQL_MD5_INT32
    pos = [md5i.format(c=f"concat('bloom{j}_', g)") + f" % {m_bits}" for j in range(k_hashes)]
    pos_cols = ", ".join(f"{p} AS p{j}" for j, p in enumerate(pos))
    joins = "\n".join(
        f"LEFT JOIN bitmap b{j} ON b{j}.word = e.p{j} // 63" for j in range(k_hashes)
    )
    hits = " AND ".join(
        f"COALESCE((b{j}.bits >> CAST(e.p{j} % 63 AS INT)) % 2, 0) = 1" for j in range(k_hashes)
    )
    pos_selects = []
    for j in range(k_hashes):
        h = md5i.format(c=f"concat('bloom{j}_', g)")
        pos_selects.append(f"SELECT {h} % {m_bits} AS p FROM tg")
    bloom_pos_union = "\nUNION ALL\n".join(pos_selects)
    return f"""
WITH lab AS (
    SELECT doc_id, text, {_SPLIT_CASE} AS split FROM documents
),
tg AS (
    SELECT DISTINCT g FROM (SELECT unnest({grams}) AS g FROM lab WHERE split = 'train')
),
tb AS (
{bloom_pos_union}
),
bitmap AS (
    SELECT p // 63 AS word, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
    FROM tb GROUP BY p // 63
),
eg AS (
    SELECT DISTINCT doc_id, split, g
    FROM (SELECT doc_id, split, unnest({grams}) AS g FROM lab WHERE split <> 'train')
),
probe AS (
    SELECT e.doc_id, e.split,
           CASE WHEN {hits} THEN 1 ELSE 0 END AS hit
    FROM (SELECT doc_id, split, g, {pos_cols} FROM eg) e
{joins}
),
bloom AS (
    SELECT doc_id, split, COUNT(*) AS n_grams, SUM(hit) AS bloom_overlap
    FROM probe GROUP BY doc_id, split
),
exact AS (
    SELECT doc_id, split, COUNT(*) AS exact_overlap
    FROM eg SEMI JOIN tg USING (g)
    GROUP BY doc_id, split
)
SELECT l.doc_id, l.split,
       CAST(COALESCE(b.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(x.exact_overlap, 0) AS BIGINT) AS exact_overlap,
       CAST(COALESCE(b.bloom_overlap, 0) AS BIGINT) AS bloom_overlap,
       CAST(COALESCE(b.bloom_overlap, 0) - COALESCE(x.exact_overlap, 0) AS BIGINT) AS false_positives
FROM (SELECT doc_id, split FROM lab WHERE split <> 'train') l
LEFT JOIN bloom b USING (doc_id, split)
LEFT JOIN exact x USING (doc_id, split)
"""


@register("bloom_decontamination_prefilter", _bloom_oracle_sql())
def q_bloom_decontamination_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination prefilter: broadcastable md5-Bloom over
    train 8-grams probed by every eval gram, reported against the exact
    semi-join overlap (false_positives >= 0 by the no-false-negative
    guarantee) — the third member of the oracle-checked sketch family."""
    return ta.bloom_gram_prefilter(load_table(spark, "documents", sf_dir), n=8)


@register(
    "semdedup_incremental",
    """
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v,
           ('0x' || substr(md5(concat('ivf_', vec_id)), 1, 8))::BIGINT AS h,
           ('0x' || substr(md5(concat('b_', vec_id)), 1, 8))::BIGINT % 2 AS batch
    FROM embeddings
),
cent AS (
    SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell
    FROM (SELECT * FROM e WHERE batch = 0 ORDER BY h, vec_id LIMIT 16)
),
sims AS (
    SELECT e.vec_id, c.cell,
           ROUND(list_dot_product(e.v, c.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos
    FROM e CROSS JOIN cent c
),
assign AS (
    SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS r
        FROM sims
    ) WHERE r = 1
),
cand AS (
    -- zero-norm convention (shared with the Spark path): cosine 0.0
    SELECT n.vec_id AS nid, o.vec_id AS oid,
           ROUND(COALESCE(list_dot_product(en.v, eo.v) /
                 NULLIF(sqrt(list_dot_product(en.v, en.v)) * sqrt(list_dot_product(eo.v, eo.v)), 0), 0.0), 6) AS cosine
    FROM assign n JOIN e en ON en.vec_id = n.vec_id AND en.batch = 1
    JOIN assign o ON o.cell = n.cell
    JOIN e eo ON eo.vec_id = o.vec_id AND eo.batch = 0
),
best AS (
    SELECT nid, oid, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY nid ORDER BY cosine DESC, oid ASC) AS rn
        FROM cand WHERE cosine >= 0.4
    ) WHERE rn = 1
)
SELECT n.vec_id,
       CAST(b.oid IS NOT NULL AS INT) AS is_dup,
       b.oid AS dup_of,
       b.cosine
FROM (SELECT vec_id FROM e WHERE batch = 1) n
LEFT JOIN best b ON b.nid = n.vec_id
""",
)
def q_semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic admission: the new ingest batch screened
    against the existing corpus within the existing-corpus-derived
    quantizer cells — increment-bounded, the embedding-modality sibling
    of incremental_dedup."""
    return sim.semdedup_incremental(load_table(spark, "embeddings", sf_dir), threshold=0.4, n_cells=16)


@register(
    "corpus_datacard",
    f"""
WITH w AS (SELECT doc_id, source, text, {_WS8} AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
toks AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
qual AS (
    SELECT doc_id,
           ROUND(LEAST(len({_WS8}) / 20.0, 1.0) * 0.3
             + (1.0 - LEAST((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                            / NULLIF(CAST(length(text) AS DOUBLE), 0), 1.0)) * 0.2
             + LEAST(len(list_intersect(list_distinct({_WS8}), [{_EN_SW_FWD}])) / 3.0, 1.0) * 0.3
             + COALESCE(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        / NULLIF(CAST(length(text) AS DOUBLE), 0), 0.0) * 0.2, 6) AS quality_score
    FROM documents
)
SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_docs,
    (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM w) AS n_sources,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS total_tokens,
    (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM toks) AS vocab_size,
    (SELECT CAST(COUNT(*) - COUNT(DISTINCT {SQL_NORMALIZE.format(c="text")}) AS BIGINT) FROM documents) AS exact_dup_docs,
    (SELECT ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) FROM qual) AS mean_quality
""",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datasheet (the 'data card' a curation run publishes):
    docs, sources, token totals, vocabulary size, exact-duplicate count,
    decimal-exact mean quality. Each statistic is a single aggregate —
    one pass over the corpus at any scale."""
    from ..functions.text import normalize_text, words as _words

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    q = ta.quality_scores(docs)
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        (F.count(F.lit(1)) - F.countDistinct(normalize_text(F.col("text")))).alias("exact_dup_docs"),
    )
    tk = toks.agg(
        F.count(F.lit(1)).alias("total_tokens"), F.countDistinct("tok").alias("vocab_size")
    )
    mq = q.agg(
        F.round(
            F.sum(F.col("quality_score").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_quality")
    )
    return (
        base.crossJoin(tk)
        .crossJoin(mq)
        .select("n_docs", "n_sources", "total_tokens", "vocab_size", "exact_dup_docs", "mean_quality")
    )


@register(
    "weighted_corpus_sample",
    f"""
WITH base AS (
    SELECT doc_id, source, CAST(length(text) AS DOUBLE) AS w,
           ({SQL_MD5_INT32.format(c="concat('ws_', doc_id)")} + 1) / 4294967297.0 AS u
    FROM documents
),
keyed AS (
    SELECT doc_id, source, w, ROUND(LN(u) / w, 9) AS key
    FROM base WHERE w > 0
)
SELECT source, rank, doc_id, CAST(w AS BIGINT) AS n_chars
FROM (SELECT source, doc_id, w,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY key DESC, doc_id ASC) AS rank
      FROM keyed)
WHERE rank <= 5
""",
)
def q_weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-Res,
    the distributed-reservoir standard): per source, 5 docs drawn with
    probability proportional to length — the corpus-subsampling step that
    favors substantive documents. Key = ln(u)/w with md5-uniform u, so the
    SAMPLE ITSELF is deterministic and hash-matches the oracle (the
    engine-RNG-free discipline of every sampler in this repo). One
    per-group top-k window — no global sort, no driver state; at 100 TB
    the reservoir per group is k rows."""
    from ..functions.text import md5_int32

    docs = load_table(spark, "documents", sf_dir)
    u = (md5_int32(F.concat(F.lit("ws_"), F.col("doc_id").cast("string"))) + 1) / F.lit(4294967297.0)
    base = docs.select(
        "doc_id", "source", F.length("text").cast("double").alias("w"), u.alias("u")
    ).filter(F.col("w") > 0)
    keyed = base.withColumn("key", F.round(F.log(F.col("u")) / F.col("w"), 9))
    from pyspark.sql import Window

    win = Window.partitionBy("source").orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 5)
        .select("source", "rank", "doc_id", F.col("w").cast("long").alias("n_chars"))
    )


def _stream_curation_oracle_sql(n_batches: int = 4, max_hamming: int = 3) -> str:
    """Unrolled-batch mirror of streaming/ingest.stream_curated_ingest: the
    SAME deterministic doc_id % n_batches split, within-batch keep-first
    screening, and cross-batch admission against every earlier admitted
    batch — a Structured Streaming pipeline under the hash gate."""
    ham = f"bit_count(xor(d2.simhash, d.simhash)) <= {max_hamming}"
    rounds = ["a0 AS (SELECT doc_id, simhash, batch FROM w WHERE batch = 0)"]
    for b in range(1, n_batches):
        prior = " UNION ALL ".join(f"SELECT simhash FROM a{p}" for p in range(b))
        rounds.append(
            f"a{b} AS (SELECT d.doc_id, d.simhash, d.batch FROM w d WHERE d.batch = {b} "
            f"AND NOT EXISTS (SELECT 1 FROM ({prior}) d2 WHERE {ham}))"
        )
    union_all = " UNION ALL ".join(f"SELECT batch FROM a{b}" for b in range(n_batches))
    return f"""
WITH {_SIMHASH_CTE.strip()},
b AS (SELECT doc_id, simhash, doc_id % {n_batches} AS batch FROM sims),
w AS (
    SELECT * FROM b d WHERE NOT EXISTS (
        SELECT 1 FROM b d2
        WHERE d2.batch = d.batch AND d2.doc_id < d.doc_id AND {ham}
    )
),
{",".join(rounds)}
SELECT CAST(batch AS INT) AS batch_id, CAST(COUNT(*) AS BIGINT) AS admitted
FROM ({union_all}) GROUP BY batch
"""


@register("documents_stream_curation", _stream_curation_oracle_sql(n_batches=2))
def q_documents_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming curation admission (readStream →
    foreachBatch near-dup screening → partitioned state appends), hash-
    checked end to end: deterministic batches make the streamed result
    equal the unrolled-batch SQL oracle — the streaming analog of the
    events_stream_* unified-semantics guarantee, applied to the
    training-data pipeline."""
    import shutil
    import tempfile

    from ..streaming.ingest import stream_curated_ingest

    tmp = tempfile.mkdtemp(prefix="stream_curation_")
    try:
        # 2 drained micro-batches for the per-verification-run budget (r6
        # verdict #1) — still exercises within-batch screening AND the
        # cross-batch admission join; the 4-batch multi-prior config and the
        # restart-idempotence property stay under pytest's streaming gates
        out = stream_curated_ingest(spark, sf_dir, f"{tmp}/state", f"{tmp}/ckpt", n_batches=2)
        # materialize the n_batches-row summary so the scratch dirs can go
        rows = out.select(F.col("batch_id").cast("int").alias("batch_id"), "admitted").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, "batch_id int, admitted long")


@register(
    "knn_triangle_counts",
    """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM pairs
),
topk AS (SELECT query_id AS src, neighbor_id AS dst FROM ranked WHERE rank <= 5),
und AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM topk WHERE src <> dst
),
tri AS (
    SELECT x.a AS xa, x.b AS xb, y.b AS yc
    FROM und x JOIN und y ON x.b = y.a
    SEMI JOIN und z ON z.a = x.a AND z.b = y.b
),
tn AS (
    SELECT u AS id, COUNT(*) AS triangles
    FROM (SELECT unnest([xa, xb, yc]) AS u FROM tri) GROUP BY u
),
deg AS (
    SELECT id, COUNT(*) AS degree
    FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id
)
SELECT deg.id,
       CAST(deg.degree AS BIGINT) AS degree,
       CAST(COALESCE(tn.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN deg.degree >= 2
            THEN ROUND(2.0 * COALESCE(tn.triangles, 0) / (deg.degree * (deg.degree - 1)), 6)
            ELSE 0.0 END AS clustering_coef
FROM deg LEFT JOIN tn USING (id)
""",
)
def q_knn_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient on the KNN
    similarity graph (oriented two-join enumeration, exact) — the density
    statistic the reference's NetworkX layer would report; fully
    hash-oracle-checked."""
    from ..graph.algorithms import triangle_counts

    g = shared_sim_graph(spark, sf_dir)
    return triangle_counts(g)


@register(
    "pmi_collocations",
    f"""
WITH w AS (SELECT doc_id, {_WS8} AS ws FROM documents),
toks AS (SELECT tok FROM (SELECT unnest(ws) AS tok FROM w) WHERE tok <> ''),
bi AS (
    SELECT g FROM (SELECT unnest({sql_word_ngrams("text", 2)}) AS g FROM documents)
),
uni AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
big AS (SELECT g, COUNT(*) AS c FROM bi GROUP BY g),
tot AS (
    SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS n_uni,
           (SELECT CAST(SUM(c) AS DOUBLE) FROM big) AS n_big
),
scored AS (
    SELECT b.g AS bigram, b.c AS pair_count,
           ROUND(LN((b.c / t.n_big) / ((ua.c / t.n_uni) * (ub.c / t.n_uni))), 6) AS pmi
    FROM big b
    JOIN uni ua ON ua.tok = string_split(b.g, ' ')[1]
    JOIN uni ub ON ub.tok = string_split(b.g, ' ')[2]
    CROSS JOIN tot t
    WHERE b.c >= 5
)
SELECT bigram, CAST(pair_count AS BIGINT) AS pair_count, pmi
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram ASC) AS rank FROM scored)
WHERE rank <= 20
""",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (the phrase/tokenizer-merge statistic):
    top-20 bigrams by pointwise mutual information ln(p(ab)/(p(a)p(b))),
    support >= 5. Two map-side-combinable aggregates (unigram + bigram
    counts, both vocabulary-sized) + a broadcastable unigram join — one
    ln per distinct bigram, rounded 6dp for the hash gate. TakeOrdered
    final (k-sized result, no global window)."""
    from ..functions.text import word_ngrams, words as _words

    # repartition the scan: the corpus arrives as few files, and the
    # explode(+ngram transform) is the dominant per-row work — spreading it
    # across the cluster costs one tiny text shuffle
    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = docs.select(F.explode(_words(F.col("text"))).alias("tok")).filter(F.col("tok") != "")
    # cache both count tables: they are vocabulary-sized but their INPUT is
    # the full corpus explode, and each has 2-3 consumers below (scalar
    # total + join side) — without the cache Catalyst re-evaluates the
    # whole explode+aggregate per consumer (~5 corpus passes; measured
    # 350 s at the 10x probe, seconds with the cache)
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).cache()
    big = (
        docs.select(F.explode(word_ngrams(F.col("text"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    n_big = big.agg(F.sum("c").cast("double").alias("n_big"))
    parts = F.split(F.col("g"), " ")
    scored = (
        big.filter(F.col("c") >= 5)
        .withColumn("ta", F.element_at(parts, 1))
        .withColumn("tb", F.element_at(parts, 2))
        .join(uni.withColumnsRenamed({"tok": "ta", "c": "ca"}), "ta")
        .join(uni.withColumnsRenamed({"tok": "tb", "c": "cb"}), "tb")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            F.col("g").alias("bigram"),
            F.col("c").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c") / F.col("n_big"))
                    / ((F.col("ca") / F.col("n_uni")) * (F.col("cb") / F.col("n_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(20)


_HLL_ALPHA = "(0.7213 / (1.0 + 1.079 / 1024.0)) * 1024.0 * 1024.0 * 9007199254740992.0"


@register(
    "hll_vocab_sketch",
    f"""
WITH toks AS (
    SELECT DISTINCT source, tok
    FROM (SELECT source, unnest({_WS8}) AS tok FROM documents)
    WHERE tok <> ''
),
hb AS (
    SELECT source,
           ('0x' || substr(md5(concat('hll_', tok)), 1, 8))::BIGINT % 1024 AS bucket,
           ('0x' || substr(md5(concat('hll_', tok)), 9, 13))::BIGINT AS w
    FROM toks
),
regs AS (
    SELECT source, bucket,
           MAX(CASE WHEN w = 0 THEN 53
                    ELSE instr(lpad(bin(w), 52, '0'), '1') END) AS m_reg
    FROM hb GROUP BY source, bucket
),
allregs AS (
    SELECT source, bucket, m_reg FROM regs
    UNION ALL
    SELECT '__all__' AS source, bucket, MAX(m_reg) AS m_reg FROM regs GROUP BY bucket
),
exact AS (
    SELECT source, COUNT(*) AS n_exact FROM toks GROUP BY source
    UNION ALL
    SELECT '__all__', COUNT(DISTINCT tok) FROM toks
),
agg AS (
    SELECT source,
           SUM(CAST(POWER(2, 53 - m_reg) AS BIGINT)) AS s_present,
           COUNT(*) AS n_buckets
    FROM allregs GROUP BY source
),
est0 AS (
    SELECT source,
           1024 - n_buckets AS v_zero,
           {_HLL_ALPHA}
             / CAST(s_present + (1024 - n_buckets) * 9007199254740992 AS DOUBLE) AS e_raw
    FROM agg
),
est AS (
    SELECT source, v_zero,
           ROUND(CASE WHEN e_raw <= 2560.0 AND v_zero > 0
                      THEN 1024.0 * ln(1024.0 / v_zero)
                      ELSE e_raw END, 4) AS estimate
    FROM est0
)
SELECT e.source,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       CAST(e.v_zero AS BIGINT) AS v_zero,
       e.estimate,
       ROUND(ABS(e.estimate - x.n_exact) / x.n_exact, 6) AS rel_error
FROM est e JOIN exact x ON e.source = x.source
""",
)
def q_hll_vocab_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-token cardinality per source PLUS the
    register-wise-MAX merged '__all__' row — the mergeable-sketch family's
    missing leg (KMV/CMS/Bloom/DDSketch landed earlier), under a FULL
    DuckDB hash oracle: every register bit is pinned by md5 string ops
    (see operators/aggregates.hll_distinct_sketch), refuting the 'HLL
    oracles are impossible' caveat the KMV docstring recorded for
    library-layout HLLs."""
    from ..functions.text import words as _words
    from ..operators.aggregates import hll_distinct_sketch

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("source", F.explode(_words(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    return hll_distinct_sketch(toks, ["source"], "tok", p=10, include_merged=True)


@register(
    "containment_pairs",
    f"""
WITH {_SHINGLES_CTE.strip().replace("sh AS", "sh0 AS")},
sh AS (
    SELECT * FROM sh0 WHERE shingle NOT IN (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs AS (
    SELECT doc_a, doc_b, inter, sa.n_sh AS na, sb.n_sh AS nb
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
),
dirs AS (
    SELECT doc_a AS contained, doc_b AS container, na AS n_contained,
           nb AS n_container, ROUND(inter / na, 6) AS containment
    FROM pairs
    UNION ALL
    SELECT doc_b, doc_a, nb, na, ROUND(inter / nb, 6) FROM pairs
)
SELECT contained, container,
       CAST(n_contained AS BIGINT) AS n_contained,
       CAST(n_container AS BIGINT) AS n_container,
       containment
FROM dirs
WHERE containment >= 0.8 AND n_contained >= 5
""",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment (doc-in-doc / quote detection) —
    the third dedup pass symmetric Jaccard can't express: high
    |A∩B|/|A| with low |A∩B|/|A∪B| means a small doc living verbatim
    inside a bigger one. Shares the memoized shingle relation with the
    Jaccard/MinHash family."""
    docs = load_table(spark, "documents", sf_dir)
    return dd.containment_pairs(docs, sh=_shingles_shared(spark, sf_dir))


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (round-5: the scoring model TF-IDF feeds into)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "bm25_search",
    f"""
WITH tok AS (
    SELECT doc_id, unnest({SQL_WORDS.format(c="text")}) AS tok FROM documents
),
tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok2 GROUP BY doc_id),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_tokens
    FROM dl
),
tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok2 WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, tok
),
df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
contrib AS (
    SELECT tf.doc_id,
           CAST(ROUND(
               LN(1 + (CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B}
                  * (CAST(d.dl AS DOUBLE) / (CAST(s.total_tokens AS DOUBLE) / s.n_docs)))),
               12) AS DECIMAL(26,12)) AS w
    FROM tf
    JOIN df ON df.tok = tf.tok
    JOIN dl d ON d.doc_id = tf.doc_id
    CROSS JOIN stats s
),
scored AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS terms_matched, SUM(w) AS score_dec
    FROM contrib GROUP BY doc_id
)
SELECT doc_id, terms_matched, ROUND(CAST(score_dec AS DOUBLE), 6) AS bm25
FROM scored
ORDER BY score_dec DESC, doc_id ASC
LIMIT 20
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones; the Lucene-style
    ln(1 + (N−df+0.5)/(df+0.5)) idf) for a fixed query over the documents
    table — top-20 by summed term score with k1=1.2, b=0.75 length
    normalization. The retrieval counterpart to ``tfidf_top_terms``
    (which tags docs; this RANKS them for a query — together they are
    the lexical-search surface of the corpus stack).

    Scale design: postings are generated only for the |query| terms (the
    IN prunes before the tf aggregate), df is query-term-sized and the
    corpus stats are a 1-row broadcast; per-(doc,term) contributions are
    12dp-rounded decimals so the summed score — and therefore the top-20
    ranking — is engine-exact. One explode + two aggregates + one tiny
    TakeOrdered; no global sort."""
    from ..functions.text import words as _words

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("tok")).filter(
        F.col("tok") != ""
    )
    # ONE tokenize pass (r11): the dl/stats/tf/contrib split evaluated the
    # tokenize+explode subtree FOUR times (Catalyst inlines shared
    # subtrees; each was a back-to-back ~0.7 s fused scan stage). Document
    # length and the per-query-term counts pivot into one groupBy(doc_id)
    # aggregate — tf(doc, t) = SUM(tok = t) is the same integer as the old
    # per-(doc, tok) COUNT(*), dl rides in the same row (no dl join), and
    # the tiny checkpoint (|docs| rows) feeds stats/tf/df/contrib without
    # re-tokenizing. Scoring expression and oracle unchanged.
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"),
        *[
            F.sum((F.col("tok") == t).cast("long")).cast("long").alias(f"_tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    term_structs = F.array(
        *[
            F.struct(F.lit(t).alias("tok"), F.col(f"_tf_{i}").alias("tf"))
            for i, t in enumerate(_BM25_TERMS)
        ]
    )
    tf = (
        per_doc.select("doc_id", "dl", F.explode(term_structs).alias("_s"))
        .select("doc_id", "dl", F.col("_s.tok").alias("tok"), F.col("_s.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1
                        - _BM25_B
                        + _BM25_B
                        * (
                            F.col("dl").cast("double")
                            / (F.col("total_tokens").cast("double") / F.col("n_docs"))
                        )
                    )
                ),
                12,
            ).cast("decimal(26,12)").alias("w"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("terms_matched"),
        F.sum("w").alias("score_dec"),
    )
    return (
        scored.orderBy(F.desc("score_dec"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            "terms_matched",
            F.round(F.col("score_dec").cast("double"), 6).alias("bm25"),
        )
    )


def _ivf_pq_oracle_sql(
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    rerank: int = 20,
    dim: int = 64,
) -> str:
    """Unrolled DuckDB mirror of sim.ivf_pq_topk: same coarse-quantizer
    CTEs as ann_ivf_hash_topk; subspace relation with s as a column;
    Lloyd-trained codebooks (md5 seed, 9dp distances, DECIMAL means at
    12dp — the kmeans_codebook convention, iteration CTEs MATERIALIZED);
    squared-and-rounded subspace distances; dense code POSITIONS; an
    order-free DECIMAL ADC folded per (query, neighbor); top-``rerank``
    ADC shortlist exactly re-ranked by the shared 6dp cosine."""
    sub = dim // m
    sb_union = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS s, v[{s * sub + 1}:{s * sub + sub}] AS sv, "
        f"('0x' || substr(md5(concat('pq{s}_', vec_id)), 1, 8))::BIGINT AS h2 FROM e"
        for s in range(m)
    )
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v, "
        "('0x' || substr(md5(concat('ivf_', vec_id)), 1, 8))::BIGINT AS h FROM embeddings)",
        "cent AS MATERIALIZED (SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell "
        f"FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT {n_cells}))",
        "sims AS MATERIALIZED (SELECT e.vec_id, c.cell, "
        "ROUND(list_dot_product(e.v, c.cv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos "
        "FROM e CROSS JOIN cent c)",
        "ranked_cells AS MATERIALIZED (SELECT vec_id, cell, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS r FROM sims)",
        "assign AS MATERIALIZED (SELECT vec_id, cell FROM ranked_cells WHERE r = 1)",
        f"probe AS MATERIALIZED (SELECT vec_id, cell FROM ranked_cells WHERE r <= {n_probe})",
        f"sdims AS MATERIALIZED (SELECT UNNEST(range(1, {sub + 1})) AS dim)",
        f"sb AS MATERIALIZED ({sb_union})",
        "c0 AS MATERIALIZED (SELECT s, rn - 1 AS code, sv AS cv FROM ("
        "SELECT s, sv, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h2, vec_id) AS rn FROM sb) "
        f"WHERE rn <= {n_codes})",
    ]
    for i in range(1, iters + 1):
        pr = i - 1
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT b.vec_id, b.s, c.code, "
            f"ROUND(list_distance(b.sv, c.cv), 9) AS d FROM sb b JOIN c{pr} c ON c.s = b.s)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vec_id, s, code FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d ASC, code ASC) AS r "
            f"FROM d{i}) WHERE r = 1)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT a.s, a.code, sdims.dim, "
            f"ROUND(CAST(SUM(CAST(ROUND(b.sv[sdims.dim], 9) AS DECIMAL(26,12))) AS DOUBLE) "
            f"/ COUNT(*), 12) AS mv "
            f"FROM a{i} a JOIN sb b ON b.vec_id = a.vec_id AND b.s = a.s CROSS JOIN sdims "
            f"GROUP BY a.s, a.code, sdims.dim)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT s, code, list(mv ORDER BY dim) AS cv "
            f"FROM m{i} GROUP BY s, code)"
        )
    parts.append(
        f"pb AS MATERIALIZED (SELECT s, code, cv, "
        f"ROW_NUMBER() OVER (PARTITION BY s ORDER BY code) - 1 AS pos FROM c{iters})"
    )
    parts.append(
        "pd AS MATERIALIZED (SELECT b.vec_id, b.s, p.code, p.pos, "
        "ROUND(ROUND(list_distance(b.sv, p.cv), 9) * ROUND(list_distance(b.sv, p.cv), 9), 9) AS d2 "
        "FROM sb b JOIN pb p ON p.s = b.s)"
    )
    parts.append(
        "enc AS MATERIALIZED (SELECT vec_id, s, pos FROM ("
        "SELECT vec_id, s, pos, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, code ASC) AS r "
        "FROM pd) WHERE r = 1)"
    )
    parts.append(
        "cand AS MATERIALIZED (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id "
        "FROM probe p JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id)"
    )
    parts.append(
        "res AS MATERIALIZED (SELECT c.query_id, c.neighbor_id, "
        "ROUND(CAST(SUM(CAST(l.d2 AS DECIMAL(26,12))) AS DOUBLE), 6) AS adc "
        "FROM cand c JOIN enc x ON x.vec_id = c.neighbor_id "
        "JOIN pd l ON l.vec_id = c.query_id AND l.s = x.s AND l.pos = x.pos "
        "GROUP BY c.query_id, c.neighbor_id)"
    )
    parts.append(
        "short AS MATERIALIZED (SELECT query_id, neighbor_id FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS r "
        f"FROM res) WHERE r <= {rerank})"
    )
    parts.append(
        "fin AS MATERIALIZED (SELECT s.query_id, s.neighbor_id, "
        "ROUND(list_dot_product(ea.v, eb.v) / "
        "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine "
        "FROM short s JOIN e ea ON ea.vec_id = s.query_id JOIN e eb ON eb.vec_id = s.neighbor_id)"
    )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT query_id, rank, neighbor_id, cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM fin)
WHERE rank <= {k}
"""
    )


def _ivf_pq_index(spark: SparkSession, sf_dir: str) -> dict:
    """The trained IVF-PQ index (sub-codebooks, dense codes, inverted
    file, coarse-centroid source rows), served from the fingerprint-keyed
    parquet artifact store — the vector-search half of the
    offline-train / online-serve split the hybrid recommender's models
    already run (r5 verdict #6 pattern). A fingerprint hit READS the
    index (no Lloyd jobs, no encode); a miss (first run, changed corpus,
    changed config) trains via sim.ivf_pq_train and persists. Every
    artifact is integer- or round-pinned, so the served search output is
    hash-identical to inline training (identity + freshness
    gate-tested)."""
    from ..ml import recsys_store as rs
    from ._memo import memo

    def build():
        emb = load_table(spark, "embeddings", sf_dir)
        # content-sensitive fingerprint: count + max id alone would serve a
        # stale index after an in-place embedding regeneration (same ids,
        # same count, new values) — fold in an order-independent CRC sum
        # over (vec_id, first component rounded to 6dp) so any value change
        # moves the store path and forces a retrain
        agg = emb.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("vec_id").alias("mx"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        "_",
                        F.col("vec_id"),
                        F.round(F.element_at("embedding", 1).cast("double"), 6),
                    )
                )
            ).alias("sig"),
        ).collect()[0]
        # the trainer's ALGO_VERSION is part of the key (r10, r9 verdict
        # #4): an ivf_pq_train code change re-trains automatically
        fp = (
            f"ivfpq_v1_av{sim.IVF_PQ_ALGO_VERSION}"
            f"_c16m16x32i2_n{agg['n']}_mx{agg['mx']}_s{agg['sig']}"
        )
        path = rs.store_path(fp)
        names = ("pq_codebooks", "pq_codes", "ivf_assign", "coarse_centroids")
        loaded = rs.load_artifacts(spark, path, names)
        if loaded is not None:
            return loaded
        return rs.save_artifacts(
            spark, path, sim.ivf_pq_train(emb, n_cells=16, m=16, n_codes=32, iters=2)
        )

    return memo(spark, ("ivf_pq_index", sf_dir), build)


@register("ann_ivf_pq_topk", _ivf_pq_oracle_sql(k=5, n_cells=16, n_probe=10, m=16, n_codes=32, iters=2, rerank=60, dim=64))
def q_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN with exact refine (memory-compressed vector search):
    coarse inverted-file candidate restriction + Lloyd-trained
    product-quantized asymmetric distance — each index vector travels to
    the pair stage as m=16 small codes, each query as a 16×32-entry
    lookup table, so per-pair cost is 16 table lookups and the raw
    64-dim vectors never reach the candidate join; only the ADC
    top-``rerank`` shortlist gets the exact cosine. The full pipeline (training iterates, codes, LUTs,
    ADC shortlist, refined top-k) is hash-checked against the unrolled
    oracle; recall-vs-brute is a pytest invariant. The default is the
    SERVABLE operating point picked from ivf_probe_recall_audit's sweep
    (r5 verdict: the old n_probe=2/m=8/rerank=20 default sat at 0.275
    recall@5): n_probe=10 of 16 cells + 16 subspaces x 32 codes +
    rerank=60 measures recall@5 = 0.81 on this corpus. The synthetic
    embeddings are near-isotropic (audited recall ~= 1.3x the probed
    fraction at every quantizer granularity), so a 0.8 point costs a
    10/16 probe fraction here; on a naturally clustered corpus the same
    audit picks a far smaller fraction — the INSTRUMENT, not this
    corpus's curve, is the production artifact. Completes the ANN
    family: brute / LSH / IVF-exact-rerank / IVF-PQ-refine. Round 6:
    the trained index persists in the parquet artifact store
    (_ivf_pq_index) and this query SERVES from it — the query-side work
    is the probe ranking + LUT scan + ADC join + exact refine only."""
    return sim.ivf_pq_search(
        load_table(spark, "embeddings", sf_dir),
        _ivf_pq_index(spark, sf_dir),
        k=5, n_probe=10, rerank=60,
    )


def _ivf_probe_audit_oracle_sql(k: int = 5, n_cells: int = 16, probes=(1, 2, 4)) -> str:
    """Unrolled DuckDB mirror of q_ivf_probe_recall_audit: the exact
    brute-force top-k as ground truth, the ivf_hash candidate chain once,
    then one recall row per probe depth — the ANN counterpart of
    lsh_recall_audit's sampled-audit instrument."""
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v, "
        "('0x' || substr(md5(concat('ivf_', vec_id)), 1, 8))::BIGINT AS h FROM embeddings)",
        "bp AS MATERIALIZED (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
        "ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine "
        "FROM e a JOIN e b ON a.vec_id <> b.vec_id)",
        "brute AS MATERIALIZED (SELECT query_id, neighbor_id FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r "
        f"FROM bp) WHERE r <= {k})",
        "nb AS MATERIALIZED (SELECT COUNT(*) AS n FROM brute)",
        "cent AS MATERIALIZED (SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell "
        f"FROM (SELECT * FROM e ORDER BY h, vec_id LIMIT {n_cells}))",
        "sims AS MATERIALIZED (SELECT e.vec_id, c.cell, "
        "ROUND(list_dot_product(e.v, c.cv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos "
        "FROM e CROSS JOIN cent c)",
        "rc AS MATERIALIZED (SELECT vec_id, cell, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS r FROM sims)",
        "assign AS MATERIALIZED (SELECT vec_id, cell FROM rc WHERE r = 1)",
    ]
    sel = []
    for np_ in probes:
        parts.append(
            f"top{np_} AS MATERIALIZED (SELECT query_id, neighbor_id FROM ("
            "SELECT res.query_id, res.neighbor_id, "
            "ROW_NUMBER() OVER (PARTITION BY res.query_id ORDER BY res.cosine DESC, res.neighbor_id ASC) AS r "
            "FROM (SELECT c.query_id, c.neighbor_id, "
            "ROUND(list_dot_product(ea.v, eb.v) / "
            "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS cosine "
            f"FROM (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id "
            f"FROM (SELECT vec_id, cell FROM rc WHERE r <= {np_}) p "
            "JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id) c "
            "JOIN e ea ON ea.vec_id = c.query_id JOIN e eb ON eb.vec_id = c.neighbor_id) res"
            f") WHERE r <= {k})"
        )
        sel.append(
            f"SELECT {np_} AS n_probe, CAST(nb.n AS BIGINT) AS n_exact, "
            f"CAST((SELECT COUNT(*) FROM brute br JOIN top{np_} t "
            "ON t.query_id = br.query_id AND t.neighbor_id = br.neighbor_id) AS BIGINT) AS n_hit, "
            f"ROUND(CAST((SELECT COUNT(*) FROM brute br JOIN top{np_} t "
            "ON t.query_id = br.query_id AND t.neighbor_id = br.neighbor_id) AS DOUBLE) / nb.n, 6) AS recall "
            "FROM nb"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


@register("ivf_probe_recall_audit", _ivf_probe_audit_oracle_sql(k=5, n_cells=16, probes=(2, 4, 10)))
def q_ivf_probe_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN observability: recall@5 of the deterministic-centroid IVF
    against exact brute force at probe depths 2 / 4 / 10 (the last being
    ann_ivf_pq_topk's servable default, recall@5 >= 0.8) — the
    probe-budget sweep a vector-search deployment runs on a sample
    before picking its latency/recall operating point (the ANN
    counterpart of lsh_recall_audit). Both pair sets are deterministic,
    so the recall RATIOS hash-match. The brute ground truth and the
    single cell-ranking table are computed once and shared across
    probe depths."""
    from ._memo import memo

    emb = load_table(spark, "embeddings", sf_dir)
    # ann_topk is the size-dispatched BLAS form of brute_topk — identical
    # semantics (pytest-gated), ~8x cheaper ground truth
    brute = memo(
        spark,
        ("brute_topk_pairs", sf_dir),
        lambda: sim.ann_topk(emb, k=5).select("query_id", "neighbor_id"),
    )
    n_exact = brute.count()
    out = None
    for np_ in (2, 4, 10):
        ivf = (
            _ivf_hash_shared(spark, sf_dir)
            if np_ == 2
            else sim.ivf_hash_topk(emb, k=5, n_cells=16, n_probe=np_)
        ).select("query_id", "neighbor_id")
        n_hit = brute.join(ivf, ["query_id", "neighbor_id"]).count()
        row = spark.range(1).select(
            F.lit(np_).cast("int").alias("n_probe"),
            F.lit(n_exact).cast("long").alias("n_exact"),
            F.lit(n_hit).cast("long").alias("n_hit"),
            F.round(F.lit(n_hit) / F.lit(n_exact), 6).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# LLM-data mixing: temperature-weighted per-source sampling to a token budget
# ---------------------------------------------------------------------------


@register(
    "corpus_mixture_sample",
    """
WITH d AS (
    SELECT doc_id, source,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS doc_tokens,
           md5('mix_' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
),
per_src AS (
    SELECT source, CAST(SUM(doc_tokens) AS BIGINT) AS src_tokens
    FROM d GROUP BY source
),
scal AS (
    SELECT CAST(SUM(src_tokens) AS BIGINT) AS corpus_tokens,
           SUM(sqrt(CAST(src_tokens AS DOUBLE))) AS z
    FROM per_src
),
budgets AS (
    -- alpha=0.5 temperature flattening; 25%-of-corpus token budget;
    -- floor(round(.,9)) is the repo's cross-engine floor guard
    SELECT source,
           CAST(FLOOR(ROUND(sqrt(CAST(src_tokens AS DOUBLE)) / z
                            * (CAST(corpus_tokens AS DOUBLE) * 0.25), 9)) AS BIGINT) AS src_budget
    FROM per_src, scal
),
cum AS (
    SELECT doc_id, source, doc_tokens,
           CAST(SUM(doc_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
    FROM d
)
SELECT cum.doc_id, cum.source, cum.doc_tokens, cum.cum_tokens, budgets.src_budget
FROM cum JOIN budgets USING (source)
WHERE cum.cum_tokens <= budgets.src_budget
""",
)
def q_corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-data mixing: sample each source (domain) to a token budget set by
    temperature-flattened weights w_s ∝ T_s^0.5 over per-source token totals
    (the multinomial alpha-smoothing used to rebalance web-scale pretraining
    mixes), with a 25%-of-corpus total budget. Selection inside a source is
    the md5('mix_'||doc_id) prefix of the per-source cumulative token sum —
    deterministic, partition-independent, and hash-checked cross-engine.

    Scale: one map-combinable groupBy(source), one broadcast scalar/budget
    join, and a per-source prefix-sum window. Sources are few and fat at
    100 TB, so the production form of the window is the range-partitioned
    prefix-sum of operators/ranking.py (local windows + broadcast per-shard
    offsets) applied per source; the semantics here are shard-oblivious
    (md5 order), so the rewrite is drop-in. The floor on w_s·B uses the
    repo's round-9 guard (1-ulp sqrt/sum differences cannot flip it)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        "source",
        F.ceil(F.length("text") / 4).cast("long").alias("doc_tokens"),
        F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))).alias("h"),
    )
    per_src = d.groupBy("source").agg(F.sum("doc_tokens").alias("src_tokens"))
    scal = per_src.agg(
        F.sum("src_tokens").alias("corpus_tokens"),
        F.sum(F.sqrt(F.col("src_tokens").cast("double"))).alias("z"),
    )
    budgets = per_src.crossJoin(F.broadcast(scal)).select(
        "source",
        F.floor(
            F.round(
                F.sqrt(F.col("src_tokens").cast("double"))
                / F.col("z")
                * (F.col("corpus_tokens").cast("double") * F.lit(0.25)),
                9,
            )
        ).cast("long").alias("src_budget"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    cum = d.withColumn("cum_tokens", F.sum("doc_tokens").over(w))
    return (
        cum.join(F.broadcast(budgets), "source")
        .filter(F.col("cum_tokens") <= F.col("src_budget"))
        .select("doc_id", "source", "doc_tokens", "cum_tokens", "src_budget")
    )


# ---------------------------------------------------------------------------
# ANN observability: truncated-dimension (Matryoshka-style) recall audit
# ---------------------------------------------------------------------------


def _prefix_recall_oracle_sql(k: int = 5, dims=(16, 32)) -> str:
    """Unrolled DuckDB mirror of q_embedding_prefix_recall_audit: exact
    brute top-k at full dimension as ground truth, exact brute top-k on
    each dimension PREFIX, one recall row per prefix width."""
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "bp AS MATERIALIZED (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
        "ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine "
        "FROM e a JOIN e b ON a.vec_id <> b.vec_id)",
        "brute AS MATERIALIZED (SELECT query_id, neighbor_id FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r "
        f"FROM bp) WHERE r <= {k})",
        "nb AS MATERIALIZED (SELECT COUNT(*) AS n FROM brute)",
    ]
    sel = []
    for d in dims:
        parts.append(
            # zero-norm guard mirrors the Spark side (brute_topk_blas maps a
            # zero norm to 1, i.e. cosine 0): a prefix slice can be all-zero
            # even when the full vector is not, and an unguarded
            # list_cosine_similarity would yield NaN there — a cross-engine
            # hash mismatch (COALESCE(dot/NULLIF(na*nb,0),0) = 0 since dot=0)
            f"pd{d} AS MATERIALIZED (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, "
            f"ROUND(COALESCE(list_dot_product(a.v[1:{d}], b.v[1:{d}]) / "
            f"NULLIF(sqrt(list_dot_product(a.v[1:{d}], a.v[1:{d}])) * "
            f"sqrt(list_dot_product(b.v[1:{d}], b.v[1:{d}])), 0), 0), 6) AS cosine "
            "FROM e a JOIN e b ON a.vec_id <> b.vec_id)"
        )
        parts.append(
            f"top{d} AS MATERIALIZED (SELECT query_id, neighbor_id FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS r "
            f"FROM pd{d}) WHERE r <= {k})"
        )
        sel.append(
            f"SELECT {d} AS dim_prefix, CAST(nb.n AS BIGINT) AS n_exact, "
            f"CAST((SELECT COUNT(*) FROM brute br JOIN top{d} t "
            "ON t.query_id = br.query_id AND t.neighbor_id = br.neighbor_id) AS BIGINT) AS n_hit, "
            f"ROUND(CAST((SELECT COUNT(*) FROM brute br JOIN top{d} t "
            "ON t.query_id = br.query_id AND t.neighbor_id = br.neighbor_id) AS DOUBLE) / nb.n, 6) AS recall "
            "FROM nb"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


@register("embedding_prefix_recall_audit", _prefix_recall_oracle_sql(k=5, dims=(16, 32)))
def q_embedding_prefix_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN observability, dimension-budget axis: recall@5 of exact search
    on the FIRST 16 / 32 of 64 embedding dimensions against full-dim
    exact search — the truncation sweep a Matryoshka-style embedding
    deployment runs before shipping reduced-dimension indexes (the
    storage/latency knob orthogonal to ivf_probe_recall_audit's probe
    budget). Shares the memoized full-dim brute ground truth with the
    probe audit; each prefix search is the same size-dispatched ann_topk
    over sliced vectors, so at corpus scale the truncated index rides
    the LSH bucket path like any other embedding column. On this
    synthetic near-isotropic corpus the audit measures recall@5 0.12 /
    0.27 at 16 / 32 dims — information is spread evenly, so truncation
    is NOT safe here, which is precisely the go/no-go signal the
    instrument exists to give (Matryoshka-trained embeddings
    front-load variance and the same audit justifies the cut)."""
    from ._memo import memo

    emb = load_table(spark, "embeddings", sf_dir)
    brute = memo(
        spark,
        ("brute_topk_pairs", sf_dir),
        lambda: sim.ann_topk(emb, k=5).select("query_id", "neighbor_id"),
    )
    n_exact = brute.count()
    out = None
    for d in (16, 32):
        pref = emb.select("vec_id", F.slice(F.col("embedding"), 1, d).alias("pref"))
        ptk = sim.ann_topk(pref, k=5, vec_col="pref").select("query_id", "neighbor_id")
        n_hit = brute.join(ptk, ["query_id", "neighbor_id"]).count()
        row = spark.range(1).select(
            F.lit(d).cast("int").alias("dim_prefix"),
            F.lit(n_exact).cast("long").alias("n_exact"),
            F.lit(n_hit).cast("long").alias("n_hit"),
            F.round(F.lit(n_hit) / F.lit(n_exact), 6).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    return out
