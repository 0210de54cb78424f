"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (tables pre-registered
as views: region nation customer supplier part orders lineitem events
documents embeddings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.kernel.distances import STANDARD, TRANSPOSITION
from liblevenshtein_rust_spark.operators import matching
from liblevenshtein_rust_spark.sources import tables

# ---------------------------------------------------------------------------
# shared fixtures: probe terms (typos of the documents vocabulary)
# ---------------------------------------------------------------------------

PROBES = [
    "jion",      # join (transposition)
    "hsah",      # hash (transposition)
    "bacth",     # batch (transposition)
    "scann",     # scan (insertion)
    "colunm",    # column (transposition)
    "filtre",    # filter (transposition)
    "smal",      # small (deletion)
    "mrege",     # merge (transposition)
    "ordre",     # order (transposition)
    "vectro",    # vector (transposition)
    "lien",      # line (transposition)
    "dat",       # data (deletion)
    "tabel",     # table (transposition)
    "qury",      # query (deletion)
    "windwo",    # window (transposition)
    "customer",  # exact
    "spark",     # exact
    "zzzzzz",    # no match
]

PREFIX_PROBES = ["cust", "filt", "vect", "wind", "qry", "stram"]

_PROBES_SQL_VALUES = ", ".join(f"('{p}')" for p in PROBES)
_PREFIX_PROBES_SQL_VALUES = ", ".join(f"('{p}')" for p in PREFIX_PROBES)

# DuckDB CTE: the distinct token vocabulary of documents.text
_TOKS_CTE = """
toks AS (
    SELECT DISTINCT t AS term FROM (
        SELECT unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS t
        FROM documents
    ) WHERE t <> ''
),
probes AS (SELECT * FROM (VALUES {probes}) v(query))
"""


def _probes_df(spark: SparkSession, probes=None) -> DataFrame:
    return spark.createDataFrame([(p,) for p in (probes or PROBES)], "query string")


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct token vocabulary of documents.text — the 'dictionary'."""
    docs = tables.documents(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")).alias("term")
    )
    return toks.where(F.col("term") != "").distinct()


def _doc_token_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id) pairs — the MappedDictionary analog."""
    docs = tables.documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " "), " ")).alias("term"),
    )
    return toks.where(F.col("term") != "")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_fuzzy_query_d2_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transducer::query_with_distance, standard variant, n=2."""
    return matching.fuzzy_query(
        _probes_df(spark), _doc_tokens(spark, sf_dir), 2, STANDARD
    ).select("query", "term", F.col("distance").cast("int").alias("distance"))


def q_fuzzy_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query_ordered + top-k (distance ASC, term ASC), k=3."""
    return matching.fuzzy_query_ordered(
        _probes_df(spark), _doc_tokens(spark, sf_dir), 2, STANDARD, limit=3
    ).select("query", "term", F.col("distance").cast("int").alias("distance"))


def q_fuzzy_query_transposition_d1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damerau/OSA variant at n=1 (OSA == full-DL at distance <= 1)."""
    return matching.fuzzy_query(
        _probes_df(spark), _doc_tokens(spark, sf_dir), 1, TRANSPOSITION
    ).select("query", "term", F.col("distance").cast("int").alias("distance"))


def q_fuzzy_query_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-mode query (autocomplete): distance to the best term prefix."""
    return matching.fuzzy_query(
        _probes_df(spark, PREFIX_PROBES),
        _doc_tokens(spark, sf_dir),
        1,
        STANDARD,
        prefix_mode=True,
    ).select("query", "term", F.col("distance").cast("int").alias("distance"))


def q_exact_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary::contains — left-semi join on the term."""
    return _probes_df(spark).join(
        _doc_tokens(spark, sf_dir),
        F.col("query") == F.col("term"),
        "left_semi",
    )


def q_fuzzy_multimap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FuzzyMultiMap::query — fuzzy key match + value-set aggregation."""
    out = matching.fuzzy_multimap_query(
        _probes_df(spark), _doc_token_map(spark, sf_dir), 1, STANDARD,
        value_col="doc_id",
    )
    return out.select(
        "query",
        F.col("n_values").cast("bigint").alias("n_values"),
        F.col("min_value").cast("bigint").alias("min_value"),
        F.col("max_value").cast("bigint").alias("max_value"),
        F.col("n_terms").cast("bigint").alias("n_terms"),
    )


def q_blocking_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-construction analog: 3-gram blocking keys over the vocabulary,
    with per-key term counts (DAWG suffix-sharing ≈ key dedupe + counts)."""
    from liblevenshtein_rust_spark.functions.blocking_keys import (
        ngram_keys_unpositioned,
    )

    toks = _doc_tokens(spark, sf_dir)
    keys = toks.select(
        F.col("term"), F.explode(ngram_keys_unpositioned(F.col("term"), 3)).alias("key")
    )
    return keys.groupBy("key").agg(
        F.countDistinct("term").cast("bigint").alias("n_terms")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "fuzzy_query_d2_standard": q_fuzzy_query_d2_standard,
    "fuzzy_query_topk": q_fuzzy_query_topk,
    "fuzzy_query_transposition_d1": q_fuzzy_query_transposition_d1,
    "fuzzy_query_prefix": q_fuzzy_query_prefix,
    "exact_contains": q_exact_contains,
    "fuzzy_multimap": q_fuzzy_multimap,
    "blocking_key_stats": q_blocking_key_stats,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ordered fuzzy query over sf0.001 (driver checks rows>0)."""
    return q_fuzzy_query_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    toks = _TOKS_CTE.format(probes=_PROBES_SQL_VALUES)
    toks_prefix = _TOKS_CTE.format(probes=_PREFIX_PROBES_SQL_VALUES)
    return {
        "fuzzy_query_d2_standard": f"""
            WITH {toks}
            SELECT p.query, t.term, levenshtein(p.query, t.term)::INT AS distance
            FROM probes p, toks t
            WHERE levenshtein(p.query, t.term) <= 2
        """,
        "fuzzy_query_topk": f"""
            WITH {toks},
            scored AS (
                SELECT p.query, t.term, levenshtein(p.query, t.term)::INT AS distance
                FROM probes p, toks t
                WHERE levenshtein(p.query, t.term) <= 2
            )
            SELECT query, term, distance FROM (
                SELECT query, term, distance,
                       row_number() OVER (PARTITION BY query ORDER BY distance, term) AS rk
                FROM scored
            ) WHERE rk <= 3
        """,
        "fuzzy_query_transposition_d1": f"""
            WITH {toks}
            SELECT p.query, t.term, damerau_levenshtein(p.query, t.term)::INT AS distance
            FROM probes p, toks t
            WHERE damerau_levenshtein(p.query, t.term) <= 1
        """,
        "fuzzy_query_prefix": f"""
            WITH {toks_prefix}
            SELECT query, term, distance FROM (
                SELECT p.query, t.term,
                       min(levenshtein(p.query, substr(t.term, 1, g.k)))::INT AS distance
                FROM probes p, toks t, generate_series(0, 64) g(k)
                WHERE g.k <= length(t.term)
                GROUP BY p.query, t.term
            ) WHERE distance <= 1
        """,
        "exact_contains": f"""
            WITH {toks}
            SELECT p.query FROM probes p
            WHERE p.query IN (SELECT term FROM toks)
        """,
        "fuzzy_multimap": f"""
            WITH {toks},
            tokmap AS (
                SELECT doc_id, t AS term FROM (
                    SELECT doc_id,
                           unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS t
                    FROM documents
                ) WHERE t <> ''
            ),
            matched AS (
                SELECT p.query, t.term FROM probes p, toks t
                WHERE levenshtein(p.query, t.term) <= 1
            )
            SELECT m.query,
                   count(DISTINCT tm.doc_id)::BIGINT AS n_values,
                   min(tm.doc_id)::BIGINT AS min_value,
                   max(tm.doc_id)::BIGINT AS max_value,
                   count(DISTINCT m.term)::BIGINT AS n_terms
            FROM matched m JOIN tokmap tm ON m.term = tm.term
            GROUP BY m.query
        """,
        "blocking_key_stats": f"""
            WITH {toks},
            keys AS (
                SELECT DISTINCT term,
                       CASE WHEN length(term) < 3 THEN term
                            ELSE substr(term, g.k, 3) END AS key
                FROM toks, generate_series(1, 64) g(k)
                WHERE g.k <= greatest(length(term) - 2, 1)
            )
            SELECT key, count(DISTINCT term)::BIGINT AS n_terms
            FROM keys GROUP BY key
        """,
    }
