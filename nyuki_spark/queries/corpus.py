"""Corpus-hygiene queries: PII redaction, URL parsing, deterministic
sampling / source mixing (SURVEY.md §2.10 extension surface).

The fixture text is synthetic word salad with no organic PII or URLs, so
each query *constructs* its match content deterministically from doc_id —
with the identical expression on the Spark and DuckDB sides — then applies
the operator. Every row exercises the regex/hash machinery and the hash
compare stays meaningful (an engine that mis-redacts or mis-hashes any
single row fails the gate).

Dialect notes encoded here: DuckDB ``REGEXP_REPLACE`` replaces only the
first match unless the ``'g'`` flag is passed (Spark always replaces all);
DuckDB has no ``regexp_count`` (use ``LEN(REGEXP_EXTRACT_ALL(...))``);
patterns stay inside the Java-regex ∩ RE2 subset so both engines compile
them identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyuki_spark.catalog import load_table
from nyuki_spark.functions.text import PII_RULES, pii_counts, redact_pii
from nyuki_spark.operators.sample import hash_fraction
from nyuki_spark.queries.registry import register

# -- PII redaction -----------------------------------------------------------

# Suffix injected into every document, in both engines: one email (varies
# by doc_id), one phone, one IPv4 (varies), one SSN-like id (varies).
_PII_SUFFIX_SPARK = lambda: F.concat(  # noqa: E731 — tiny expression factory
    F.lit(" reach: user"),
    F.col("doc_id").cast("string"),
    F.lit("@mail.example.org or 555-867-5309; host 10.42."),
    (F.col("doc_id") % 200).cast("string"),
    F.lit(".7 id 123-45-"),
    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
)
_PII_SUFFIX_DUCK = (
    "' reach: user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.org or 555-867-5309; host 10.42.'"
    " || CAST(doc_id % 200 AS VARCHAR) || '.7 id 123-45-'"
    " || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pii = docs.withColumn("pii_text", F.concat(F.col("text"), _PII_SUFFIX_SPARK()))
    return (
        pii.select(
            "doc_id",
            redact_pii("pii_text").alias("redacted"),
            *pii_counts("pii_text"),
        )
        .orderBy("doc_id")
    )


def _duck_redact(expr: str) -> str:
    for _tag, pattern, repl in PII_RULES:
        expr = f"REGEXP_REPLACE({expr}, '{pattern}', '{repl}', 'g')"
    return expr


register(
    "llm_pii_redact",
    engine_fn=_pii_fn,
    oracle=(
        "SELECT doc_id, " + _duck_redact("pii_text") + " AS redacted,\n"
        + ",\n".join(
            f"LEN(REGEXP_EXTRACT_ALL(pii_text, '{p}')) AS n_{t}"
            for t, p, _r in PII_RULES
        )
        + "\nFROM (SELECT doc_id, text || " + _PII_SUFFIX_DUCK + " AS pii_text\n"
        "      FROM documents)\n"
        "ORDER BY doc_id"
    ),
    category="llm-text",
    suite="extension",
    doc=(
        "PII redaction (email/SSN/phone/IPv4 -> typed tags) + per-rule "
        "match counts; ordered regexp_replace chain, pure Column, "
        "replicated rule-for-rule in DuckDB"
    ),
)


# -- URL parsing -------------------------------------------------------------

_URL_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("https://cdn"),
    (F.col("doc_id") % 7).cast("string"),
    F.lit(".host"),
    (F.col("doc_id") % 3).cast("string"),
    F.lit(".example.com/p/"),
    F.col("doc_id").cast("string"),
    F.lit("/view?q=w"),
    (F.col("doc_id") % 5).cast("string"),
    F.lit("&lang="),
    F.col("lang"),
)
_URL_DUCK = (
    "'https://cdn' || CAST(doc_id % 7 AS VARCHAR) || '.host'"
    " || CAST(doc_id % 3 AS VARCHAR) || '.example.com/p/'"
    " || CAST(doc_id AS VARCHAR) || '/view?q=w' || CAST(doc_id % 5 AS VARCHAR)"
    " || '&lang=' || lang"
)


def _url_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = docs.withColumn("url", _URL_SPARK())
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return (
        url.select(
            "doc_id",
            host.alias("host"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
            # registrable domain = last two host labels
            F.substring_index(host, ".", -2).alias("domain"),
        )
        .orderBy("doc_id")
    )


register(
    "llm_url_extract",
    engine_fn=_url_fn,
    oracle=(
        "SELECT doc_id,\n"
        "  REGEXP_EXTRACT(url, '^[a-z]+://([^/]+)', 1) AS host,\n"
        "  REGEXP_EXTRACT(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,\n"
        "  REGEXP_EXTRACT(url, '\\?(.*)$', 1) AS query,\n"
        "  REGEXP_EXTRACT(REGEXP_EXTRACT(url, '^[a-z]+://([^/]+)', 1),\n"
        "                 '[^.]+\\.[^.]+$', 0) AS domain\n"
        "FROM (SELECT doc_id, " + _URL_DUCK + " AS url FROM documents)\n"
        "ORDER BY doc_id"
    ),
    category="llm-text",
    suite="extension",
    doc=(
        "URL decomposition (host/path/query/registrable domain) via Spark's "
        "JVM parse_url; oracle re-derives each part with RE2 regexes"
    ),
)


# -- deterministic sampling / source mixing ----------------------------------


def _mix_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.substring(F.col("source"), 4, 10).cast("int") % 4
    rate = (
        F.when(n == 0, 1.0)
        .when(n == 1, 0.5)
        .when(n == 2, 0.25)
        .otherwise(0.125)
    )
    kept = hash_fraction("doc_id") < rate
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
        )
        .orderBy("source")
    )


register(
    "llm_data_mix",
    engine_fn=_mix_fn,
    oracle=(
        "SELECT source, COUNT(*) AS n_total,\n"
        "  COUNT(CASE WHEN ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT\n"
        "                  / 4294967296.0 < rate THEN 1 END) AS n_kept\n"
        "FROM (SELECT doc_id, source,\n"
        "        CASE CAST(SUBSTR(source, 4, 10) AS INT) % 4\n"
        "          WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 WHEN 2 THEN 0.25\n"
        "          ELSE 0.125 END AS rate\n"
        "      FROM documents)\n"
        "GROUP BY source ORDER BY source"
    ),
    category="llm-sampling",
    suite="extension",
    doc=(
        "weighted source mixing via reproducible hash sampling: keep-rate "
        "per source as a literal CASE, row fate = md5(doc_id) uniform draw "
        "— identical sample in Spark and DuckDB, no RNG, no shuffle"
    ),
)
