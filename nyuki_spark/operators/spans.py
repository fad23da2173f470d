"""Cross-document duplicated-substring span detection.

The "substring dedup" pass of a training-data pipeline (Lee et al. 2022,
*Deduplicating Training Data Makes Language Models Better*) removes exact
token spans that recur across documents — boilerplate headers, license
blocks, templated paragraphs — which survive document-level dedup because
the *containing* documents differ. The published approach builds a corpus
suffix array; that is a single-machine construction. The distributed
re-expression here keeps the same detection contract for spans of at least
``l`` tokens using only shuffle-friendly primitives:

1. every document emits its token ``l``-grams as (doc, position, hash)
   rows — a narrow map stage (``transform`` over a ``sequence``, one
   ``posexplode``), shuffling a 16-hex-char hash instead of the gram text;
2. grams whose hash appears in >= 2 *distinct* documents are duplicated —
   one hash-partitioned aggregate with map-side partial
   ``count(distinct)`` collapse;
3. each document's duplicated gram positions are merged into maximal
   spans with the classic gaps-and-islands rewrite (``pos - row_number``)
   — one window partitioned by doc, never global.

Every stage partitions by either the gram hash or the doc id, so the plan
is three shuffles of narrow rows regardless of corpus size; no stage
materialises a suffix array or an all-pairs comparison. A 16-hex (64-bit)
hash stands in for gram equality — at 100 TB the birthday bound makes a
false merge possible but it only ever *joins* two true spans, never
invents text; the tradeoff is the same one the exact-dedup operator
documents for content hashes.

Intra-document repetition is deliberately out of scope (>= 2 *distinct*
docs): that signal is covered by ``llm_repetition_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicated_substring_spans"]


def duplicated_substring_spans(
    docs: DataFrame,
    l: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Maximal token spans of length >= ``l`` shared by >= 2 documents.

    Returns (id_col, start_pos, span_tokens): ``start_pos`` is the 0-based
    token offset of the span's first token, ``span_tokens`` its length in
    tokens (= merged gram run + ``l`` - 1).
    """
    toks = F.split(F.col(text_col), sep)
    grams = (
        docs.select(F.col(id_col), toks.alias("t"))
        .where(F.size("t") >= l)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (l - 1)),
                    lambda i: F.substring(
                        F.md5(F.concat_ws(sep, F.slice("t", i, l))), 1, 16
                    ),
                )
            ).alias("pos", "g"),
        )
    )
    # Duplicated = the gram hash occurs in >= 2 distinct docs. count(distinct)
    # runs as a two-stage partial aggregate on the 16-char hash key.
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct(id_col).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi").select(id_col, "pos")
    # Gaps-and-islands: consecutive duplicated positions share (pos - rn).
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (
        isl.groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("start_pos"),
            (F.max("pos") - F.min("pos") + l).cast("long").alias("span_tokens"),
        )
        .select(id_col, "start_pos", "span_tokens")
    )
