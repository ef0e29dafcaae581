"""Vocabulary-induction operators for training-data pipelines.

BPE-style tokenizer training starts from a word-frequency table and
repeatedly merges the most frequent adjacent symbol pair; the expensive,
corpus-wide step is the weighted pair count, which is exactly one
explode + one aggregate here. (Reference parity: the upstream project
`aws-samples/accelerated-data-lake` delegates analytics to Athena and has
no tokenizer tooling; this extends the engine toward the LLM-pipeline
north star documented in SURVEY.md §2 M.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


@query(
    "llm_bpe_pair_count",
    oracle="""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
), wc AS (
  SELECT word, count(*) AS wn FROM w WHERE word <> '' GROUP BY word
), p AS (
  SELECT substring(word, CAST(i AS INT), 2) AS pair, wn
  FROM wc, unnest(generate_series(1, len(word) - 1)) AS t(i)
  WHERE len(word) >= 2
)
SELECT pair, sum(wn) AS pair_count
FROM p GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 50
""",
)
def llm_bpe_pair_count(spark, sf_dir):
    """One BPE merge step: corpus-weighted adjacent character-pair
    frequencies, top 50. This is the inner loop of byte-pair-encoding
    tokenizer training (Sennrich et al. 2016): count every adjacent
    symbol pair weighted by word frequency, merge the winner, repeat.

    Shape at scale: the corpus collapses to its word-frequency table
    first (vocabulary-sized — millions of rows at 100 TB, not billions),
    so the pair explode and the pair aggregate run over vocab-sized
    input no matter how large the corpus is; both aggregates are
    map-side combinable, and the top-50 is TakeOrderedAndProject (no
    global sort materialization). Later merge iterations operate on the
    same vocab-sized table with re-segmented symbols — the corpus is
    touched exactly once.
    """
    words = (
        tables.load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    pairs = wc.where(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wn",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(50)
    )
