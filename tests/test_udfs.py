from __future__ import annotations

import math

from pyspark.sql import functions as F

from callysto_spark.functions.udfs import sentence_udtf, weighted_mean, zscore


def test_scalar_pandas_udf(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double").coalesce(1)
    out = [r["z"] for r in df.select(zscore("v").alias("z")).collect()]
    assert math.isclose(sum(out), 0.0, abs_tol=1e-9)


def test_grouped_agg_pandas_udf(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 1.0)], "k string, v double, w double"
    )
    got = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert math.isclose(got["a"], (1 * 1 + 3 * 3) / 4)
    assert got["b"] == 10.0


def test_udtf_sentence_split(spark):
    SplitSentences = sentence_udtf()
    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.sql(
        "SELECT s.* FROM (SELECT 'Hello world. How are you? Fine!' AS t), "
        "LATERAL split_sentences(t) s"
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(0, "Hello world", 2), (1, "How are you", 3), (2, "Fine", 1)]


def test_udtf_sentence_idx_dense_across_empty_segments(spark):
    # consecutive terminators ("Hi!? Ok.") create empty raw segments; a
    # raw-segment enumerate left gaps in idx, breaking idx-keyed joins
    # and max(idx)+1 counts (r7 review)
    SplitSentences = sentence_udtf()
    spark.udtf.register("split_sentences_dense", SplitSentences)
    df = spark.sql(
        "SELECT s.* FROM (SELECT 'Hi!? Ok.' AS t), LATERAL split_sentences_dense(t) s"
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(0, "Hi", 1), (1, "Ok", 1)]
