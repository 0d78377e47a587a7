"""Python UDTF (Spark 4 API surface): table-valued functions from Python.

The repo's hot paths stay in codegen expressions (a Python UDTF pays
serde per row-batch); this covers the API for the cases that genuinely
need imperative row generation — e.g. a decoder emitting a variable
number of typed rows per input blob — and pins the parity contract: the
UDTF must agree with the native explode formulation it would replace.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_udtf_sentence_split_matches_native(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, idx int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id, text):
            for i, s in enumerate(text.split(". ")):
                if s:
                    yield doc_id, i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    spark.createDataFrame(
        [(1, "a b. c d. e"), (2, "x"), (3, "")],
        "doc_id long, text string",
    ).createOrReplaceTempView("docs_udtf")

    got = spark.sql(
        """
        select s.doc_id, s.idx, s.sentence
        from docs_udtf, lateral sentence_split(doc_id, text) s
        order by s.doc_id, s.idx
        """
    ).collect()

    native = (
        spark.table("docs_udtf")
        .select(
            "doc_id",
            F.posexplode(F.filter(F.split("text", "\\. "), lambda s: s != "")),
        )
        .toDF("doc_id", "idx", "sentence")
        .orderBy("doc_id", "idx")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in native]
    # doc 1 -> 3 sentences, doc 2 -> 1 (unsplit), doc 3 empty -> 0 rows
    assert len(got) == 4
