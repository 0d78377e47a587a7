"""Sequence packing (catalog_r5._packing_frame): the distributed
prefix-sum decomposition must be EXACTLY invariant to shard width —
width 10^9 degenerates to the naive single-shard global cumsum, so
equality against it at several widths proves the shard/offset
decomposition correct, independent of the DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from idh_etl_demo_spark.catalog import _t
from idh_etl_demo_spark.catalog_r5 import _PACK_CTX, _packing_frame

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_packing_invariant_to_shard_width(spark):
    docs = _t(spark, SF, "documents")
    naive = _rows(_packing_frame(spark, docs, shard_width=10**9))
    for width in (1, 7, 32):
        assert _rows(_packing_frame(spark, docs, shard_width=width)) == naive


def test_packing_stream_is_contiguous(spark):
    """tokens_before must equal the running sum of n_tokens in doc_id
    order (no gaps, no overlaps), and the sequence range must cover
    exactly the doc's tokens."""
    rows = _rows(
        _packing_frame(spark, _t(spark, SF, "documents")).select(
            "doc_id", "n_tokens", "tokens_before", "first_seq", "last_seq", "n_seqs"
        )
    )
    running = 0
    for doc_id, n_tokens, before, first_seq, last_seq, n_seqs in rows:
        assert before == running, f"doc {doc_id}: gap in the token stream"
        running += n_tokens
        assert first_seq == before // _PACK_CTX
        assert last_seq == (before + max(n_tokens, 1) - 1) // _PACK_CTX
        assert n_seqs == last_seq - first_seq + 1
