"""Property tests for the round-5 operators, beyond the DuckDB hash parity
in test_oracle_parity: invariants a hash match alone would not articulate."""

from __future__ import annotations

from olap_db_spark.operators.aggregates import agg_median_exact, agg_sum_map
from olap_db_spark.operators.events_ts import join_asof_nearest, ts_sequence_match
from olap_db_spark.operators.text_analysis import (
    _CHUNK,
    _STRIDE,
    text_doc_chunking,
    text_pii_redact,
    text_repetition_stats,
)


def test_sequence_match_is_monotone(spark, sf_dir):
    """The three sequence flags form a chain: view>=view→click>=full seq,
    and per-user flags are 0/1."""
    rows = ts_sequence_match(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.saw_view in (0, 1)
        assert r.saw_view >= r.seq_view_click >= r.seq_view_click_purchase


def test_asof_nearest_sides_and_deltas(spark, sf_dir):
    rows = join_asof_nearest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.side == "none":
            assert r.delta_us is None
        else:
            assert r.side in ("prev", "next")
            assert r.delta_us is not None and r.delta_us >= 0


def test_median_exact_brackets(spark, sf_dir):
    """2*median sits between 4*q25/2 and 4*q75/2 for every group."""
    for r in agg_median_exact(spark, sf_dir).collect():
        assert r.q25x4_cents <= 2 * r.med2_cents <= r.q75x4_cents
        assert r.n > 0


def test_sum_map_is_canonical(spark, sf_dir):
    """Serialized map entries are key-sorted and count matches n_types."""
    for r in agg_sum_map(spark, sf_dir).collect():
        keys = [e.split(":")[0] for e in r.sum_map.split(",")]
        assert keys == sorted(keys)
        assert len(keys) == r.n_types


def test_pii_redact_removes_all_pii(spark, sf_dir):
    """After redaction the injected email/IP/phone never survive, and each
    doc detected at least one of each injected artifact."""
    for r in text_pii_redact(spark, sf_dir).collect():
        assert r.n_emails >= 1 and r.n_ips >= 1 and r.n_phones >= 1
        assert "@" not in r.redacted
        assert "[EMAIL]" in r.redacted and "[IP]" in r.redacted
        assert "[PHONE]" in r.redacted


def test_repetition_counts_are_consistent(spark, sf_dir):
    for r in text_repetition_stats(spark, sf_dir).collect():
        assert r.n_bigrams == max(0, r.n_tokens - 1)
        assert 0 <= r.n_dup_bigrams < max(1, r.n_bigrams + 1)
        assert r.top_bigram_n <= r.n_bigrams
        # a duplicated adjacent pair implies a duplicated bigram token pair
        assert r.n_adj_dup <= r.n_bigrams
        assert r.repetitive in (0, 1)


def test_chunking_tiles_every_document(spark, sf_dir):
    """Chunks start at k*stride, the last chunk ends exactly at n_tokens,
    and consecutive chunks overlap by chunk-stride."""
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in text_doc_chunking(spark, sf_dir).collect():
        by_doc[r.doc_id].append(r)
    assert by_doc
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = chunks[0].start_tok + 0  # recompute doc length from last chunk
        last = chunks[-1]
        n_tokens = last.start_tok + last.chunk_len
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i
            assert c.start_tok == i * _STRIDE
            assert 1 <= c.chunk_len <= _CHUNK
            if i < len(chunks) - 1:
                assert c.chunk_len == _CHUNK  # only the tail may be short
        # every token is covered: chunk i ends at start+32 >= next start
        for a, b in zip(chunks, chunks[1:]):
            assert a.start_tok + a.chunk_len >= b.start_tok
        assert n_tokens >= 1
