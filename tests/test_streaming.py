"""Structured Streaming surface: incremental store ingest, streaming
exact dedup, and the applyInPandasWithState stateful accumulator."""

import os
import time

from pyspark.sql import functions as F

from de_spark import store, streaming
from de_spark.pipeline import build
from de_spark.sources.nt import triples_from_nt_text
from tests.fixtures import BANANA_NT

NT2 = """\
<http://example.org/Mango> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example.org/Fruit> .
<http://example.org/Mango> <http://example.org/hasColor> "orange" .
"""


def test_stream_ingest_appends_new_graphs(spark, tmp_path):
    landing = tmp_path / "landing"
    os.makedirs(landing)
    (landing / "banana.nt").write_text(BANANA_NT)

    base = str(tmp_path / "store")
    # seed the store from the first file via the batch path
    build(triples_from_nt_text(spark, BANANA_NT, "file:///banana.nt"), base)

    # catch-up run 1: banana.nt is already registered → no duplicate append
    q = streaming.stream_ingest(spark, str(landing), base, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kg = store.load(spark, base)
    assert {r["graph"] for r in kg.stats.collect()} == {"file:///banana.nt"}
    assert kg.pattern(graph="file:///banana.nt").count() == 12

    # a new file lands → catch-up run 2 appends exactly that graph
    (landing / "mango.nt").write_text(NT2)
    q2 = streaming.stream_ingest(spark, str(landing), base, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    kg = store.load(spark, base)
    assert {r["graph"] for r in kg.stats.collect()} == {
        "file:///banana.nt",
        "file:///mango.nt",
    }
    assert kg.pattern(graph="file:///mango.nt").count() == 2
    # the union default graph answers across batch + streamed graphs
    got = {
        r["o"]
        for r in kg.pattern_decoded(p="http://example.org/hasColor").collect()
    }
    assert got == {'"yellow"', '"orange"'}


def _drain(stream_df, name, spark, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_exact_dedup(spark, tmp_path):
    src = tmp_path / "docs"
    os.makedirs(src)
    (src / "a.json").write_text(
        '{"doc_id": 1, "text": "same text", "source": "s1"}\n'
        '{"doc_id": 2, "text": "same text", "source": "s1"}\n'
        '{"doc_id": 3, "text": "other", "source": "s2"}\n'
    )
    schema = "doc_id LONG, text STRING, source STRING"
    docs = spark.readStream.schema(schema).json(str(src))
    out = _drain(streaming.stream_exact_dedup(docs), "dedup_sink", spark)
    rows = {r["doc_id"] for r in out.collect()}
    assert len(rows) == 2 and 3 in rows and len(rows & {1, 2}) == 1


def test_running_source_stats_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "docs2"
    os.makedirs(src)
    (src / "b1.json").write_text(
        '{"doc_id": 1, "text": "one two three", "source": "s1"}\n'
        '{"doc_id": 2, "text": "four five", "source": "s2"}\n'
    )
    schema = "doc_id LONG, text STRING, source STRING"
    docs = spark.readStream.schema(schema).json(str(src))
    stats = streaming.running_source_stats(docs)
    q = (
        stats.writeStream.format("memory")
        .queryName("stats_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch: state must ACCUMULATE, not reset
        (src / "b2.json").write_text(
            '{"doc_id": 3, "text": "six seven eight nine", "source": "s1"}\n'
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT source, max(docs) AS docs, max(tokens) AS tokens "
        "FROM stats_sink GROUP BY source"
    ).collect()
    got = {r["source"]: (r["docs"], r["tokens"]) for r in rows}
    assert got == {"s1": (2, 7), "s2": (1, 2)}


def test_chunking_composes_with_streaming(spark, tmp_path):
    """chunk_documents is pure stateless Catalyst (split + sequence +
    explode + slice), so it applies unchanged to a streaming frame —
    the continuous-ingest twin of the batch chunking op."""
    from de_spark.ops.text import chunk_documents

    src = tmp_path / "cdocs"
    os.makedirs(src)
    (src / "a.json").write_text(
        '{"doc_id": 1, "text": "a b c d e f"}\n{"doc_id": 2, "text": ""}\n'
    )
    docs = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    out = _drain(chunk_documents(docs, chunk_tokens=4, overlap=1), "chunk_sink", spark)
    rows = {(r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in out.collect()}
    assert rows == {(1, 0, "a b c d"), (1, 1, "d e f")}


def test_windowed_rates_watermark_drops_late_rows(spark, tmp_path):
    """Watermarked event-time windows (the late-data surface): rows
    within the watermark merge into their window, a row later than the
    watermark is DROPPED, and append mode emits each finalized window
    exactly once across catch-up runs sharing one checkpoint."""
    import json

    landing = tmp_path / "win_landing"
    os.makedirs(landing)
    ckpt = str(tmp_path / "win_ckpt")
    schema = "event_time timestamp, source string, text string"

    def write_file(name, rows):
        with open(landing / name, "w") as f:
            for ts, text in rows:
                f.write(json.dumps(
                    {"event_time": ts, "source": "s1", "text": text}) + "\n")

    got = []

    def run(name):
        # memory sink cannot recover from a checkpoint; foreachBatch
        # can, and catch-up runs share one checkpoint here
        stream = spark.readStream.schema(schema).json(str(landing))
        q = (
            streaming.windowed_source_rates(stream)
            .writeStream.foreachBatch(
                lambda batch_df, _bid: got.extend(batch_df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return []
    # window [10:00,10:10): two rows; the 10:30 row advances the
    # watermark to 10:10 so that window can finalize
    write_file("f1.json", [
        ("2024-01-01T10:00:00", "a b"),
        ("2024-01-01T10:05:00", "c"),
        ("2024-01-01T10:30:00", "d e f"),
    ])
    got += run("win_r1")
    # 10:02 is LATE (watermark 10:10, its window already closed) →
    # dropped; 11:00 advances the watermark to 10:40
    write_file("f2.json", [
        ("2024-01-01T10:02:00", "late late late"),
        ("2024-01-01T11:00:00", "g"),
    ])
    got += run("win_r2")
    # flush: far-future row finalizes everything before it
    write_file("f3.json", [("2024-01-01T12:30:00", "h")])
    got += run("win_r3")

    by_start = {str(r["win_start"]): (r["docs"], r["tokens"]) for r in got}
    # each window emitted once; the late row changed NOTHING
    assert len(by_start) == len(got)
    assert by_start["2024-01-01 10:00:00"] == (2, 3)   # not (3, 6)
    assert by_start["2024-01-01 10:30:00"] == (1, 3)
    assert by_start["2024-01-01 11:00:00"] == (1, 1)


def test_stream_exact_dedup_watermarked_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark twin of exact dedup: a duplicate
    arriving within the watermark of the first copy is dropped; once
    the watermark passes the first copy's event time + delay, its
    state is RECLAIMED and the same content is admitted again (the
    explicit bounded-state trade; batch exact_dedup compacts later).
    Catch-up runs share one checkpoint so the watermark persists."""
    import json

    landing = tmp_path / "wm_landing"
    os.makedirs(landing)
    ckpt = str(tmp_path / "wm_ckpt")
    schema = "doc_id LONG, text STRING, event_time TIMESTAMP"
    got = []

    def write_file(name, rows):
        with open(landing / name, "w") as f:
            for doc_id, text, ts in rows:
                f.write(json.dumps(
                    {"doc_id": doc_id, "text": text, "event_time": ts}) + "\n")

    def run():
        docs = spark.readStream.schema(schema).json(str(landing))
        q = (
            streaming.stream_exact_dedup_watermarked(docs, watermark="1 hour")
            .writeStream.foreachBatch(
                lambda batch_df, _bid: got.extend(batch_df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: doc 2 duplicates doc 1 within the 1h watermark → dropped
    write_file("f1.json", [
        (1, "dup text", "2024-01-01T10:00:00"),
        (2, "dup text", "2024-01-01T10:30:00"),
        (3, "other", "2024-01-01T10:10:00"),
    ])
    run()
    # run 2: advances the watermark to 13:00, past doc 1's
    # event_time + delay (11:00) → "dup text" state reclaimed
    write_file("f2.json", [(4, "advance", "2024-01-01T14:00:00")])
    run()
    # run 3: the same content re-arrives AFTER the watermark → admitted
    write_file("f3.json", [(5, "dup text", "2024-01-01T14:30:00")])
    run()

    ids = sorted(r["doc_id"] for r in got)
    assert ids == [1, 3, 4, 5]  # 2 dropped in-watermark; 5 re-admitted


def test_windowed_rates_blank_text_counts_zero_tokens(spark, tmp_path):
    """Blank text contributes a doc but ZERO tokens — same tokenizer
    as the batch surface (ops.text.token_count); a raw split would
    count the empty string as one token (ADVICE r5)."""
    import json

    landing = tmp_path / "blank_landing"
    os.makedirs(landing)
    ckpt = str(tmp_path / "blank_ckpt")
    schema = "event_time timestamp, source string, text string"
    got = []

    def write_file(name, rows):
        with open(landing / name, "w") as f:
            for ts, text in rows:
                f.write(json.dumps(
                    {"event_time": ts, "source": "s1", "text": text}) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(landing))
        q = (
            streaming.windowed_source_rates(stream)
            .writeStream.foreachBatch(
                lambda batch_df, _bid: got.extend(batch_df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_file("f1.json", [
        ("2024-01-01T10:00:00", ""),
        ("2024-01-01T10:01:00", "  "),
        ("2024-01-01T10:02:00", "one two"),
    ])
    run()
    # flush run: far-future row finalizes the 10:00 window
    write_file("f2.json", [("2024-01-01T12:00:00", "flush")])
    run()
    rows = {str(r["win_start"]): (r["docs"], r["tokens"]) for r in got}
    assert rows["2024-01-01 10:00:00"] == (3, 2)  # not (3, 4)
