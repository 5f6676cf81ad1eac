"""Tests for source connectors (S1/S5/S6 + multimodal plumbing),
incremental anti-join semantics, and the streaming surface (stream
results == batch results under Trigger.AvailableNow)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from x17a5_spark.sources.fwf import read_fixed_width
from x17a5_spark.sources.multimodal import decode_metadata, extract_features
from x17a5_spark.sources.ocr import OcrSource, StubOcrBackend, quarantine
from x17a5_spark.streaming.events import windowed_event_counts
from x17a5_spark.streaming.incremental import incremental_todo
from x17a5_spark.tables import load_table


# ----------------------------------------------------------------- S1
def test_fixed_width_reader(spark, tmp_path):
    def fwf_line(form, company, cik, date, url):
        return (
            form.ljust(12) + company.ljust(62) + cik.ljust(12)
            + date.ljust(12) + url
        )

    lines = [
        fwf_line("X-17A-5", "GOLDMAN SACHS & CO.", "885639", "2020-02-28",
                 "edgar/data/885639/file1.txt"),
        fwf_line("10-K", "SOME OTHER CORP", "123456", "2020-03-15",
                 "edgar/data/123456/file2.txt"),
    ]
    p = tmp_path / "form.idx"
    p.write_text("\n".join(lines) + "\n")
    df = read_fixed_width(spark, str(p))
    rows = {r["cik"]: r for r in df.collect()}
    assert rows["885639"]["form_type"] == "X-17A-5"
    assert rows["885639"]["date_filed"] == "2020-02-28"
    assert rows["123456"]["company_name"] == "SOME OTHER CORP"
    # P1 regex filter on top of the scan
    kept = df.filter(F.col("form_type").rlike("(?i)^x-17a")).count()
    assert kept == 1


# ----------------------------------------------------------------- S6
def test_ocr_source_with_error_ledger(spark):
    docs = spark.createDataFrame(
        [
            ("1", "2020-01-01", b"Cash|100\nTotal assets|100"),
            ("2", "2020-01-01", b"__FAIL__"),
        ],
        "cik string, filing_date string, content binary",
    )
    out = OcrSource(backend_factory=StubOcrBackend).run(docs)
    good, errors = quarantine(out)
    g = good.toPandas().sort_values("row_idx")
    assert list(g.col0) == ["Cash", "Total assets"]
    assert list(g.col1) == ["100", "100"]
    e = errors.collect()
    assert len(e) == 1 and e[0]["cik"] == "2" and "stub OCR failure" in e[0]["error"]


# --------------------------------------------------------- multimodal
def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", b"IMG|640|480|" + b"\x01\x02\x03" * 10),
        (2, "image", b"\x89PNG not decodable here"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, kind string, media binary")
    meta = decode_metadata(df).toPandas().set_index("media_id")
    assert meta.loc[1, "width"] == 640 and meta.loc[1, "height"] == 480
    assert meta.loc[1, "error"] is None
    assert "NotImplementedError" in meta.loc[2, "error"]

    feats = extract_features(df).toPandas().set_index("media_id")
    assert len(feats.loc[1, "feature"]) == 8
    assert abs(sum(feats.loc[1, "feature"]) - 1.0) < 1e-9
    # deterministic: same bytes -> same feature
    feats2 = extract_features(df).toPandas().set_index("media_id")
    assert list(feats.loc[1, "feature"]) == list(feats2.loc[1, "feature"])


# -------------------------------------------------------- incremental
def test_incremental_todo_idempotent(spark):
    cand = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], ["key", "payload"]
    )
    sink = spark.createDataFrame([("1",), ("1",)], ["key"])
    todo = incremental_todo(cand, sink, ["key"])
    assert {r["key"] for r in todo.collect()} == {"2", "3"}
    # idempotence: after "processing", nothing remains
    done = sink.select("key").union(todo.select("key"))
    assert incremental_todo(cand, done, ["key"]).count() == 0


# ---------------------------------------------------------- streaming
def test_stream_equals_batch(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    batch_events = load_table(spark, sf_dir, "events")
    # materialize the µs-normalized events as a parquet dir the file
    # source can stream from
    src = os.path.join(tmp_path, "events_stream")
    batch_events.write.parquet(src)

    stream = (
        spark.readStream.schema(batch_events.schema).parquet(src)
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM stream_out").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(
            spark.read.parquet(src), window="1 hour"
        ).collect()
    }
    assert set(got) == set(expected)
    for k, (n, _v) in expected.items():
        assert got[k][0] == n
