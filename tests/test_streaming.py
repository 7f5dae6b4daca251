"""Structured Streaming tests: bookmarked incremental ingest (the Glue
job-bookmark replacement), streaming window aggs matching the batch/oracle
results, and stream dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glue_etl_framework_spark import streaming as ST
from tests.conftest import SF_SMOKE

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events(spark):
    # queries.t dispatches on the parquet timestamp encoding (nanos-as-long
    # vs TIMESTAMP_NTZ) — the fixture data has shipped as both.
    from glue_etl_framework_spark.queries import t

    return t(spark, SF_SMOKE, "events")


def test_incremental_ingest_is_bookmarked(tmp_path, spark, events):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    first, second = events.limit(100), events.filter(F.col("event_id").between(100, 149))

    first.write.mode("append").parquet(src)
    ST.incremental_file_ingest(spark, src, dst, EVENTS_SCHEMA, ckpt)
    assert spark.read.parquet(dst).count() == 100

    # run again with NO new files -> nothing reprocessed
    ST.incremental_file_ingest(spark, src, dst, EVENTS_SCHEMA, ckpt)
    assert spark.read.parquet(dst).count() == 100

    # new files arrive -> only the delta is appended
    second.write.mode("append").parquet(src)
    ST.incremental_file_ingest(spark, src, dst, EVENTS_SCHEMA, ckpt)
    assert spark.read.parquet(dst).count() == 150


def test_incremental_ingest_with_transform(tmp_path, spark, events):
    src, dst, ckpt = (str(tmp_path / n) for n in ("src", "dst", "ckpt"))
    events.limit(50).write.parquet(src)
    ST.incremental_file_ingest(
        spark, src, dst, EVENTS_SCHEMA, ckpt,
        transform=lambda df: df.filter(F.col("event_type") == "purchase").select("event_id", "value"),
    )
    out = spark.read.parquet(dst)
    assert out.columns == ["event_id", "value"]
    assert out.count() == events.limit(50).filter("event_type = 'purchase'").count()


def _run_stream_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_window_agg_matches_batch(tmp_path, spark, events):
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    result = _run_stream_to_memory(
        spark, ST.stream_window_agg(stream, "1 hour", keys=["event_type"]), "win_agg"
    )
    batch = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )
    # append-mode emits only watermark-closed windows; every emitted row must
    # match batch exactly, and all but the trailing watermark horizon emits
    got = {(r.window_start, r.event_type): r.n_events for r in result.collect()}
    want = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    assert got, "stream emitted nothing"
    for key, n in got.items():
        assert want[key] == n
    missing = set(want) - set(got)
    horizon = max(ws for ws, _ in want)
    assert all(ws >= max(ws for ws, _ in got) for ws, _ in missing), (
        "non-trailing window missing from stream output"
    )


def test_stream_dedup(tmp_path, spark, events):
    src = str(tmp_path / "src")
    dup = events.limit(80)
    dup.unionByName(dup).write.parquet(src)  # every event twice
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    result = _run_stream_to_memory(spark, ST.stream_dedup(stream, ["event_id"]), "dedup")
    assert result.count() == 80
    assert result.select("event_id").distinct().count() == 80


def test_stream_session_agg_runs(tmp_path, spark, events):
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    result = _run_stream_to_memory(spark, ST.stream_session_agg(stream), "sess")
    # closed sessions must agree with the batch session_window computation
    batch = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("session_window.start").alias("session_start"), "n_events")
    )
    want = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    got = {(r.user_id, r.session_start): r.n_events for r in result.collect()}
    assert got, "no sessions emitted"
    for key, n in got.items():
        assert want[key] == n


def test_stateful_running_totals_matches_batch(tmp_path, spark, events):
    """applyInPandasWithState over a 2-file stream: the final per-user
    totals must equal the batch groupBy answer (exact integer cents), and
    intermediate updates must be monotone in n_events."""
    src = str(tmp_path / "stateful_src")
    ckpt = str(tmp_path / "stateful_ckpt")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.write.parquet(src)
    second.write.mode("append").parquet(src)

    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=1)
    q = (
        ST.running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.table("running_totals")
        .groupBy("user_id")
        .agg(
            F.max_by("n_events", "n_events").alias("n_events"),
            F.max_by("total_value_cents", "n_events").alias("total_value_cents"),
        )
    )
    want = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
    )
    diff = got.join(want, "user_id") \
        .filter(
            (got.n_events != want.n_events)
            | (got.total_value_cents != want.total_value_cents)
        )
    assert got.count() == want.count()
    assert diff.count() == 0



def test_stream_stream_interval_join(tmp_path, spark, events):
    """Purchases join clicks of the same user within the prior 30 minutes;
    the streaming result must equal the equivalent batch interval join."""
    src = str(tmp_path / "ssj_src")
    events.write.parquet(src)
    purchases_s = (
        ST.read_file_stream(spark, src, EVENTS_SCHEMA)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
    )
    clicks_s = (
        ST.read_file_stream(spark, src, EVENTS_SCHEMA)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"))
    )
    joined = ST.stream_stream_join(
        purchases_s, clicks_s, "user_id", left_ts="p_ts", right_ts="c_ts"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("ssj").count()

    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("c_ts")
    )
    want = p.join(
        c,
        (p.user_id == c.u2)
        & (c.c_ts >= p.p_ts - F.expr("INTERVAL 30 minutes"))
        & (c.c_ts <= p.p_ts),
    ).count()
    assert got == want > 0


def test_streaming_upsert_sink(tmp_path, spark, events):
    """foreachBatch upsert sink: latest value per user lands in the parquet
    table with last-writer-wins key semantics."""
    src = str(tmp_path / "ups_src")
    out = str(tmp_path / "ups_out")
    events.limit(200).write.parquet(src)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    latest = stream.select("user_id", "event_id", "value")
    q = ST.upsert_sink(latest, out, ["user_id"], str(tmp_path / "ups_ckpt"))
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == got.select("user_id").distinct().count()
    assert got.count() == events.limit(200).select("user_id").distinct().count()


def test_streaming_upsert_sink_order_by_deterministic(tmp_path, spark, events):
    """order_by=event_id pins the intra-batch winner per user to the row
    with the greatest event_id (the whole source arrives as one availableNow
    micro-batch, so every duplicate key is intra-batch here)."""
    src = str(tmp_path / "det_src")
    out = str(tmp_path / "det_out")
    sample = events.limit(200).select("user_id", "event_id", "value")
    sample.write.parquet(src)
    stream = ST.read_file_stream(
        spark, src, "user_id long, event_id long, value double"
    )
    q = ST.upsert_sink(
        stream, out, ["user_id"], str(tmp_path / "det_ckpt"), order_by="event_id"
    )
    q.awaitTermination()
    got = {r.user_id: r.event_id for r in spark.read.parquet(out).collect()}
    want = {
        r.user_id: r.mx
        for r in sample.groupBy("user_id").agg(F.max("event_id").alias("mx")).collect()
    }
    assert got == want


def test_stream_static_enrich_matches_batch(tmp_path, spark, events):
    from glue_etl_framework_spark.streaming.ingest import read_file_stream
    from glue_etl_framework_spark.streaming.joins import stream_static_enrich

    src = tmp_path / "src"
    events.write.parquet(str(src))
    dim = spark.createDataFrame(
        [(t,) for t in ["click", "view", "purchase"]], "event_type string"
    ).withColumn("category", F.upper("event_type"))

    stream = read_file_stream(spark, str(src), schema=events.schema)
    enriched = stream_static_enrich(stream, dim, "event_type", how="inner")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enrich_out")
    expect = events.join(F.broadcast(dim), "event_type", "inner")
    assert got.count() == expect.count()
    # spot-check the enrichment column actually joined
    assert got.filter(F.col("category") != F.upper("event_type")).count() == 0


def test_stream_sliding_window_matches_batch(tmp_path, spark, events):
    from glue_etl_framework_spark.streaming.ingest import read_file_stream, stream_window_agg

    src = tmp_path / "src"
    events.write.parquet(str(src))
    stream = read_file_stream(spark, str(src), schema=events.schema)
    agg = stream_window_agg(stream, window="10 minutes", slide="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("slide_out")
    expect = (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "total_value")
    )
    # streaming append-mode emits only windows closed by the final watermark;
    # every emitted row must exactly match its batch twin, and most windows
    # should have been emitted
    j = got.join(expect, "window_start", "inner")
    assert got.count() > 0
    assert j.count() == got.count()
    mismatches = j.filter(
        (got["n_events"] != expect["n_events"])
        | (got["total_value"] != expect["total_value"])
    ).count()
    assert mismatches == 0


DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_stream_quality_gate_matches_batch(tmp_path, spark):
    """quality_gate_stream on a file stream must pass exactly the doc_ids
    the batch quality_gopher_filters operator passes (same Column
    expressions, stateless, so stream == batch row-for-row)."""
    from glue_etl_framework_spark.queries import load_registry

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    gated = ST.quality_gate_stream(stream, keep_audit=True)
    q = (
        gated.writeStream.format("memory")
        .queryName("gated_docs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id, n_tokens FROM gated_docs").collect()

    batch = load_registry()["quality_gopher_filters"].fn(spark, SF_SMOKE)
    want = {r.doc_id: r.n_tokens for r in batch.filter(F.col("passes_gopher") == 1).collect()}
    assert 0 < len(want) < docs.count()  # the gate actually discriminates
    assert {r.doc_id: r.n_tokens for r in got} == want
    # schema-preserving mode drops the audit columns
    plain = ST.quality_gate_stream(spark.read.parquet(src))
    assert plain.columns == docs.columns


def test_stream_pii_scrub_matches_batch(tmp_path, spark):
    """pii_scrub_stream on a file stream must produce byte-identical
    redacted text to the batch text_pii_scrub fingerprint (shared Column
    expressions), and must preserve the input schema."""
    from glue_etl_framework_spark.queries import load_registry

    rows = [
        (1, "mail a.b@x.co and 10.0.0.1", "en", "src0", 26),
        (2, "call 555-123-4567 twice 555-123-4567", "en", "src1", 36),
        (3, "clean text only", "en", "src2", 15),
    ]
    src = str(tmp_path / "pii_src")
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    docs.write.parquet(src)

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    scrubbed = ST.pii_scrub_stream(stream, keep_counts=True)
    q = (
        scrubbed.writeStream.format("memory")
        .queryName("scrubbed_docs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_emails, r.n_ips, r.n_phones, r.text)
        for r in spark.sql(
            "SELECT doc_id, n_emails, n_ips, n_phones, text FROM scrubbed_docs"
        ).collect()
    }
    assert got[1] == (1, 1, 0, "mail <EMAIL> and <IP>")
    assert got[2] == (0, 0, 2, "call <PHONE> twice <PHONE>")
    assert got[3] == (0, 0, 0, "clean text only")
    # batch fingerprint agrees with md5 of the streamed redaction
    d = tmp_path / "sf_pii_stream"
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))
    fp = {
        r.doc_id: r.redacted_fp
        for r in load_registry()["text_pii_scrub"].fn(spark, str(d)).collect()
    }
    md5 = {r.doc_id: r.fp for r in spark.createDataFrame(
        [(k, v[3]) for k, v in got.items()], "doc_id long, text string"
    ).select("doc_id", F.md5("text").alias("fp")).collect()}
    assert fp == md5
    # schema-preserving mode: same columns as the input
    plain = ST.pii_scrub_stream(spark.read.parquet(src))
    assert sorted(plain.columns) == sorted(docs.columns)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState's Python driver needs google.protobuf, "
    "not installed in this container (plan/API shape still exercised by "
    "test_transform_with_state_plan_builds)",
)
def test_transform_with_state_profile_matches_batch(tmp_path, spark, events):
    """transformWithStateInPandas (Spark 4 API, ValueState + MapState,
    RocksDB provider) over a 2-file stream: final per-user profile equals
    the batch groupBy answer."""
    src = str(tmp_path / "tws_src")
    ckpt = str(tmp_path / "tws_ckpt")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=1)
        q = (
            ST.user_profile_stream(stream)
            .writeStream.format("memory")
            .queryName("tws_profile")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    got = (
        spark.table("tws_profile")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_event_types").alias("n_event_types"),
            F.max_by("total_value_cents", "n_events").alias("total_value_cents"),
        )
    )
    want = events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
    )
    diff = (
        got.join(want, "user_id")
        .filter(
            (got.n_events != want.n_events)
            | (got.n_event_types != want.n_event_types)
            | (got.total_value_cents != want.total_value_cents)
        )
    )
    assert got.count() == want.count()
    assert diff.count() == 0


def test_transform_with_state_plan_builds(tmp_path, spark, events):
    """Without protobuf the streaming query cannot RUN here, but the
    unresolved plan and processor wiring must still build: schema, state
    variable declarations, and the grouped transformWithStateInPandas
    call are all validated at DataFrame-construction time."""
    src = str(tmp_path / "twsp_src")
    events.limit(10).write.parquet(src)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    out = ST.user_profile_stream(stream, require_runtime_deps=False)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "n_event_types", "total_value_cents",
    ]


@pytest.mark.skipif(
    _has_protobuf(), reason="protobuf installed — runtime gate inactive"
)
def test_transform_with_state_gate_fails_fast_without_protobuf(tmp_path, spark, events):
    """Without google.protobuf the transformWithState query would die deep
    inside the Python worker at drain time; the capability gate must
    instead raise a clear NotImplementedError at call time, pointing to
    the applyInPandasWithState fallback (the honest-gate convention)."""
    src = str(tmp_path / "twsg_src")
    events.limit(10).write.parquet(src)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    with pytest.raises(NotImplementedError, match="protobuf"):
        ST.user_profile_stream(stream)


def test_stateful_fold_twins_agree():
    """running_user_stats ships a BY-VALUE nested copy of the fold logic
    (so vanilla-session workers need no repo on sys.path); this pins the
    nested copy to the module-level reference `_running_user_stats_fn` by
    running both over the same fake state/batches."""
    import pandas as pd

    from glue_etl_framework_spark.streaming.stateful import _running_user_stats_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    # extract the nested fold from the factory's code-object constants
    import types

    codes = [
        c
        for c in ST.running_user_stats.__code__.co_consts
        if isinstance(c, types.CodeType) and c.co_name == "fold"
    ]
    assert len(codes) == 1, "nested fold function not found"
    fold = types.FunctionType(codes[0], {"__builtins__": __builtins__}, "fold")

    pdf = pd.DataFrame(
        {
            "value": [1.234, 2.5, 0.011],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-02"]),
        }
    )
    s1, s2 = FakeState(), FakeState()
    ref = list(_running_user_stats_fn((7,), iter([pdf.copy()]), s1))[0]
    got = list(fold((7,), iter([pdf.copy()]), s2))[0]
    pd.testing.assert_frame_equal(ref, got)
    assert s1._v == s2._v


def test_append_emission_rule_at_exact_hour_boundary(tmp_path, spark):
    """Pin Spark's append-mode emission rule when the final watermark lands
    EXACTLY on a window end (ADVICE r04: the *_parity oracles replicate the
    horizon as `window_end <= max(ts) - delay` but no fixture exercises the
    <=/< boundary). Synthetic stream: events at 00:30/01:30/02:30 and a
    final event exactly at 04:00:00 -> watermark (1h delay) is exactly
    03:00:00, so the [02:00,03:00) window's end sits ON the watermark.
    This test asserts the inclusive rule the oracles assume: that window
    IS emitted. If a Spark upgrade ever flips it to strict `<`, this
    fails and the streaming_live parity oracles must change with it."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 30), 1, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 2, 30), 1, "click", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 4, 0), 1, "click", 1.0, "{}"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(src)
    stream = ST.read_file_stream(spark, src, EVENTS_SCHEMA)
    result = _run_stream_to_memory(
        spark, ST.stream_window_agg(stream, "1 hour", keys=["event_type"]), "wm_boundary"
    )
    got = sorted(r.window_start for r in result.collect())
    want = [
        dt.datetime(2024, 1, 1, 0, 0),
        dt.datetime(2024, 1, 1, 1, 0),
        dt.datetime(2024, 1, 1, 2, 0),  # end == watermark: emitted (<= rule)
    ]
    assert got == want, (
        f"append emission at exact watermark boundary changed: got {got}; "
        "the streaming_live *_parity oracles pin window_end <= max(ts) - delay"
    )
