"""Oracle parity for the SQL analytics surface + streaming equivalence
tests (availableNow trigger vs batch window aggregation)."""

import pytest
from pyspark.sql import functions as F

from spark_indexedrdd_spark.functions import multimodal as MM
from spark_indexedrdd_spark.operators import analytics as AN
from spark_indexedrdd_spark.sources.tables import load_table
from spark_indexedrdd_spark.streaming import joins as SJ
from spark_indexedrdd_spark.streaming import stateful, windows
from tests.oracle_utils import compare, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return {
        t: load_table(spark, sf_dir, t)
        for t in [
            "lineitem",
            "orders",
            "customer",
            "events",
            "documents",
            "supplier",
            "nation",
            "part",
        ]
    }


CASES = [
    ("pricing_summary", lambda t: AN.pricing_summary(t["lineitem"]), lambda: AN.SQL_PRICING_SUMMARY),
    ("top_per_cust", lambda t: AN.top_orders_per_customer(t["orders"]), AN.sql_top_orders_per_customer),
    ("global_topk", lambda t: AN.global_topk_orders(t["orders"]), AN.sql_global_topk_orders),
    ("rollup", lambda t: AN.rollup_doc_counts(t["documents"]), lambda: AN.SQL_ROLLUP_DOC_COUNTS),
    ("setops", lambda t: AN.segment_set_ops(t["customer"], 1, 2), lambda: AN.sql_segment_set_ops(1, 2)),
    ("asof", lambda t: AN.asof_join_events(t["events"]), lambda: AN.SQL_ASOF_JOIN_EVENTS),
    ("sessionize", lambda t: AN.sessionize(t["events"]), AN.sql_sessionize),
    ("tumbling", lambda t: windows.tumbling_counts(t["events"]), windows.sql_tumbling_counts),
    ("sliding", lambda t: windows.sliding_counts(t["events"]), windows.sql_sliding_counts),
    (
        "volume_shipping_q7",
        lambda t: AN.volume_shipping(
            t["supplier"], t["lineitem"], t["orders"], t["customer"], t["nation"]
        ),
        AN.sql_volume_shipping,
    ),
    (
        "returned_items_q10",
        lambda t: AN.returned_item_report(
            t["customer"], t["orders"], t["lineitem"], t["nation"]
        ),
        AN.sql_returned_item_report,
    ),
    (
        "promo_revenue_q14",
        lambda t: AN.promo_revenue(t["lineitem"], t["part"]),
        AN.sql_promo_revenue,
    ),
    (
        "customers_without_orders",
        lambda t: AN.customers_without_orders(t["customer"], t["orders"]),
        AN.sql_customers_without_orders,
    ),
    (
        "orders_above_cust_avg",
        lambda t: AN.orders_above_customer_average(t["orders"]),
        AN.sql_orders_above_customer_average,
    ),
    (
        "running_revenue_by_month",
        lambda t: AN.running_revenue_by_month(t["orders"]),
        AN.sql_running_revenue_by_month,
    ),
    (
        "funnel_join",
        lambda t: SJ.batch_purchase_after_signup(t["events"]),
        SJ.sql_batch_purchase_after_signup,
    ),
    (
        "late_shipment_orders",
        lambda t: AN.late_shipment_orders(t["orders"], t["lineitem"]),
        AN.sql_late_shipment_orders,
    ),
    (
        "supplier_diversity",
        lambda t: AN.supplier_diversity_by_brand(t["part"], t["lineitem"]),
        lambda: AN.SQL_SUPPLIER_DIVERSITY_BY_BRAND,
    ),
    (
        "grouping_sets",
        lambda t: AN.grouping_sets_doc_stats(t["documents"]),
        lambda: AN.SQL_GROUPING_SETS_DOC_STATS,
    ),
    (
        "month_over_month",
        lambda t: AN.revenue_month_over_month(t["orders"]),
        lambda: AN.SQL_REVENUE_MONTH_OVER_MONTH,
    ),
    (
        "except_all",
        lambda t: AN.segment_except_all(t["customer"], 1, 2),
        lambda: AN.sql_segment_except_all(1, 2),
    ),
    # the r14 fold's per-op forms: folded out of the driver contract
    # (segment_set_ops now pins all three in one slot) but each keeps
    # its own DuckDB twin here
    (
        "segment_except",
        lambda t: AN.segment_except(t["customer"], 1, 2),
        lambda: AN.sql_segment_except(1, 2),
    ),
    (
        "segment_intersect",
        lambda t: AN.segment_intersect(t["customer"], 1, 2),
        lambda: AN.sql_segment_intersect(1, 2),
    ),
    (
        "binary_meta",
        lambda t: MM.binary_meta(MM.attach_binary(t["documents"])),
        MM.sql_binary_meta,
    ),
]


@pytest.mark.parametrize("name,build,sql", CASES, ids=[c[0] for c in CASES])
def test_oracle_parity(name, build, sql, tables, con):
    report = compare(build(tables), sql(), con)
    assert report["ok"], report


def test_segment_set_ops_report_equals_per_op_union(tables):
    """The r14 fold must be pure consolidation: the consolidated
    report's three branches equal the standalone per-op results
    row-for-row (the similarity_topk fold's parity-pin precedent),
    so the one driver hash really pins all three pipelines."""
    cust = tables["customer"]
    report = {}
    for r in AN.segment_set_ops(cust, 1, 2).collect():
        report.setdefault(r.set_op, {})[r.c_mktsegment] = r.n
    ex = {r.c_mktsegment: 1 for r in AN.segment_except(cust, 1, 2).collect()}
    it = {
        r.c_mktsegment: 1 for r in AN.segment_intersect(cust, 1, 2).collect()
    }
    xa = {
        r.c_mktsegment: r.surplus
        for r in AN.segment_except_all(cust, 1, 2).collect()
    }
    assert report.get("except", {}) == ex
    assert report.get("intersect", {}) == it
    assert report.get("except_all", {}) == xa
    assert set(report) <= {"except", "intersect", "except_all"}


def test_pricing_summary_fast_matches_exact_approximately(tables):
    """The double-sum scale path must agree with the decimal-exact form
    to float-accumulation tolerance (same rows, same grouping)."""
    exact = {
        (r.l_returnflag, r.l_linestatus): r
        for r in AN.pricing_summary(tables["lineitem"]).collect()
    }
    fast = {
        (r.l_returnflag, r.l_linestatus): r
        for r in AN.pricing_summary(tables["lineitem"], exact=False).collect()
    }
    assert exact.keys() == fast.keys()
    for k, e in exact.items():
        f = fast[k]
        assert e.count_order == f.count_order
        for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
            assert abs(e[c] - f[c]) <= 1e-6 * max(1.0, abs(e[c])), (k, c)


def test_native_session_window_matches_sessionize(tables):
    """F.session_window and the lag+cumsum sessionize must produce the
    same sessions. Note: session_window closes at last_event + gap and
    our ts is micros-floored, so compare (user, session start, count)."""
    ours = {
        (r.user_id, r.sess_start_us): r.n_events
        for r in AN.sessionize(tables["events"], 30).collect()
    }
    native = {
        (r.user_id, r.sess_start_us): r.n_events
        for r in windows.session_window_counts(tables["events"], 30).collect()
    }
    assert ours == native


# ---------------------- streaming ------------------------------------- #


def test_streaming_tumbling_matches_batch(spark, sf_dir, tables):
    batch = windows.tumbling_counts(tables["events"]).toPandas()
    stream_df = windows.streaming_tumbling_counts(
        spark, f"{sf_dir}/events.parquet"
    )
    windows.run_stream_to_memory(stream_df, "t_tumbling")
    got = spark.sql("SELECT * FROM t_tumbling").toPandas()
    cols = ["win_start_us", "event_type"]
    batch = batch.sort_values(cols).reset_index(drop=True)
    got = got.sort_values(cols).reset_index(drop=True)
    assert batch.equals(got[batch.columns])


def test_transform_with_state_matches_batch(spark, sf_dir, tables):
    """The transformWithState (Spark 4) variant must converge to the same
    per-user totals as the batch aggregate. Needs the RocksDB state
    store + protobuf; when protobuf is absent (this container) the
    operator must refuse at plan-build time, not crash the query."""
    events = tables["events"]
    if not stateful.tws_runtime_available():
        with pytest.raises(NotImplementedError):
            stateful.running_user_totals_tws(events)
        return
    batch = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts_us)
        for r in stateful.batch_user_totals(events).collect()
    }
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(
                spark.read.parquet(f"{sf_dir}/events.parquet").schema
            ).parquet(windows._as_stream_dir(f"{sf_dir}/events.parquet"))
        )
        from spark_indexedrdd_spark.sources.tables import _normalize_events

        out = stateful.running_user_totals_tws(_normalize_events(stream))
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("t_tws")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    got = {}
    for r in spark.sql("SELECT * FROM t_tws").collect():
        prevrow = got.get(r.user_id)
        if prevrow is None or r.n_events >= prevrow[0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6), r.last_ts_us)
    assert got == batch


def test_stateful_running_totals_matches_batch(spark, sf_dir, tables):
    events = tables["events"]
    batch = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts_us)
        for r in stateful.batch_user_totals(events).collect()
    }
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/events.parquet").schema)
        .parquet(windows._as_stream_dir(f"{sf_dir}/events.parquet"))
    )
    from spark_indexedrdd_spark.sources.tables import _normalize_events

    out = stateful.running_user_totals(_normalize_events(stream))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last update per user wins
    got_rows = spark.sql("SELECT * FROM t_stateful").collect()
    got = {}
    for r in got_rows:
        prev = got.get(r.user_id)
        if prev is None or r.n_events >= prev[0]:
            got[r.user_id] = (r.n_events, round(r.total_value, 6), r.last_ts_us)
    assert got == batch


def test_profile_table_nulls_and_approx(spark):
    from spark_indexedrdd_spark.operators.analytics import profile_table

    rows = [(1, "a"), (2, None), (3, "a"), (None, "b")]
    df = spark.createDataFrame(rows, "k long, v string")
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_rows == 4 and got["k"].n_nulls == 1
    assert got["k"].n_distinct == 3  # NULL not counted as a distinct value
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 2
    assert got["v"].min_str == "a" and got["v"].max_str == "b"
    # approx path: same shape, estimates within HLL tolerance at this size
    ap = {r.column: r for r in profile_table(df, exact=False).collect()}
    assert ap["k"].n_distinct == 3 and ap["v"].n_distinct == 2


def test_multimodal_plumbing(spark, tables):
    media = MM.attach_binary(tables["documents"].limit(20))
    decoded = MM.decode_image(media, use_fake_decoder=True)
    rows = decoded.collect()
    assert len(rows) == 20
    assert all(16 <= r.width < 256 and 1 <= r.channels <= 4 for r in rows)
    frames = MM.frame_sample(media.limit(5), n_frames=4)
    fr = frames.collect()
    assert len(fr) == 20  # 5 docs x 4 frames
    assert {r.frame_idx for r in fr} == {0, 1, 2, 3}

    # real-decoder path: runs in THIS container via the dependency-free
    # header parser (PIL takes over transparently when installed — both
    # decode these bytes identically)
    png_1x1 = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c4"
        "890000000d49444154789c626001000000ffff03000006000557bfabd4000000"
        "0049454e44ae426082"
    )
    png_df = spark.createDataFrame(
        [(1, bytearray(png_1x1))], "doc_id long, payload binary"
    )
    out = MM.decode_image(png_df).collect()
    assert [(r.width, r.height, r.channels) for r in out] == [(1, 1, 4)]


def _make_png(w, h, color_type=6):
    import struct
    import zlib as _z

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    px = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = b"".join(b"\x00" + b"\x00" * (w * px) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_jpeg(w, h, channels=3):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * channels)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + bytes([channels])
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(channels))
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_decode_formats():
    """Pure-Python header parser: real bytes of each supported format,
    including a JPEG whose SOF sits after several other segments, and a
    loud failure on junk."""
    assert MM.header_decode(_make_png(640, 480, color_type=6)) == (640, 480, 4)
    assert MM.header_decode(_make_png(31, 7, color_type=0)) == (31, 7, 1)
    assert MM.header_decode(_make_png(16, 16, color_type=2)) == (16, 16, 3)
    assert MM.header_decode(_make_jpeg(1920, 1080, channels=3)) == (1920, 1080, 3)
    assert MM.header_decode(_make_jpeg(8, 8, channels=1)) == (8, 8, 1)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" * 4
    assert MM.header_decode(gif) == (320, 200, 3)
    with pytest.raises(ValueError, match="unsupported image format"):
        MM.header_decode(b"not an image at all")
    with pytest.raises(ValueError, match="no SOF"):
        MM.header_decode(b"\xff\xd8\xff\xd9")


def test_decode_image_real_path_without_pillow(spark):
    """decode_image's real branch must work in this Pillow-less container
    end-to-end through the Arrow-batched plan."""
    rows = [
        (1, bytearray(_make_png(64, 32, color_type=2))),
        (2, bytearray(_make_jpeg(100, 50, channels=3))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.width, r.height, r.channels)
           for r in MM.decode_image(df).collect()}
    assert got == {1: (64, 32, 3), 2: (100, 50, 3)}


def test_streaming_dedup_bounded_state_matches_batch(spark, sf_dir, tmp_path):
    """Planted exact-duplicate events (delivery retries): the streaming
    dropDuplicatesWithinWatermark output must equal batch dropDuplicates
    on the same keys — and contain no event_id twice."""
    import shutil

    from spark_indexedrdd_spark.streaming.dedup import streaming_dedup

    src = f"{sf_dir}/events.parquet"
    dup_dir = tmp_path / "events_dup.parquet"
    dup_dir.mkdir()
    shutil.copy(src, dup_dir / "part-0.parquet")
    # retry storm: first 500 events delivered a second time
    spark.read.parquet(src).limit(500).write.mode("append").parquet(str(dup_dir))

    out = streaming_dedup(spark, str(dup_dir), keys=("event_id",))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT event_id FROM t_dedup").collect()
    ids = [r.event_id for r in got]
    n_batch = spark.read.parquet(src).count()
    assert len(ids) == len(set(ids)) == n_batch


def test_streaming_incremental_lsh_matches_sequential_batches(spark, sf_dir, tmp_path):
    """File-per-micro-batch streaming ingest against the signature store
    must produce exactly the candidates of applying the batch store path
    sequentially — and each batch must see all prior batches as corpus."""
    from spark_indexedrdd_spark.functions import dedup as DD
    from spark_indexedrdd_spark.streaming.dedup import streaming_incremental_lsh

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where("doc_id % 10 NOT IN (0, 1)")
    b1 = docs.where("doc_id % 10 = 0")
    b2 = docs.where("doc_id % 10 = 1")

    store = str(tmp_path / "store")
    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    cands_dir = str(tmp_path / "cands")
    DD.write_signature_store(corpus, store)
    # batch-path expectation, applied sequentially to a SEPARATE store
    store2 = str(tmp_path / "store2")
    DD.write_signature_store(corpus, store2)
    expected = set()
    for b in (b1, b2):
        expected |= {
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in DD.incremental_lsh_candidates_from_store(b, store2).collect()
        }
        DD.append_signature_batch(b, store2)

    # two files -> two micro-batches, in arrival order (flat files in the
    # source dir; mtimes pinned so the file source triggers f1 first)
    import glob
    import os
    import shutil

    for i, b in enumerate((b1, b2), start=1):
        tmp_out = str(tmp_path / f"w{i}")
        b.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dest = str(stream_dir / f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    q = (
        streaming_incremental_lsh(spark, str(stream_dir), store, cands_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in spark.read.parquet(cands_dir).collect()
    }
    assert got == expected and len(got) > 0
    # the store absorbed both batches
    n_store = spark.read.parquet(store).count()
    assert n_store == corpus.count() + b1.count() + b2.count()


def test_stream_stream_funnel_join_matches_batch(spark, sf_dir, tables):
    """Watermarked stream-stream self-join (purchase within 60 min of
    signup) must produce exactly the batch join's rows."""
    batch = {
        (r.user_id, r.signup_ts_us, r.purchase_ts_us)
        for r in SJ.batch_purchase_after_signup(tables["events"]).collect()
    }
    assert batch  # shape sanity: the funnel matches something

    out = SJ.streaming_purchase_after_signup(spark, f"{sf_dir}/events.parquet")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_funnel")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.signup_ts_us, r.purchase_ts_us)
        for r in spark.sql("SELECT * FROM t_funnel").collect()
    }
    assert got == batch


def test_stream_stream_left_outer_funnel_matches_batch(spark, sf_dir, tables):
    """LEFT OUTER stream-stream join: matched rows identical to the inner
    funnel, plus exactly one NULL-padded row per unconverted signup —
    and the stream (where the watermark has passed, which availableNow
    guarantees for a finite source) must equal the batch left join."""
    batch_rows = SJ.batch_signup_conversion(tables["events"]).collect()
    batch = {
        (r.user_id, r.signup_ts_us, r.purchase_ts_us, r.purchase_value)
        for r in batch_rows
    }
    # the outer join keeps every signup
    n_signups = tables["events"].where(F.col("event_type") == "signup").count()
    assert len({(r.user_id, r.signup_ts_us) for r in batch_rows}) == n_signups
    assert any(r.purchase_ts_us is None for r in batch_rows)  # unconverted exist

    out = SJ.streaming_signup_conversion(spark, f"{sf_dir}/events.parquet")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_funnel_outer")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.signup_ts_us, r.purchase_ts_us, r.purchase_value)
        for r in spark.sql("SELECT * FROM t_funnel_outer").collect()
    }
    # Documented outer-join contract: a NULL row is emitted only once the
    # global watermark passes signup_ts + within. The global watermark is
    # the MIN across both watermarked legs (each = its leg's max event
    # time - delay), so on a finite stream, signups within
    # (delay + within) of the EARLIER-ending leg keep their state
    # buffered forever — their NULL rows are legitimately absent.
    # Matched rows are all emitted; NULL rows must match batch exactly
    # below the cutoff.
    leg_max = (
        tables["events"]
        .where(F.col("event_type").isin("signup", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts_us").alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    cutoff = leg_max - (2 * 3600 + 61 * 60) * 1_000_000  # delay+within+1min
    matched = {t for t in batch if t[2] is not None}
    assert matched <= got
    got_nulls = {t for t in got if t[2] is None}
    batch_nulls = {t for t in batch if t[2] is None}
    assert {t for t in batch_nulls if t[1] < cutoff} <= got_nulls <= batch_nulls
    assert got_nulls, "watermark-passed unconverted signups must be emitted"


def test_stream_static_enrichment(spark, sf_dir, tables):
    dim = (
        tables["events"]
        .select("user_id")
        .distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )
    out = SJ.stream_static_enrich(spark, f"{sf_dir}/events.parquet", dim)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_enrich")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM t_enrich")
    assert got.count() == tables["events"].count()
    assert got.where(F.col("tier").isNull()).count() == 0
    one = got.first()
    assert one.tier == one.user_id % 3


def test_multimodal_feature_extraction_feeds_ann(spark, tables):
    """Full multimodal pipeline: binary payload → Arrow-batched feature
    extraction → the SAME near-dup operator the embeddings table uses."""
    from spark_indexedrdd_spark.functions import similarity as SIM

    media = MM.attach_binary(tables["documents"].limit(60))
    feats = MM.extract_features(media, use_fake_extractor=True)
    rows = feats.collect()
    assert len(rows) == 60
    import math

    for r in rows[:5]:
        assert len(r.embedding) == 16
        assert abs(math.fsum(x * x for x in r.embedding) - 1.0) < 1e-3

    # identical payloads must be exact neighbors through the ANN surface
    dup = media.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = media.limit(1).unionByName(dup)
    f2 = MM.extract_features(both, use_fake_extractor=True).withColumn(
        "label", F.lit(0)
    ).withColumnRenamed("doc_id", "vec_id")
    pairs = SIM.near_duplicates(f2, threshold=0.999).collect()
    assert len(pairs) == 1 and pairs[0].cosine_sim > 0.999

    with pytest.raises(NotImplementedError):
        MM.extract_features(media)  # real model absent: clearly-marked stub


def test_streaming_semantic_dedup_matches_sequential_batches(spark, sf_dir, tmp_path):
    """File-per-micro-batch embedding ingest against the IVF store must
    produce exactly the verdicts of applying the batch store path
    sequentially — each batch assigned under the SAME stored centroids
    and seeing all prior batches as corpus."""
    from spark_indexedrdd_spark.functions import ivf as IV
    from spark_indexedrdd_spark.streaming.dedup import streaming_semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where("vec_id < 300")
    b1 = emb.where("vec_id >= 300 AND vec_id < 400")
    b2 = emb.where("vec_id >= 400")

    store = str(tmp_path / "ivf")
    IV.write_ivf_store(corpus, store, n_clusters=8, method="det")
    store2 = str(tmp_path / "ivf2")
    IV.write_ivf_store(corpus, store2, n_clusters=8, method="det")
    expected = set()
    for b in (b1, b2):
        expected |= {
            (r.vec_id, r.cluster_id, r.keep, r.dup_of)
            for r in IV.incremental_semantic_dedup_from_store(
                b, store2, threshold=0.3
            ).collect()
        }
        IV.append_ivf_batch(b, store2)

    import glob
    import os
    import shutil

    stream_dir = tmp_path / "incoming"
    stream_dir.mkdir()
    verdicts_dir = str(tmp_path / "verdicts")
    for i, b in enumerate((b1, b2), start=1):
        tmp_out = str(tmp_path / f"w{i}")
        b.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dest = str(stream_dir / f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    q = (
        streaming_semantic_dedup(
            spark, str(stream_dir), store, verdicts_dir, threshold=0.3
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.vec_id, r.cluster_id, r.keep, r.dup_of)
        for r in spark.read.parquet(verdicts_dir).collect()
    }
    assert got == expected and len(got) > 0
    vecs, _cents = IV.read_ivf_store(spark, store)
    assert vecs.count() == emb.count()


def test_semantic_dedup_redelivery_is_a_full_noop(spark, sf_dir, tmp_path):
    """r14: a redelivered committed batch skips the verdict recompute
    entirely — no duplicate verdict rows, no vector re-append —
    whether its tag is an exact `applied` entry or only covered by the
    folded per-checkpoint watermark after a vacuum (pre-r14 the
    verdict side re-appended a recomputed copy before the vector
    append no-opped)."""
    from spark_indexedrdd_spark.functions import ivf as IV
    from spark_indexedrdd_spark.functions import store_commit as SC
    from spark_indexedrdd_spark.streaming.dedup import _semantic_dedup_batch

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where("vec_id < 300")
    b1 = emb.where("vec_id >= 300 AND vec_id < 400")
    store = str(tmp_path / "ivf")
    verdicts = str(tmp_path / "verdicts")
    IV.write_ivf_store(corpus, store, n_clusters=8, method="det")

    ns = "abcdefabcdef"
    args = (store, verdicts, 0.3, "vec_id", "embedding", ns)
    _semantic_dedup_batch(b1, 0, *args)
    n_verdicts = spark.read.parquet(verdicts).count()
    n_vecs = IV.read_ivf_store(spark, store)[0].count()
    assert n_verdicts > 0

    # exact-entry redelivery: full no-op on BOTH sinks
    _semantic_dedup_batch(b1, 0, *args)
    assert spark.read.parquet(verdicts).count() == n_verdicts
    assert IV.read_ivf_store(spark, store)[0].count() == n_vecs

    # vacuum folds the tag into the namespace watermark; redelivery of
    # the now-folded tag must STILL be a full no-op
    assert SC.vacuum_store(store, keep_versions=10)["folded_applied"] == 1
    assert SC.read_meta(store).get("applied") == []
    _semantic_dedup_batch(b1, 0, *args)
    assert spark.read.parquet(verdicts).count() == n_verdicts
    assert IV.read_ivf_store(spark, store)[0].count() == n_vecs
