"""Streaming extraction (exactly-once file sink, checkpoint resume,
batch/stream byte-identity) and multimodal binary plumbing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark.golden import golden_frame
from ocr_spark.operators.multimodal import media_features, sniff_kind
from ocr_spark.session import PAGES_SCHEMA
from ocr_spark.sources.pages import synth_pages
from ocr_spark.streaming.extract_stream import (
    extract_metrics_stream,
    read_pages_stream,
    start_extract_stream,
)

N = 200


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    synth_pages(spark, N, num_partitions=4).write.mode("overwrite").parquet(d)
    return d


def test_stream_extract_matches_golden(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_stream(spark, pages_dir, out, ckpt, max_files_per_trigger=2)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out).toPandas().set_index("url").sort_index()
    want = golden_frame(N).set_index("url").sort_index()
    assert len(got) == N
    assert (got["text"] == want["text"]).all()  # batch == stream, byte-identical


def test_stream_restart_is_exactly_once(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_stream(spark, pages_dir, out, ckpt, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(out).count()
    # restart on the same checkpoint: no new input => no duplicate output
    q = start_extract_stream(spark, pages_dir, out, ckpt)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == n1 == N
    # new files arriving are picked up incrementally, exactly once
    more = synth_pages(spark, 50, seed=77, num_partitions=1)
    more.write.mode("append").parquet(pages_dir)
    q = start_extract_stream(spark, pages_dir, out, ckpt)
    q.processAllAvailable()
    q.stop()
    final = spark.read.parquet(out)
    assert final.count() == N + 50
    assert final.select("url").distinct().count() == N + 50


def test_metrics_stream_windows(spark, pages_dir, tmp_path):
    pages = read_pages_stream(spark, pages_dir)
    agg = extract_metrics_stream(pages, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName("metrics_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    q.stop()
    m = spark.sql("select * from metrics_out").toPandas()
    # append mode only emits windows the watermark has closed; with a bounded
    # input the final windows stay open, so assert on schema not counts
    assert set(m.columns) == {"window", "host", "n_pages", "bytes_in"}


class TestMultimodal:
    def test_sniff_kinds(self):
        assert sniff_kind(b"\xff\xd8\xffjunk") == "jpeg"
        assert sniff_kind(b"\x89PNG\r\n\x1a\nx") == "png"
        assert sniff_kind(b"%PDF-1.4") == "pdf"
        assert sniff_kind(b"  <!DOCTYPE html><html>") == "html"
        assert sniff_kind(b"\x00\x01\x02") == "unknown"

    def test_media_features_plumbing(self, spark):
        rows = [
            ("a", b"\xff\xd8\xff" + b"x" * 100),
            ("b", b"%PDF-1.4 fake"),
            ("c", None),
            ("d", b"<html><body>hi</body></html>"),
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = media_features(df).toPandas().set_index("id").sort_index()
        assert list(out.index) == ["a", "b", "c", "d"]
        assert out.loc["a", "kind"] == "jpeg"
        assert out.loc["b", "kind"] == "pdf"
        assert out.loc["c", "n_bytes"] == 0
        assert out.loc["d", "kind"] == "html"
        assert (out["decoder"] == "stub").all()  # sandbox has no Pillow
        assert (out["width"] >= 160).all() and (out["height"] >= 120).all()

    # minimal real container headers with known dimensions (hand-built —
    # the dimensions live in the header, no pixel data needed)
    PNG_800x600 = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
                   + (800).to_bytes(4, "big") + (600).to_bytes(4, "big")
                   + b"\x08\x02\x00\x00\x00" + b"\x00" * 8)
    JPEG_640x480 = (b"\xff\xd8"
                    + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
                    + b"\xff\xc4" + (4).to_bytes(2, "big") + b"\x00\x00"  # DHT: skipped
                    + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
                    + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
                    + b"\x03" + b"\x00" * 9)
    GIF_320x240 = (b"GIF89a" + (320).to_bytes(2, "little")
                   + (240).to_bytes(2, "little") + b"\x00" * 6)

    def test_parse_image_header_true_dimensions(self):
        from ocr_spark.operators.multimodal import parse_image_header

        assert parse_image_header(self.PNG_800x600) == (800, 600)
        assert parse_image_header(self.JPEG_640x480) == (640, 480)
        assert parse_image_header(self.GIF_320x240) == (320, 240)
        # truncation / corruption / non-images -> None, never a throw
        assert parse_image_header(self.PNG_800x600[:20]) is None
        assert parse_image_header(b"\xff\xd8\xff" + b"x" * 100) is None
        assert parse_image_header(b"<html><body>hi</body></html>") is None
        assert parse_image_header(b"") is None

    def test_media_features_header_decoder(self, spark):
        """Real image payloads get header-true dimensions (decoder='header');
        non-image payloads keep the disclosed deterministic stub."""
        rows = [("png", self.PNG_800x600), ("jpg", self.JPEG_640x480),
                ("gif", self.GIF_320x240), ("doc", b"<html><body>x</body></html>")]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = media_features(df).toPandas().set_index("id")
        assert out.loc["png", "decoder"] == "header"
        assert (int(out.loc["png", "width"]), int(out.loc["png", "height"])) == (800, 600)
        assert (int(out.loc["jpg", "width"]), int(out.loc["jpg", "height"])) == (640, 480)
        assert (int(out.loc["gif", "width"]), int(out.loc["gif", "height"])) == (320, 240)
        assert out.loc["doc", "decoder"] == "stub"

    def test_image_resize_header_geometry(self, spark):
        from ocr_spark.operators.multimodal import image_resize

        df = spark.createDataFrame(
            [("png", self.PNG_800x600)], "url string, html binary")
        out = image_resize(df, max_side=400).toPandas().iloc[0]
        assert out.decoder == "header"
        assert (out.width, out.height) == (800, 600)
        assert (out.resized_w, out.resized_h) == (400, 300)

    def test_media_features_deterministic(self, spark):
        df = synth_pages(spark, 60)
        a = media_features(df).toPandas().sort_values("id").reset_index(drop=True)
        b = media_features(df.repartition(5)).toPandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def _exif_jpeg(byte_order: str, orientation: int | None = 6,
               with_strings: bool = True) -> bytes:
    """Assemble a minimal JPEG whose APP1 carries a valid Exif TIFF IFD0
    (public layout, ISO 12234-2 / TIFF 6.0): II or MM byte order,
    Orientation as inline SHORT, DateTime/Make as offset/inline ASCII."""
    import struct

    le = byte_order == "II"
    e = "<" if le else ">"
    entries = []
    if orientation is not None:
        entries.append(struct.pack(e + "HHI", 0x0112, 3, 1)
                       + struct.pack(e + "H", orientation) + b"\x00\x00")
    if with_strings:
        dt = b"2024:05:01 10:00:00\x00"          # 20 bytes, via offset
        # layout: [2B count][n*12B entries][4B next-IFD][data area]
        n_entries = len(entries) + 2
        data_start = 8 + 2 + n_entries * 12 + 4
        entries.append(struct.pack(e + "HHII", 0x0132, 2, len(dt), data_start))
        entries.append(struct.pack(e + "HHI", 0x010F, 2, 4) + b"Acm\x00")
        tail = dt
    else:
        n_entries = len(entries)
        tail = b""
    tiff = (byte_order.encode() + struct.pack(e + "H", 42)
            + struct.pack(e + "I", 8)
            + struct.pack(e + "H", n_entries)
            + b"".join(entries) + b"\x00\x00\x00\x00" + tail)
    payload = b"Exif\x00\x00" + tiff
    return (b"\xff\xd8\xff\xe1" + (len(payload) + 2).to_bytes(2, "big")
            + payload + b"\xff\xd9")


def test_parse_exif_both_byte_orders_and_absence(spark):
    from ocr_spark.operators.multimodal import exif_meta, parse_exif

    ii = _exif_jpeg("II")
    mm = _exif_jpeg("MM", orientation=8, with_strings=False)
    got = parse_exif(ii)
    assert got == {"orientation": 6, "captured_at": "2024:05:01 10:00:00",
                   "make": "Acm"}
    assert parse_exif(mm) == {"orientation": 8, "captured_at": None,
                              "make": None}
    assert parse_exif(b"\x89PNG\r\n\x1a\nrest") is None
    assert parse_exif(ii[:10]) is None  # truncated: never throws

    rows = [("ii", ii), ("mm", mm),
            ("plain", b"\xff\xd8\xff\xdb\x00\x04aa\xff\xd9"),
            ("none", None)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = exif_meta(df).toPandas().set_index("id")
    assert len(out) == 4                       # never-drop
    assert bool(out.loc["ii", "has_exif"]) and out.loc["ii", "orientation"] == 6
    assert out.loc["mm", "orientation"] == 8
    assert not bool(out.loc["plain", "has_exif"])
    assert out.loc["plain", "orientation"] is None or pd.isna(
        out.loc["plain", "orientation"])
    assert not bool(out.loc["none", "has_exif"])


def test_stateful_host_totals_accumulate_across_restarts(spark, tmp_path):
    """applyInPandasWithState: running per-host totals persist in the
    checkpoint — a second run over NEW files continues from committed
    state instead of recounting."""
    from ocr_spark.streaming.stateful import start_host_totals_stream

    indir, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    first = synth_pages(spark, 60, num_partitions=1).limit(60)
    first.write.mode("overwrite").parquet(indir)
    q = start_host_totals_stream(spark, indir, out, ckpt)
    q.awaitTermination(300)

    changelog1 = spark.read.parquet(out).toPandas()
    assert changelog1.pages.sum() >= 60  # every page counted at least once

    # second wave of files, same checkpoint: totals must ACCUMULATE
    synth_pages(spark, 120, num_partitions=1).write.mode("append").parquet(indir)
    q = start_host_totals_stream(spark, indir, out, ckpt)
    q.awaitTermination(300)

    changelog = spark.read.parquet(out).toPandas()
    latest = (
        changelog.sort_values(["host", "batches"])
        .groupby("host", as_index=False).last()
    )
    # 60 + 120 new rows seen overall; final running totals cover all 180
    assert latest.pages.sum() == 180
    # at least one host was seen in both waves and kept counting
    assert (latest.batches >= 2).any()


def test_streaming_heavy_hitters_bounded_state_and_guarantee(spark, tmp_path):
    """Streaming Misra-Gries: per-group state stays <= m counters no
    matter how many distinct tokens flow by; a token above the n_total/
    (m+1) threshold is guaranteed present in the latest summary with a
    lower-bound count; running n_total is exact; restart from the same
    checkpoint ACCUMULATES (second wave continues, not recounts)."""
    import pyspark.sql.functions as F

    from ocr_spark.streaming.stateful import streaming_heavy_hitters

    m = 8
    indir, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def wave(start, n):
        # per row: 'hot' x3 + 'warm' x1 + 3 row-unique churn tokens
        return spark.range(start, start + n).select(
            F.lit("en").alias("grp"),
            F.array(
                F.lit("hot"), F.lit("hot"), F.lit("hot"), F.lit("warm"),
                F.concat(F.lit("u"), F.col("id").cast("string")),
                F.concat(F.lit("v"), F.col("id").cast("string")),
                F.concat(F.lit("w"), F.col("id").cast("string")),
            ).alias("toks"),
        )

    def run():
        stream = (
            spark.readStream.schema("grp string, toks array<string>")
            .parquet(indir)
        )
        q = (
            streaming_heavy_hitters(stream, m=m)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out).toPandas()

    wave(0, 50).coalesce(1).write.mode("overwrite").parquet(indir)
    log1 = run()
    latest1 = log1[log1.batch_ord == log1.batch_ord.max()]
    assert len(latest1) <= m                       # bounded summary
    assert latest1.n_total.iloc[0] == 50 * 7       # exact running total
    hot1 = latest1[latest1.token == "hot"]
    assert len(hot1) == 1                          # guarantee: hot retained
    assert 0 < hot1.count_lb.iloc[0] <= 150        # lower bound

    # second wave, same checkpoint: state continues across restart
    wave(50, 50).coalesce(1).write.mode("append").parquet(indir)
    log = run()
    latest = log[log.batch_ord == log.batch_ord.max()]
    assert latest.n_total.iloc[0] == 100 * 7
    assert latest.batch_ord.iloc[0] > latest1.batch_ord.iloc[0]
    hot = latest[latest.token == "hot"]
    assert len(hot) == 1 and hot.count_lb.iloc[0] <= 300
    # churn actually happened: far more distinct tokens than counters
    assert log.token.nunique() > m


def test_frame_sample_fanout_deterministic(spark):
    from ocr_spark.operators.multimodal import frame_sample

    pages = synth_pages(spark, 50, num_partitions=3)
    a = frame_sample(pages).toPandas().sort_values(["id", "frame_idx"]).reset_index(drop=True)
    b = frame_sample(pages.repartition(7)).toPandas().sort_values(
        ["id", "frame_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)          # partitioning-invariant
    assert a.groupby("id").frame_idx.max().max() <= 7
    assert (a.groupby("id").frame_idx.min() == 0).all()
    per_doc = a.groupby("id").size()
    assert per_doc.between(1, 8).all() and per_doc.gt(1).any()
    assert (a.decoder == "stub").all()
    assert a.frame_sha.str.len().eq(16).all()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate urls in the stream (crawl re-fetches) collapse to their
    first arrival; distinct urls all survive."""
    from ocr_spark.streaming.extract_stream import dedup_pages_stream

    indir, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    base = synth_pages(spark, 40, num_partitions=1)
    base.write.mode("overwrite").parquet(indir)
    base.write.mode("append").parquet(indir)      # every url duplicated

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(indir)
    q = (
        dedup_pages_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas()
    assert len(got) == 40
    assert got.url.is_unique


def test_image_resize_geometry(spark):
    from ocr_spark.operators.multimodal import image_resize, resize_dims

    # pure arithmetic invariants
    assert resize_dims(1000, 500, 512) == (512, 256)
    assert resize_dims(500, 1000, 512) == (256, 512)
    assert resize_dims(100, 50, 512) == (100, 50)      # never upscale
    assert resize_dims(10000, 3, 512) == (512, 1)      # floor >= 1

    pages = synth_pages(spark, 30, num_partitions=2)
    out = image_resize(pages, max_side=512).toPandas()
    assert len(out) == 30
    assert (out[["resized_w", "resized_h"]].max(axis=1) <= 512).all()
    ok = out[out.decoder == "stub"]
    # aspect ratio preserved within integer floor error
    shrunk = ok[ok.width > 512]
    assert ((shrunk.resized_w == 512) | (shrunk.resized_h == 512)).all()


def test_quality_filter_applies_to_streams(spark, tmp_path):
    """The per-row quality filter is stateless, so the SAME operator runs
    unchanged over a readStream and matches its batch output exactly —
    the streaming quality gate costs zero extra code."""
    from ocr_spark.operators.quality import quality_filter

    src = str(tmp_path / "qdocs")
    docs = spark.createDataFrame(
        [(i, ("word salad entry " * (3 + i % 20)) if i % 5 else "tiny")
         for i in range(60)],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(src)

    out = str(tmp_path / "qout")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        quality_filter(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = (
        spark.read.parquet(out).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        quality_filter(docs).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_media_hash_gate_blocks_exact_digests(spark):
    from ocr_spark.operators.multimodal import media_hash_gate

    rows = [("u0", b"payload zero"), ("u1", b"payload one"),
            ("u2", b"payload zero"),          # same bytes as u0
            ("u3", None)]                      # NULL payload still gated
    df = spark.createDataFrame(rows, "url string, html binary")
    import hashlib
    bl = spark.createDataFrame(
        # uppercase hex: the gate must canonicalize list-side case
        [(hashlib.sha256(b"payload zero").hexdigest().upper(),)],
        "sha256 string",
    )
    out = {r.url: r for r in media_hash_gate(df, bl).collect()}
    assert len(out) == 4                       # never-drop
    assert out["u0"].blocked and out["u2"].blocked   # both copies flagged
    assert not out["u1"].blocked and not out["u3"].blocked
    assert out["u0"].sha256 == hashlib.sha256(b"payload zero").hexdigest()

    plan = media_hash_gate(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "Python" not in plan


class TestAVHeaders:
    """parse_av_header: container metadata from header bytes alone —
    hand-built minimal WAV/MP4/MP3 fixtures with known parameters."""

    # 2ch 16-bit 44.1kHz WAV declaring exactly 1s of samples (176400 bytes)
    WAV_1S = (b"RIFF" + (36 + 176400).to_bytes(4, "little") + b"WAVE"
              + b"fmt " + (16).to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
              + (44100).to_bytes(4, "little") + (176400).to_bytes(4, "little")
              + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
              + b"data" + (176400).to_bytes(4, "little"))
    # ISO-BMFF with mvhd v0: timescale 600, duration 1500 units -> 2500 ms
    MP4_2500MS = ((16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00" * 4
                  + (36).to_bytes(4, "big") + b"moov"
                  + (28).to_bytes(4, "big") + b"mvhd" + b"\x00" * 12
                  + (600).to_bytes(4, "big") + (1500).to_bytes(4, "big"))
    # MPEG-1 Layer III, 128 kbps (idx 9), 44.1 kHz (idx 0), stereo,
    # 1596 payload bytes after the 4-byte header -> 1600*8//128 = 100 ms
    MP3_100MS = bytes([0xFF, 0xFB, (9 << 4) | (0 << 2), 0x00]) + b"\x00" * 1596

    def test_wav_header(self):
        from ocr_spark.operators.multimodal import parse_av_header

        assert parse_av_header(self.WAV_1S) == {
            "kind": "wav", "duration_ms": 1000,
            "sample_rate": 44100, "channels": 2}

    def test_mp4_mvhd(self):
        from ocr_spark.operators.multimodal import parse_av_header

        assert parse_av_header(self.MP4_2500MS) == {
            "kind": "mp4", "duration_ms": 2500,
            "sample_rate": 0, "channels": 0}

    def test_mp3_frame_and_id3_offset(self):
        from ocr_spark.operators.multimodal import parse_av_header

        got = parse_av_header(self.MP3_100MS)
        assert got == {"kind": "mp3", "duration_ms": 100,
                       "sample_rate": 44100, "channels": 2}
        # an ID3v2 tag shifts the frame; duration excludes the tag bytes
        tagged = (b"ID3\x03\x00\x00" + b"\x00\x00\x00\x14" + b"\x00" * 20
                  + self.MP3_100MS)
        assert parse_av_header(tagged) == got

    def test_truncation_and_garbage_never_throw(self):
        from ocr_spark.operators.multimodal import parse_av_header

        for b in (b"", b"RIFF", self.WAV_1S[:20], self.MP4_2500MS[:12],
                  b"ID3\x03\x00\x00\x00\x00\x00\x05", b"\xff\xfb",
                  b"plain text", b"\x00" * 64):
            assert parse_av_header(b) is None

    def test_av_features_operator(self, spark):
        from ocr_spark.operators.multimodal import av_features

        rows = [("w", self.WAV_1S), ("v", self.MP4_2500MS),
                ("m", self.MP3_100MS), ("x", b"not media"), ("n", None)]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = av_features(df).toPandas().set_index("id")
        assert out.loc["w", "decoder"] == "header"
        assert int(out.loc["w", "duration_ms"]) == 1000
        assert int(out.loc["v", "duration_ms"]) == 2500
        assert int(out.loc["m", "sample_rate"]) == 44100
        # unparseable -> disclosed deterministic stub, typing unchanged
        assert out.loc["x", "decoder"] == "stub"
        assert out.loc["n", "decoder"] == "stub"
        assert int(out.loc["n", "n_bytes"]) == 0
        plan = av_features(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # zero-shuffle projection


class TestAVHeadersRound5:
    """VERDICT r4 item 7: Matroska/WebM (EBML) and MPEG-TS header
    branches — hand-built minimal fixtures with known parameters."""

    @staticmethod
    def _webm(doctype=b"webm", seg_size=None):
        import struct

        ebml = (b"\x1a\x45\xdf\xa3" + bytes([0x80 | (3 + len(doctype))])
                + b"\x42\x82" + bytes([0x80 | len(doctype)]) + doctype)
        info = (b"\x15\x49\xa9\x66" + b"\x8e"
                + b"\x2a\xd7\xb1" + b"\x83" + (1_000_000).to_bytes(3, "big")
                + b"\x44\x89" + b"\x84" + struct.pack(">f", 2500.0))
        size = bytes([0x80 | len(info)]) if seg_size is None else seg_size
        return ebml + b"\x18\x53\x80\x67" + size + info

    @staticmethod
    def _ts_packet(pcr_27mhz=None):
        b = bytearray(188)
        b[0] = 0x47
        b[3] = 0x30  # adaptation field + payload
        b[4] = 183   # adaptation field spans the packet
        if pcr_27mhz is not None:
            b[5] = 0x10  # PCR flag
            base, ext = divmod(pcr_27mhz, 300)
            b[6:12] = ((base << 15) | ext).to_bytes(6, "big")
        return bytes(b)

    def test_webm_duration_and_kind(self):
        from ocr_spark.operators.multimodal import parse_av_header

        assert parse_av_header(self._webm()) == {
            "kind": "webm", "duration_ms": 2500,
            "sample_rate": 0, "channels": 0}
        got = parse_av_header(self._webm(doctype=b"matroska"))
        assert got["kind"] == "mkv" and got["duration_ms"] == 2500

    def test_webm_unknown_size_segment(self):
        # streamed Segments carry the all-ones "unknown" size: the walker
        # must clamp the scope to the captured bytes and still find Info
        from ocr_spark.operators.multimodal import parse_av_header

        got = parse_av_header(self._webm(seg_size=b"\xff"))
        assert got == {"kind": "webm", "duration_ms": 2500,
                       "sample_rate": 0, "channels": 0}

    def test_mpegts_pcr_span(self):
        from ocr_spark.operators.multimodal import parse_av_header

        ts = self._ts_packet(0) + self._ts_packet(27_000_000)  # 1 s apart
        assert parse_av_header(ts) == {
            "kind": "mpegts", "duration_ms": 1000,
            "sample_rate": 0, "channels": 0}
        # sync-aligned but PCR-free capture: identified, duration unknown
        no_pcr = self._ts_packet() + self._ts_packet()
        assert parse_av_header(no_pcr) == {
            "kind": "mpegts", "duration_ms": 0,
            "sample_rate": 0, "channels": 0}

    def test_new_containers_never_throw_on_garbage(self):
        from ocr_spark.operators.multimodal import parse_av_header

        for b in (b"\x1a\x45\xdf\xa3", self._webm()[:9],
                  b"\x1a\x45\xdf\xa3" + b"\x00" * 30,
                  b"G" + b"\x00" * 375,           # one sync byte only
                  self._ts_packet(0)[:100]):      # truncated single packet
            assert parse_av_header(b) is None
