"""Streaming lift + multimodal plumbing tests."""

import pyspark.sql.functions as F
import pytest

from ocr_machine_spark.operators.extraction import extract_pages
from ocr_machine_spark.operators.multimodal import decode_media, generate_media, sample_frames
from ocr_machine_spark.sources.pages import generate_pages
from ocr_machine_spark.streaming import extract_pages_stream, windowed_page_counts
from ocr_machine_spark.streaming.extract_stream import host_crawl_totals_stream

N = 120


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "pages")
    generate_pages(spark, N, partitions=4).write.parquet(p)
    return p


def test_stream_matches_batch(spark, pages_dir):
    """The same UDF under readStream produces exactly the batch output."""
    out = extract_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = out.writeStream.format("memory").queryName("ext_stream").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table("ext_stream").select("url", "extracted_text", "chars_out")
    batch = extract_pages(spark.read.parquet(pages_dir)).select(
        "url", F.col("extracted_text").alias("b_text"), F.col("chars_out").alias("b_chars")
    )
    assert streamed.count() == N
    j = streamed.join(batch, "url")
    assert j.count() == N
    assert j.filter((F.col("extracted_text") != F.col("b_text"))).count() == 0


def test_windowed_counts_complete(spark, pages_dir):
    agg = windowed_page_counts(spark, pages_dir, window="30 days", late="90 days")
    q = agg.writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("win_counts")
    assert rows.agg(F.sum("n_pages")).collect()[0][0] == N
    assert rows.filter(F.col("bytes_html") <= 0).count() == 0


def test_stateful_host_totals_match_batch(spark, pages_dir):
    """applyInPandasWithState running totals must converge to the batch
    per-host aggregate regardless of trigger boundaries (state folds are
    order-insensitive sums)."""
    out = host_crawl_totals_stream(spark, pages_dir)
    q = out.writeStream.format("memory").queryName("host_totals").outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # 'update' mode may emit a row per trigger — the LAST row per host is the
    # final state; with a single processAllAvailable pass there is one batch,
    # but group by host + max to stay robust
    streamed = (
        spark.table("host_totals")
        .groupBy("host")
        .agg(F.max("n_pages").alias("n_pages"), F.max("bytes_html").alias("bytes_html"))
    )
    batch = (
        spark.read.parquet(pages_dir)
        .select(F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"), F.length("html").alias("nb"))
        .groupBy("host")
        .agg(F.count("*").alias("b_n"), F.sum("nb").alias("b_bytes"))
    )
    j = streamed.join(batch, "host", "full_outer")
    assert j.filter(F.col("n_pages").isNull() | F.col("b_n").isNull()).count() == 0
    assert j.filter((F.col("n_pages") != F.col("b_n")) | (F.col("bytes_html") != F.col("b_bytes"))).count() == 0


def test_media_decode_real_content_deterministic(spark):
    """The decode is REAL (round 4): features must equal the by-construction
    goldens computed from the generator's arrays — certifying the BMP/WAV/Y4M
    encode→decode roundtrip — and stay identical across partitionings."""
    from ocr_machine_spark.core import rawmedia as RM

    media = generate_media(spark, 60, partitions=4).cache()
    feats = decode_media(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 60
    assert all(r["ok"] and len(r["features"]) == 32 for r in rows.values())
    # two of each kind; 0 is a BMP image, 9 a PNG one (i % 6 == 3)
    for i in (0, 1, 2, 9, 10, 11):
        kind = RM.kind_of(i)
        if kind == "image":
            want = RM.image_features(RM.to_rgb8(RM.image_native(i)))
        elif kind == "audio":
            want = RM.audio_features(RM.audio_samples(i), RM.AUDIO_RATE)
        else:
            want = RM.video_features(RM.video_frames(i), RM.VIDEO_FPS)
        assert rows[i]["features"] == want, f"media {i} ({kind})"
    rows2 = {r["media_id"]: r for r in decode_media(media.repartition(7)).collect()}
    assert all(rows[k]["features"] == rows2[k]["features"] for k in rows)
    assert all(0.0 <= v <= 1.0 for r in rows.values() for v in r["features"])


def test_media_decode_unknown_container(spark):
    """Compressed/unknown containers: ok=false per row non-strict (totality),
    NotImplementedError under strict — the remaining honest stub boundary.
    A corrupt payload of a RECOGNIZED container is a different strict-mode
    error: data corruption (ValueError), not a missing codec (ADVICE r4 #2)."""
    unknown = [
        (0, "audio", b"OggS\x00\x02vorbis-not-supported"),  # Ogg magic
        (1, "image", None),
    ]
    corrupt = [
        # RIFF magic but corrupt WAVE structure: the stdlib wave module
        # raises wave.Error/EOFError here, which decode_wav converts to
        # ValueError so the per-row handler catches it (review fix r4)
        (2, "audio", b"RIFF\x10\x00\x00\x00WAVEjunkdata"),
        # PNG signature, garbage chunks
        (3, "image", b"\x89PNG\r\n\x1a\nfakedata"),
        # JPEG magic (recognized since round 5) but truncated stream
        (4, "image", b"\xff\xd8\xff\xe0\x00\x10JFIF-truncated"),
    ]
    schema = "media_id long, kind string, payload binary"
    media = spark.createDataFrame(unknown + corrupt, schema)
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert not out[0]["ok"] and out[0]["features"] is None
    assert not out[1]["ok"]
    assert not out[2]["ok"]
    assert not out[3]["ok"]
    assert not out[4]["ok"]
    with pytest.raises(Exception, match="NotImplementedError|compressed-codec"):
        decode_media(spark.createDataFrame(unknown, schema), strict=True).collect()
    # recognized-container corruption in strict mode is ValueError (data
    # corruption), never the missing-codec NotImplementedError
    with pytest.raises(Exception, match="corrupt payload"):
        decode_media(spark.createDataFrame(corrupt, schema), strict=True).collect()


def test_resize_images_real_pixels(spark):
    """Resize decodes real BMP pixels, resamples nearest-neighbor with
    integer index maps, re-encodes — output payload must decode to EXACTLY
    the expected pixel array."""
    import numpy as np

    from ocr_machine_spark.core import rawmedia as RM
    from ocr_machine_spark.operators.multimodal import generate_media, resize_images

    media = generate_media(spark, 60, partitions=2)
    out = {r["media_id"]: r for r in resize_images(media, max_side=64).collect()}
    src = {r["media_id"]: r for r in media.filter(F.col("kind") == "image").collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        w, h = src[mid]["meta"]["width"], src[mid]["meta"]["height"]
        nw, nh = r["meta"]["width"], r["meta"]["height"]
        assert max(nw, nh) <= 64
        if (w, h) == (nw, nh):
            assert not r["resized"]
            assert bytes(r["payload"]) == bytes(src[mid]["payload"])
        else:
            assert r["resized"]
            want = RM.resize_nearest(RM.image_native(mid), nw, nh)
            got, container = RM.decode_image(bytes(r["payload"]))
            # container AND native color type/bit depth survive the resize
            assert container == RM.image_container(mid)
            assert got.dtype == want.dtype and got.shape == want.shape
            if container == "jpeg":
                # lossy re-encode: resampling breaks the flat-block
                # alignment, so only bounded quantization error is promised
                err = np.abs(got.astype(np.int64) - want.astype(np.int64))
                assert err.max() <= 24, f"media {mid}: jpeg err {err.max()}"
            else:
                assert np.array_equal(got, want), f"media {mid}"


def test_resize_strict_raises_on_undecodable(spark):
    rows = [(0, b"\x89PNG-not-a-bmp", {"width": 100, "height": 100, "sample_rate": None, "n_frames": None}, "image")]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<width:int, height:int, sample_rate:int, n_frames:int>, kind string",
    )
    from ocr_machine_spark.operators.multimodal import resize_images

    # non-strict: passthrough unresized
    out = resize_images(media, max_side=32).collect()
    assert len(out) == 1 and not out[0]["resized"]
    with pytest.raises(Exception, match="NotImplementedError|resample"):
        resize_images(media, max_side=32, strict=True).collect()


def test_decode_frames_executes_plan(spark):
    """decode_frames parses the real Y4M payload and must agree with the
    metadata-only sample_frames plan on which frames exist, and with the
    generator's arrays on each frame's exact luma mean."""
    import numpy as np

    from ocr_machine_spark.core import rawmedia as RM
    from ocr_machine_spark.operators.multimodal import decode_frames

    media = generate_media(spark, 30, partitions=2)
    plan = {(r["media_id"], r["frame_idx"]) for r in sample_frames(media, every_n=24).collect()}
    got = {(r["media_id"], r["frame_idx"]): r["luma_mean_e4"] for r in decode_frames(media, every_n=24).collect()}
    assert set(got) == plan
    for (mid, fi), val in got.items():
        fr = RM.video_frames(mid)[fi].astype(np.int64)
        assert val == (int(fr.sum()) * 10000) // fr.size


def test_frame_sampling_plan(spark):
    media = generate_media(spark, 60, partitions=4)
    frames = sample_frames(media, every_n=24)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vids
    assert frames.filter(F.col("frame_idx") % 24 != 0).count() == 0
    bad = frames.join(media.select("media_id", F.col("meta.n_frames").alias("nf")), "media_id") \
        .filter(F.col("frame_idx") >= F.col("nf")).count()
    assert bad == 0


def test_streaming_kill_resume_exactly_once(spark, tmp_path):
    """Streaming counterpart of test_lineage_resume_exactly_once: a stateful
    streaming query is stopped mid-corpus ("kill"), then a NEW query restarts
    from the same checkpoint directory and processes only the files that
    arrived after the stop. Exactly-once evidence: every host the resumed run
    emits carries the checkpoint-restored state forward to EXACTLY the batch
    total over all files — a reprocessed file would overshoot, lost state
    would undershoot."""
    import glob
    import shutil

    stream_dir = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    full_dir = str(tmp_path / "full")
    generate_pages(spark, N, partitions=6).write.parquet(full_dir)
    files = sorted(glob.glob(f"{full_dir}/part-*.parquet"))
    assert len(files) == 6
    import os

    os.makedirs(stream_dir)
    for f in files[:3]:  # phase 1: half the corpus is visible
        shutil.copy(f, stream_dir)

    def run(run_name):
        # memory sink can't recover from a checkpoint; foreachBatch is the
        # production-shaped fault-tolerant sink (epoch-tracked)
        sink_dir = str(tmp_path / f"sink_{run_name}")

        def sink(batch_df, epoch_id):
            batch_df.write.mode("append").parquet(sink_dir)

        out = host_crawl_totals_stream(spark, stream_dir, max_files_per_trigger=1)
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return (
            spark.read.parquet(sink_dir)
            .groupBy("host")
            .agg(F.max("n_pages").alias("n_pages"), F.max("bytes_html").alias("bytes_html"))
        )

    run1 = {r["host"]: (r["n_pages"], r["bytes_html"]) for r in run("resume_run1").collect()}
    assert run1  # the killed run made progress
    for f in files[3:]:  # the rest of the corpus lands after the "crash"
        shutil.copy(f, stream_dir)
    run2 = {r["host"]: (r["n_pages"], r["bytes_html"]) for r in run("resume_run2").collect()}
    assert run2

    batch = {
        r["host"]: (r["n_pages"], r["bytes_html"])
        for r in (
            spark.read.parquet(stream_dir)
            .select(
                F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
                F.length("html").alias("nb"),
            )
            .groupBy("host")
            .agg(F.count("*").alias("n_pages"), F.sum("nb").alias("bytes_html"))
            .collect()
        )
    }
    # resumed emissions: checkpoint state + new files == full batch, exactly
    for host, totals in run2.items():
        assert totals == batch[host], (host, totals, batch[host])
    # hosts whose pages all arrived pre-kill are NOT re-emitted (no replay of
    # already-committed files)...
    for host in set(run1) - set(run2):
        assert run1[host] == batch[host], host
    # ...and every host is accounted for across the two runs
    assert set(run1) | set(run2) == set(batch)


def test_streaming_dedup_trigger_boundary_independent(spark, tmp_path):
    """Stateful streaming exact-dedup (round 5): the final per-fingerprint
    state must equal the batch GROUP BY answer regardless of how files batch
    into triggers. Two drops with maxFilesPerTrigger=1 force duplicates of
    one fingerprint to arrive in DIFFERENT triggers — the state fold (min
    keeper, summed copies) must stitch them exactly."""
    import pandas as pd

    from ocr_machine_spark.streaming.extract_stream import dedup_docs_stream

    stream_dir = str(tmp_path / "docs_in")
    import os

    os.makedirs(stream_dir)
    # drop 1: originals; drop 2: duplicates of half of them + one new doc
    pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["aa bb", "cc dd", "ee ff", "gg hh"]}
    ).to_parquet(f"{stream_dir}/drop1.parquet")
    pd.DataFrame(
        {"doc_id": [11, 12, 5], "text": ["aa bb", "cc dd", "ii jj"]}
    ).to_parquet(f"{stream_dir}/drop2.parquet")

    out = dedup_docs_stream(spark, stream_dir, max_files_per_trigger=1)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_tb")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        r["fp"]: (r["keeper_doc_id"], r["n_copies"])
        for r in spark.table("dedup_tb")
        .groupBy("fp")
        .agg(F.min("keeper_doc_id").alias("keeper_doc_id"), F.max("n_copies").alias("n_copies"))
        .collect()
    }
    batch = {
        r["fp"]: (r["keeper_doc_id"], r["n_copies"])
        for r in spark.read.parquet(stream_dir)
        .groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .collect()
    }
    assert final == batch
    # the cross-trigger duplicates were stitched: 5 distinct fingerprints,
    # two of them with 2 copies kept under the ORIGINAL doc_id
    assert len(final) == 5
    assert sorted(v for v in final.values() if v[1] == 2) == [(1, 2), (2, 2)]
