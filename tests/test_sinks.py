"""Producer-sink parity (S7/P6): keyed ordered writes and per-key ordered
effects."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcl_akka_stream_spark.operators.sinks import keyed_ordered_write, ordered_effect_per_key


def test_keyed_ordered_write_one_file_per_key(spark, tmp_path):
    rows = [(k, i, f"m{i}") for k in ("a", "b", "c") for i in range(50)]
    df = spark.createDataFrame(rows, "key string, seq long, msg string")
    manifest = keyed_ordered_write(df, str(tmp_path / "out"), "key", "seq", n_partitions=4)
    assert manifest.count() == 150
    per_key_files = (
        manifest.withColumn("f", F.input_file_name())
        .groupBy("key")
        .agg(F.countDistinct("f").alias("nf"))
        .collect()
    )
    assert all(r.nf == 1 for r in per_key_files)


def test_ordered_effect_sees_rows_in_order(spark):
    rows = [("k1", 3, "c"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 1, "x")]
    df = spark.createDataFrame(rows, "key string, seq long, msg string")

    def join_msgs(pdf):
        import pandas as pd

        return pd.DataFrame({"key": [pdf["key"].iloc[0]], "joined": [",".join(pdf["msg"])]})

    out = {
        r.key: r.joined
        for r in ordered_effect_per_key(df, "key", "seq", "key string, joined string", join_msgs).collect()
    }
    assert out == {"k1": "a,b,c", "k2": "x"}


def test_resize_truncates_and_rewrites_meta(spark):
    from kcl_akka_stream_spark.operators.multimodal import documents_as_media, resize_images

    docs = spark.createDataFrame([(1, "x" * 2000), (2, "short")], "doc_id long, text string")
    out = {r.media_id: r for r in resize_images(documents_as_media(docs), 32, 32).collect()}
    assert out[1].n_bytes == 1024  # truncated to w*h
    assert out[2].n_bytes == 5  # shorter than target stays whole
    assert out[1].width == 32 and out[1].height == 32


def test_compact_parquet_dir(spark, tmp_path):
    from pyspark.sql import functions as _F

    from kcl_akka_stream_spark.operators.sinks import compact_parquet_dir

    src = str(tmp_path / "small_files")
    # simulate a streaming sink: many tiny files
    for i in range(10):
        spark.range(i * 100, (i + 1) * 100).withColumn("v", _F.col("id") * 2).coalesce(
            1
        ).write.mode("append").parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) >= 10
    dst = str(tmp_path / "compacted")
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(dst + "/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == 1000


def test_keyed_ordered_stream_sink(spark, tmp_path):
    import uuid

    from kcl_akka_stream_spark.operators.sinks import keyed_ordered_stream_sink

    src = str(tmp_path / "sink_src")
    out = str(tmp_path / "sink_out")
    rows = [(k, i, f"m{i}") for k in ("a", "b") for i in range(30)]
    df = spark.createDataFrame(rows, "key string, seq long, msg string")
    # two source files -> two micro-batches
    df.filter(F.col("seq") < 15).coalesce(1).write.mode("append").parquet(src)
    df.filter(F.col("seq") >= 15).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        stream.writeStream.foreachBatch(keyed_ordered_stream_sink(out, "key", "seq"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    written = spark.read.parquet(out)
    assert written.count() == 60
    # per (epoch, key): exactly one file, rows in order within it
    per = (
        written.withColumn("f", F.input_file_name())
        .groupBy("__epoch", "key")
        .agg(F.countDistinct("f").alias("nf"))
        .collect()
    )
    assert all(r.nf == 1 for r in per)
    # global per-key order = (epoch, seq) is complete and gapless
    for k in ("a", "b"):
        seqs = [r.seq for r in written.filter(F.col("key") == k).orderBy("__epoch", "seq").collect()]
        assert seqs == list(range(30))


def test_csv_roundtrip_preserves_embedded_newlines_and_quotes(spark, tmp_path):
    # ADVICE r6 (low): sink_csv_roundtrip claims quoting fidelity for
    # embedded delimiters/quotes/newlines, but the fixture documents
    # contain none -- this pins the claimed failure mode with the SAME
    # writer/reader options the gate query uses.  Without multiLine=true
    # on the read, the newline row is torn into two records and the
    # roundtrip count/digest comparison here fails.
    rows = [
        (1, 'line one\nline two', "en", 17),
        (2, 'she said "hi", twice', "en", 20),
        (3, "comma, delimited, value", "fr", 23),
        (4, 'mix: "q"\n,and more', "fr", 18),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars int")
    out = str(tmp_path / "csv")
    (
        df.write.mode("overwrite")
        .option("compression", "gzip")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(out)
    )
    back = (
        spark.read.schema(df.schema)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(out)
    )
    got = sorted((r.doc_id, r.text, r.lang, r.n_chars) for r in back.collect())
    assert got == sorted(rows)
