"""Python Data Source connector seam (sources/python_source.py): the
shard->partition mapping and the paced micro-batch offset protocol."""

import uuid

from pyspark.sql import functions as F

from kcl_akka_stream_spark.sources.python_source import register


def test_batch_one_partition_per_shard(spark):
    register(spark)
    df = (
        spark.read.format("envelope_sim")
        .option("n_shards", "4")
        .option("records_per_shard", "10")
        .load()
    )
    # S5 parity: reader parallelism == shard count, rows per shard intact
    assert df.rdd.getNumPartitions() == 4
    counts = {r.shard_id: r.n for r in df.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {f"shardId-{s:012d}": 10 for s in range(4)}


def test_stream_drains_in_paced_microbatches(spark):
    register(spark)
    name = f"pyds_test_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("envelope_sim")
        .option("n_shards", "2")
        .option("records_per_shard", "250")
        .option("seqs_per_batch", "100")
        .load()
    )
    agg = stream.groupBy("shard_id").agg(F.sum("sequence_number").alias("sum_seq"))
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        sizes = [int(p["numInputRows"]) for p in q.recentProgress if int(p["numInputRows"]) > 0]
    finally:
        q.stop()
    # 250 seqs at 100/trigger over 2 shards -> 200, 200, 100: the stream
    # REALLY drains across three micro-batches (not one batch-read in
    # disguise), and the boundary seqs are neither dropped nor doubled.
    assert sizes == [200, 200, 100]
    rows = {r.shard_id: r.sum_seq for r in spark.table(name).collect()}
    assert rows == {f"shardId-{s:012d}": 250 * 251 // 2 for s in range(2)}
