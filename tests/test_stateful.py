"""applyInPandasWithState: custom stateful op accumulates across micro-batches
and matches the batch aggregate after draining the stream."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

import pytest

from vectrekker_spark.streaming.jobs import read_events_stream
from vectrekker_spark.streaming.stateful import (
    running_user_totals,
    running_user_totals_tws,
)


def _split_events(sf_dir, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    third = t.num_rows // 3
    # three files → with maxFilesPerTrigger=1-ish batching the state must
    # carry across micro-batches
    pq.write_table(t.slice(0, third), d / "p0.parquet")
    pq.write_table(t.slice(third, third), d / "p1.parquet")
    pq.write_table(t.slice(2 * third), d / "p2.parquet")
    return d


@pytest.mark.parametrize(
    "op,qname",
    [
        (running_user_totals, "user_totals"),
        (running_user_totals_tws, "user_totals_tws"),
    ],
    ids=["applyInPandasWithState", "transformWithStateInPandas"],
)
def test_running_totals_match_batch(spark, sf_dir, tmp_path, op, qname):
    if op is running_user_totals_tws:
        from vectrekker_spark.streaming.stateful import tws_available

        if not tws_available():
            pytest.skip(
                "transformWithStateInPandas needs google.protobuf "
                "(absent from this container) — implementation env-gated"
            )
        # transformWithState supports only the RocksDB state store (OSS
        # Spark 4 requirement); the classic API keeps the default provider
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    d = _split_events(sf_dir, tmp_path)
    stream = read_events_stream(spark, str(d))
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted row per user == final running total == batch aggregate
    latest = (
        spark.table(qname)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in latest.collect()}
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").groupBy("user_id").count()
    want = {r["user_id"]: r["count"] for r in batch.collect()}
    if op is running_user_totals_tws:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert got == want
