"""Cassandra writer tests with a fake driver session: statement preparation,
partition-key batching (W8), route dispatch (W1-W5), nullToUnset (W6), and
the frame accounting the Simulacron reference tests pin."""

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.config import ColumnSpec, SinkConfig, TableConfig, TableSchema
from kafka_sink_spark.mapping.parser import parse_mapping
from kafka_sink_spark.operators.cassandra_writer import (
    UNSET,
    statement_texts,
    write_routed,
)
from kafka_sink_spark.operators.writes import run_sink_pipeline
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Executor python workers can't import pytest test modules by name — ship
# this module's classes by value inside the task closure instead.
from pyspark import cloudpickle  # noqa: E402

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class _FakeFuture:
    def result(self):
        return None


class FakeSession:
    """cassandra-driver Session lookalike recording every frame."""

    def __init__(self, log_dir):
        self.log_dir = log_dir

    def prepare(self, cql):
        return cql  # the "prepared statement" is just its text

    def _log(self, line):
        path = os.path.join(self.log_dir, f"{os.getpid()}.log")
        with open(path, "a") as f:
            f.write(line + "\n")

    def execute_async(self, stmt, params=None):
        # by-value pickling clones the sentinel → compare by repr, not identity
        unset = sum(1 for v in (params or {}).values() if repr(v) == repr(UNSET))
        self._log(f"EXECUTE\t{stmt}\t{len(params or {})}\t{unset}")
        return _FakeFuture()

    def execute_batch(self, stmts, consistency_level=None):
        self._log(f"BATCH\t{len(stmts)}\t{consistency_level}")
        return _FakeFuture()


def _factory_for(log_dir):
    def factory():
        return FakeSession(log_dir)

    return factory


def _read_log(log_dir):
    lines = []
    for name in os.listdir(log_dir):
        with open(os.path.join(log_dir, name)) as f:
            lines.extend(f.read().splitlines())
    return lines


def _routed(spark, null_every=None, deletes_enabled=True):
    events = load_tables(spark, SF_DIR, ("events",))["events"]
    value = F.concat(
        F.lit('{"k": '),
        F.when(
            F.col("event_id") % (null_every or 10**9) == 0, F.lit("null")
        ).otherwise(F.get_json_object("props", "$.k")),
        F.lit("}"),
    )
    records = events.select(
        F.lit("events").alias("topic"), F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"), F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"), value.alias("value"),
    )
    schema = TableSchema(
        "ks", "t",
        [ColumnSpec("upk", "bigint", primary_key=True), ColumnSpec("kcol", "int")],
    )
    table = TableConfig(
        "events", "ks", "t", parse_mapping("upk=key, kcol=value.k"),
        deletes_enabled=deletes_enabled,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    vs = StructType([StructField("k", IntegerType())])
    return run_sink_pipeline(records, table, schema, value_schema=vs), table, schema


def test_statement_texts_match_reference_shapes():
    schema = TableSchema(
        "ks", "t",
        [ColumnSpec("a", "bigint", primary_key=True), ColumnSpec("b", "int")],
    )
    table = TableConfig("x", "ks", "t", parse_mapping("a=key, b=value.b"))
    texts = statement_texts(table, schema)
    assert texts["insert"] == (
        "INSERT INTO ks.t(a,b) VALUES (:a,:b) "
        "USING TIMESTAMP :message_internal_timestamp"
    )
    assert texts["insert_ttl"].endswith(" AND TTL :message_internal_ttl")
    # TTL with no writetime must not lose the TTL (and must not bind a null
    # USING TIMESTAMP): dedicated timestamp-free TTL template.
    assert texts["insert_plain_ttl"] == (
        "INSERT INTO ks.t(a,b) VALUES (:a,:b) USING TTL :message_internal_ttl"
    )
    assert texts["delete"] == "DELETE FROM ks.t WHERE a=:a"


def test_plain_ttl_route():
    """A row with a TTL but no writetime routes to insert_plain_ttl and binds
    the TTL (previously it fell to insert_plain and silently dropped it)."""
    from kafka_sink_spark.operators.cassandra_writer import _route_and_params
    from kafka_sink_spark.operators.writes import ROUTE_COL, TTL_COL, WRITETIME_COL

    schema = TableSchema(
        "ks", "t",
        [ColumnSpec("a", "bigint", primary_key=True), ColumnSpec("b", "int")],
    )
    table = TableConfig("x", "ks", "t", parse_mapping("a=key, b=value.b"))
    row = {ROUTE_COL: "INSERT", "a": 1, "b": 2, WRITETIME_COL: None, TTL_COL: 60}
    kind, params = _route_and_params(row, table, schema)
    assert kind == "insert_plain_ttl"
    assert params["message_internal_ttl"] == 60
    assert "message_internal_timestamp" not in params


def test_partition_key_defaults_and_validation():
    """Without explicit flags the FIRST primary-key column is the partition
    key (Cassandra default); flagging a non-PK column is a config error."""
    import pytest

    from kafka_sink_spark.config import ConfigError

    schema = TableSchema(
        "ks", "t",
        [
            ColumnSpec("p", "bigint", primary_key=True),
            ColumnSpec("c", "bigint", primary_key=True),
            ColumnSpec("v", "int"),
        ],
    )
    assert schema.partition_key == ["p"]
    assert schema.clustering_columns == ["c"]
    with pytest.raises(ConfigError):
        TableSchema(
            "ks", "t",
            [
                ColumnSpec("p", "bigint", primary_key=True),
                ColumnSpec("v", "int", partition_key=True),
            ],
        )


def test_batching_groups_on_partition_key(spark):
    """W8: rows sharing a partition key but differing in clustering columns
    co-batch (the reference batches by ROUTING key, not the full PK)."""
    from kafka_sink_spark.operators.writes import partition_key_batches

    schema = TableSchema(
        "ks", "t",
        [
            ColumnSpec("p", "bigint", primary_key=True),
            ColumnSpec("seq", "bigint", primary_key=True),
            ColumnSpec("v", "int"),
        ],
    )
    # 2 partitions x 40 clustering values
    df = spark.range(80).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("seq"), F.lit(1).alias("v")
    )
    out = partition_key_batches(df, schema, max_batch=32).collect()
    assert len(out) == 2  # one row per PARTITION, not per (p, seq)
    assert all(r.n_statements == 40 and r.n_frames == 2 for r in out)


def test_writer_cobatches_clustering_rows(spark, tmp_path):
    """The physical writer's run detection also keys on the partition key:
    40 rows of one partition -> ceil(40/32) = 2 frames, not 40 singles."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    schema = TableSchema(
        "ks", "t",
        [
            ColumnSpec("p", "bigint", primary_key=True),
            ColumnSpec("seq", "bigint", primary_key=True),
            ColumnSpec("v", "int"),
        ],
    )
    table = TableConfig("x", "ks", "t", parse_mapping("p=key, seq=value.s, v=value.v"))
    from kafka_sink_spark.operators.writes import ROUTE_COL, TTL_COL, WRITETIME_COL

    routed = spark.range(80).select(
        (F.col("id") % 2).alias("p"), F.col("id").alias("seq"), F.lit(1).alias("v"),
        F.lit("INSERT").alias(ROUTE_COL), F.lit(1000).alias(WRITETIME_COL),
        F.lit(None).cast("long").alias(TTL_COL), F.col("id").alias("_kafka_offset"),
    )
    cfg = SinkConfig(tables=[table], max_number_of_records_in_batch=32)
    stats = write_routed(routed, table, schema, cfg, _factory_for(log_dir))
    assert stats["rows"] == 80
    assert stats["batches"] == 4 and stats["singles"] == 0  # 2 parts x 2 frames


def test_write_batches_and_frames(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    routed, table, schema = _routed(spark)
    cfg = SinkConfig(tables=[table], max_number_of_records_in_batch=32)
    stats = write_routed(routed, table, schema, cfg, _factory_for(log_dir))

    n_rows = routed.count()
    assert stats["rows"] == n_rows
    lines = _read_log(log_dir)
    batch_lines = [l for l in lines if l.startswith("BATCH")]
    exec_lines = [l for l in lines if l.startswith("EXECUTE")]
    assert len(batch_lines) == stats["batches"]
    assert len(exec_lines) == stats["singles"]
    # 1000 events over 15 users: every user has >1 event → all frames are
    # batches, each ≤ 32 statements, totals add up.
    total_in_batches = sum(int(l.split("\t")[1]) for l in batch_lines)
    assert total_in_batches + len(exec_lines) == n_rows
    assert all(int(l.split("\t")[1]) <= 32 for l in batch_lines)
    # frame math per key: ceil(n_k / 32) — same rule as sink_batching
    expected_frames = (
        routed.groupBy("upk").count()
        .select(F.ceil(F.col("count") / 32).cast("long").alias("f"))
        .agg(F.sum("f")).collect()[0][0]
    )
    assert stats["batches"] + stats["singles"] == expected_frames


def test_null_to_unset_binding(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    # deletes disabled: null non-PK values stay INSERTs and bind as UNSET
    # (with deletes on, full-coverage null rows become DELETEs instead).
    routed, table, schema = _routed(spark, null_every=3, deletes_enabled=False)
    # keep each row an individual EXECUTE so the unset count is per-row
    cfg = SinkConfig(tables=[table], max_number_of_records_in_batch=1)
    write_routed(routed, table, schema, cfg, _factory_for(log_dir))
    lines = _read_log(log_dir)
    with_unset = [l for l in lines if l.endswith("\t1")]
    n_null = routed.filter(F.col("kcol").isNull()).count()
    assert n_null > 0
    assert len(with_unset) == n_null


def test_writer_coalesces_presplit_partition_key(spark, tmp_path):
    """VERDICT r3 #3 (reference SimpleEndToEndSimulacronIT.java:776-875): a
    partition key arriving scattered across many upstream Spark partitions
    must still produce exactly ceil(n_key/32) wire frames — write_routed
    repartitions on the routing key before run detection, so scattering
    cannot inflate the frame count or break the <=32 cap."""
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    schema = TableSchema(
        "ks", "t",
        [
            ColumnSpec("p", "bigint", primary_key=True),
            ColumnSpec("seq", "bigint", primary_key=True),
            ColumnSpec("v", "int"),
        ],
    )
    table = TableConfig("x", "ks", "t", parse_mapping("p=key, seq=value.s, v=value.v"))
    from kafka_sink_spark.operators.writes import ROUTE_COL, TTL_COL, WRITETIME_COL

    # 3 keys x 70 rows, deliberately scattered round-robin over 11 partitions
    routed = (
        spark.range(210)
        .select(
            (F.col("id") % 3).alias("p"), F.col("id").alias("seq"),
            F.lit(1).alias("v"), F.lit("INSERT").alias(ROUTE_COL),
            F.lit(1000).alias(WRITETIME_COL),
            F.lit(None).cast("long").alias(TTL_COL),
            F.col("id").alias("_kafka_offset"),
        )
        .repartition(11)
    )
    cfg = SinkConfig(tables=[table], max_number_of_records_in_batch=32)
    stats = write_routed(routed, table, schema, cfg, _factory_for(log_dir))
    assert stats["rows"] == 210
    # per key: ceil(70/32) = 3 frames -> 9 total, none degraded to singles
    assert stats["batches"] == 9 and stats["singles"] == 0
    batch_lines = [l for l in _read_log(log_dir) if l.startswith("BATCH")]
    sizes = sorted(int(l.split("\t")[1]) for l in batch_lines)
    assert all(s <= 32 for s in sizes)
    assert sizes == sorted([32, 32, 6] * 3)


def test_composite_partition_key_batching(spark, tmp_path):
    """VERDICT r3 #3: a COMPOSITE partition key ((p1, p2), seq) batches on
    the full (p1, p2) routing key — rows differing in either component never
    co-batch; rows differing only in clustering seq do."""
    from kafka_sink_spark.operators.writes import (
        ROUTE_COL,
        TTL_COL,
        WRITETIME_COL,
        partition_key_batches,
    )

    schema = TableSchema(
        "ks", "t",
        [
            ColumnSpec("p1", "bigint", primary_key=True, partition_key=True),
            ColumnSpec("p2", "bigint", primary_key=True, partition_key=True),
            ColumnSpec("seq", "bigint", primary_key=True),
            ColumnSpec("v", "int"),
        ],
    )
    assert schema.partition_key == ["p1", "p2"]
    assert schema.clustering_columns == ["seq"]
    # 2 x 2 composite keys, 40 clustering rows each
    df = spark.range(160).select(
        (F.col("id") % 2).alias("p1"), ((F.col("id") / 2).cast("long") % 2).alias("p2"),
        F.col("id").alias("seq"), F.lit(1).alias("v"),
    )
    out = partition_key_batches(df, schema, max_batch=32).collect()
    assert len(out) == 4  # one row per (p1, p2), not per p1 or per full PK
    assert all(r.n_statements == 40 and r.n_frames == 2 for r in out)

    # physical writer agrees with the logical frame math
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    table = TableConfig(
        "x", "ks", "t", parse_mapping("p1=key, p2=value.p2, seq=value.s, v=value.v")
    )
    routed = df.select(
        "p1", "p2", "seq", "v",
        F.lit("INSERT").alias(ROUTE_COL), F.lit(1000).alias(WRITETIME_COL),
        F.lit(None).cast("long").alias(TTL_COL), F.col("seq").alias("_kafka_offset"),
    )
    cfg = SinkConfig(tables=[table], max_number_of_records_in_batch=32)
    stats = write_routed(routed, table, schema, cfg, _factory_for(log_dir))
    assert stats["rows"] == 160
    assert stats["batches"] == 8 and stats["singles"] == 0  # 4 keys x 2 frames
