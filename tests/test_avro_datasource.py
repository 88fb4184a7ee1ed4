"""Python DataSource (format "avro_ocf") — unit tests beyond the
oracle-parity sweep: self-describing schema inference, strictness on
corruption, and the one-partition-per-file planning contract."""

from __future__ import annotations

import glob
import os

import pytest

from s3_avro_repair_spark.avro_codec import write_ocf_bytes
from s3_avro_repair_spark.sources.avro_datasource import (
    _field_ddl,
    _list_container_files,
    mount,
)

SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": "double"},
    ],
}


def _write_tree(tmp, n_files=3, rows_per=10):
    d = tmp / "tree"
    d.mkdir()
    for i in range(n_files):
        recs = [
            {"k": i * 100 + j, "s": f"v{j}" if j % 2 else None, "x": j / 2}
            for j in range(rows_per)
        ]
        (d / f"part-{i}.avro").write_bytes(write_ocf_bytes(SCHEMA, recs))
    return str(d)


def test_inferred_schema_and_values(spark, tmp_path):
    d = _write_tree(tmp_path)
    df = spark.read.format(mount(spark)).load(d)
    # nullable union inferred to its branch; names from the header
    assert df.schema.simpleString() == "struct<k:bigint,s:string,x:double>"
    rows = {r.k: (r.s, r.x) for r in df.collect()}
    assert len(rows) == 30
    assert rows[205] == ("v5", 2.5)
    assert rows[204] == (None, 2.0)


def test_one_partition_per_file(spark, tmp_path):
    d = _write_tree(tmp_path, n_files=4)
    df = (
        spark.read.format(mount(spark))
        .schema("k long, s string, x double")
        .load(d)
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40


def test_corruption_fails_the_scan(spark, tmp_path):
    """Strict scan semantics, like avro_scan: a torn container fails
    the task rather than silently dropping rows (tolerant reads are
    avro_validate/avro_repair's job)."""
    d = _write_tree(tmp_path, n_files=2)
    f = sorted(glob.glob(os.path.join(d, "*.avro")))[0]
    data = bytearray(open(f, "rb").read())
    data[len(data) // 2] ^= 0xFF  # flip a payload byte mid-block
    open(f, "wb").write(bytes(data))
    df = (
        spark.read.format(mount(spark))
        .schema("k long, s string, x double")
        .load(d)
    )
    with pytest.raises(Exception):
        df.count()


def test_inference_refuses_complex_types():
    with pytest.raises(ValueError):
        _field_ddl({"type": "array", "items": "long"})
    with pytest.raises(ValueError):
        _field_ddl(["null", "long", "string"])  # multi-branch union
    # logical types surface as their raw carrier
    assert _field_ddl({"type": "long", "logicalType": "timestamp-micros"}) == "long"


def test_listing_single_file(tmp_path):
    d = _write_tree(tmp_path, n_files=1)
    f = os.path.join(d, "part-0.avro")
    assert _list_container_files(f) == [f]
    assert len(_list_container_files(d)) == 1


def test_write_read_roundtrip_with_nulls(spark, tmp_path):
    """The DataSource write path: nullable columns become
    ["null", T] unions, NULL cells round-trip, one container per
    partition, and mode("overwrite") replaces prior output."""
    from s3_avro_repair_spark.sources.avro_datasource import mount

    d = str(tmp_path / "out")
    fmt = mount(spark)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)],
        "k long, s string, x double",
    ).repartition(2)
    df.write.format(fmt).mode("overwrite").save(d)
    files = glob.glob(os.path.join(d, "*.avro"))
    assert len(files) == 2
    back = spark.read.format(fmt).load(d)
    assert {tuple(r) for r in back.collect()} == {
        (1, "a", 1.5), (2, None, None), (3, "c", -0.25)
    }
    # overwrite replaces, never appends
    df.limit(1).coalesce(1).write.format(fmt).mode("overwrite").save(d)
    assert spark.read.format(fmt).load(d).count() == 1


def test_write_refuses_complex_columns(spark, tmp_path):
    from s3_avro_repair_spark.sources.avro_datasource import mount

    fmt = mount(spark)
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(Exception, match="unsupported column type"):
        df.write.format(fmt).mode("overwrite").save(str(tmp_path / "o"))
