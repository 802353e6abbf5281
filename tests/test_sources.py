"""Source/sink coverage: CSV options parity with the reference
(io/reader/csv/options.rs defaults: header true, sep ',', quote '"',
optional schema, inference) and the parquet writer round-trip the
reference lacks (io/writer/mod.rs is empty)."""

import os

from pyspark.sql import functions as F

from simple_rust_query_engine_spark import SessionContext
from simple_rust_query_engine_spark.sources import write_parquet


def test_csv_roundtrip_with_options(spark, tmp_path):
    ctx = SessionContext(spark)
    p = str(tmp_path / "simple.csv")
    with open(p, "w") as f:
        f.write("c1;c2;c3\na;1;2\nb;2;3\n\"x;y\";3;4\n")
    df = ctx.read_csv(p, delimiter=";", schema="c1 string, c2 long, c3 long")
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [("a", 1, 2), ("b", 2, 3), ("x;y", 3, 4)]


def test_csv_schema_inference(spark, tmp_path):
    ctx = SessionContext(spark)
    p = str(tmp_path / "infer.csv")
    with open(p, "w") as f:
        f.write("c1,c2,c3\na,1,2.5\nb,2,3.5\n")
    df = ctx.read_csv(p)
    types = dict(df.df.dtypes)
    assert types == {"c1": "string", "c2": "int", "c3": "double"}


def test_register_csv_sql(spark, tmp_path):
    ctx = SessionContext(spark)
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("c1,c2\na,1\na,2\nb,5\n")
    ctx.register_csv("t_csv", p)
    out = ctx.sql("SELECT c1, SUM(c2) AS s FROM t_csv GROUP BY c1")
    assert sorted(tuple(r) for r in out.collect()) == [("a", 3), ("b", 5)]


def test_parquet_write_roundtrip(spark, tables, tmp_path):
    out_dir = str(tmp_path / "nation_out")
    src = tables["nation"]
    write_parquet(src, out_dir, partition_by=["n_regionkey"])
    back = spark.read.parquet(out_dir)
    assert back.count() == src.count()
    # partition pruning works on the written layout
    pruned = back.filter(F.col("n_regionkey") == 0)
    assert pruned.count() == src.filter(F.col("n_regionkey") == 0).count()
    # partition dirs exist
    assert any(d.startswith("n_regionkey=") for d in os.listdir(out_dir))


def test_compact_parquet_reduces_file_count(spark, tables, tmp_path):
    from simple_rust_query_engine_spark.sources.write import compact_parquet

    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    # simulate incremental-ingest fragmentation: 40 tiny files
    tables["orders"].repartition(40).write.parquet(frag)
    n_in = len(spark.read.parquet(frag).inputFiles())
    assert n_in >= 40
    n_out = compact_parquet(spark, frag, out)
    assert n_out < n_in
    # contents survive the rewrite
    assert spark.read.parquet(out).count() == tables["orders"].count()


def test_json_ndjson_roundtrip(spark, tmp_path):
    from simple_rust_query_engine_spark.sources import read_json, write_json

    p = str(tmp_path / "docs.ndjson")
    with open(p, "w") as f:
        f.write('{"id": 1, "text": "hello world"}\n')
        f.write('{"id": 2, "text": "json; with, chars"}\n')
    df = read_json(spark, p, schema="id long, text string")
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(1, "hello world"), (2, "json; with, chars")]
    # inferred schema agrees with the explicit one
    inf = read_json(spark, p)
    assert dict(inf.dtypes) == {"id": "bigint", "text": "string"}
    out = str(tmp_path / "docs_out")
    write_json(df, out)
    assert sorted(tuple(r) for r in read_json(spark, out, schema="id long, text string").collect()) == rows


def test_json_multiline_array(spark, tmp_path):
    from simple_rust_query_engine_spark.sources import read_json

    p = str(tmp_path / "arr.json")
    with open(p, "w") as f:
        f.write('[{"id": 1, "v": 2.5}, {"id": 2, "v": 3.5}]')
    df = read_json(spark, p, multiline=True)
    assert sorted(tuple(r) for r in df.collect()) == [(1, 2.5), (2, 3.5)]


def test_orc_roundtrip(spark, tables, tmp_path):
    from simple_rust_query_engine_spark.sources import read_orc, write_orc

    out = str(tmp_path / "nation_orc")
    write_orc(tables["nation"], out)
    back = read_orc(spark, out)
    assert back.count() == tables["nation"].count()
    assert dict(back.dtypes) == dict(tables["nation"].dtypes)


def test_write_sorted_produces_zone_map_layout(tables, tmp_path):
    # the clustering contract, read straight from the parquet footers:
    # with range-clustering each file's [min,max] span of the sort key
    # covers ~1/N of the global range (near-disjoint zone maps); an
    # unclustered write leaves every file spanning ~the whole range,
    # so min/max stats can prune nothing
    import glob

    import pyarrow.parquet as pq

    from simple_rust_query_engine_spark.sources.write import (
        write_parquet,
        write_sorted,
    )

    li = tables["lineitem"].select("l_orderkey", "l_extendedprice")
    sorted_dir = str(tmp_path / "sorted")
    plain_dir = str(tmp_path / "plain")
    write_sorted(li, sorted_dir, ["l_orderkey"], num_files=8)
    write_parquet(li.repartition(8), plain_dir)

    def spans(d):
        out = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.read_metadata(f)
            lo = min(
                md.row_group(i).column(0).statistics.min
                for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(0).statistics.max
                for i in range(md.num_row_groups)
            )
            out.append(hi - lo)
        return out

    from pyspark.sql import functions as F

    s_spans, p_spans = spans(sorted_dir), spans(plain_dir)
    assert len(s_spans) >= 4
    stats = li.agg(
        F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
    ).collect()[0]
    global_span = stats.mx - stats.mn
    # clustered: average file span well under half the global range;
    # unclustered: every file spans nearly all of it
    assert sum(s_spans) / len(s_spans) < 0.5 * global_span, s_spans
    assert min(p_spans) > 0.8 * global_span, p_spans
    # and the data still round-trips
    back = li.sparkSession.read.parquet(sorted_dir)
    assert back.count() == li.count()


def test_write_zordered_prunes_on_both_columns(tables, tmp_path):
    # the 2-D contract, read from the parquet footers: after Z-order
    # clustering on (orderkey, partkey), a selective range on EITHER
    # column overlaps only a fraction of the files' [min,max] spans;
    # the 1-D orderkey layout leaves every file spanning ~the whole
    # partkey range, so a partkey filter prunes nothing
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from simple_rust_query_engine_spark.sources.write import (
        write_sorted,
        write_zordered,
    )

    li = tables["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice")
    z_dir, s_dir = str(tmp_path / "zord"), str(tmp_path / "sorted1d")
    write_zordered(li, z_dir, ["l_orderkey", "l_partkey"], num_files=16)
    write_sorted(li, s_dir, ["l_orderkey"], num_files=16)

    def file_ranges(d, col):
        out = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            st = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
            out.append((min(s.min for s in st), max(s.max for s in st)))
        return out

    stats = li.agg(
        F.min("l_partkey").alias("mn"), F.max("l_partkey").alias("mx")
    ).collect()[0]
    # 10%-of-domain partkey box, placed INSIDE a top-level Morton
    # quadrant (a box straddling the domain midpoint touches both
    # halves of the curve by construction)
    lo = stats.mn + (stats.mx - stats.mn) * 20 // 100
    hi = stats.mn + (stats.mx - stats.mn) * 30 // 100

    def overlapping(ranges):
        return sum(1 for mn, mx in ranges if mx >= lo and mn <= hi)

    z_ranges = file_ranges(z_dir, "l_partkey")
    s_ranges = file_ranges(s_dir, "l_partkey")
    assert len(z_ranges) >= 8 and len(s_ranges) >= 8
    # 1-D layout: essentially every file overlaps the partkey box
    assert overlapping(s_ranges) >= 0.8 * len(s_ranges), s_ranges
    # Z-order: at most ~half the files do (16 files ≈ 4x4 Morton grid;
    # a 10% in-quadrant slab intersects one-to-two grid columns, plus
    # boundary files from count-equal — not quadrant-aligned — splits)
    assert overlapping(z_ranges) <= 0.6 * len(z_ranges), z_ranges
    # and orderkey pruning still works too (not as tight as pure 1-D,
    # but far from unclustered)
    o_stats = li.agg(
        F.min("l_orderkey").alias("mn"), F.max("l_orderkey").alias("mx")
    ).collect()[0]
    lo, hi = (
        o_stats.mn + (o_stats.mx - o_stats.mn) * 20 // 100,
        o_stats.mn + (o_stats.mx - o_stats.mn) * 30 // 100,
    )
    zo_ranges = file_ranges(z_dir, "l_orderkey")
    assert overlapping(zo_ranges) <= 0.6 * len(zo_ranges), zo_ranges
    # data round-trips
    back = li.sparkSession.read.parquet(z_dir)
    assert back.count() == li.count()
    assert dict(back.dtypes) == dict(li.dtypes)
