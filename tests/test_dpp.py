"""Dynamic partition pruning — the partition-elimination invariant.

At 100 TB a fact table is partition-laid-out (date, region, flag) and
star-join queries must scan ONLY the partitions the filtered dimension
selects. Spark does this at runtime (DPP: the broadcast dim's keys
become a partition filter on the fact scan) — but only when the plan
shape cooperates: join ON the partition column, selective filter on
the dim side. These tests pin that our layout + join shapes keep DPP
alive, and that the checker itself has teeth (negative control).
"""

from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.sources import load_table


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _setup(spark, tmp_path):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    fact_dir = str(tmp_path / "fact")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(fact_dir)
    dim_dir = str(tmp_path / "dim")
    spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        "flag string, label string").write.mode("overwrite").parquet(dim_dir)
    return spark.read.parquet(fact_dir), spark.read.parquet(dim_dir)


def test_partition_pruning_is_dynamic(spark, tmp_path):
    fact, dim = _setup(spark, tmp_path)
    sel = dim.filter(F.col("label") == "returned")
    j = (fact.join(sel, fact.l_returnflag == sel.flag)
             .groupBy("label").agg(F.count("*").alias("n")))
    plan = _executed_plan(j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the answer is right: only the R partition's rows
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    want = li.filter(F.col("l_returnflag") == "R").count()
    got = j.collect()
    assert got[0]["n"] == want and got[0]["label"] == "returned"


def test_negative_control_unpartitioned_fact_no_dpp(spark, tmp_path):
    """Same join over an UNPARTITIONED copy: no partition filter to
    prune, so the checker must find nothing — proving the positive
    test isn't matching noise."""
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    flat_dir = str(tmp_path / "flat")
    li.write.mode("overwrite").parquet(flat_dir)
    fact = spark.read.parquet(flat_dir)
    dim_dir = str(tmp_path / "dim2")
    spark.createDataFrame(
        [("R", "returned")], "flag string, label string") \
        .write.mode("overwrite").parquet(dim_dir)
    sel = spark.read.parquet(dim_dir).filter(F.col("label") == "returned")
    j = (fact.join(sel, fact.l_returnflag == sel.flag)
             .groupBy("label").count())
    assert "dynamicpruning" not in _executed_plan(j).lower()


def test_runtime_bloom_filter_join_injection(spark, tmp_path):
    """Runtime bloom-filter join pruning (InjectRuntimeFilter): with a
    selective creation side, Spark seeds a bloom_filter_agg on the dim
    keys and pre-filters the fact's shuffle. The default application-
    side threshold is 10 GB — exactly the 100 TB regime this engine
    targets — so the fixture-scale test lowers the thresholds to prove
    our join SHAPES qualify, then restores them. Negative control:
    default thresholds at fixture scale inject nothing."""
    from nyctaxidatapipeline_spark.sources import load_table

    def j():
        # rebuilt per conf change: a DataFrame caches its
        # QueryExecution, so optimizer flags only affect fresh plans
        li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
        ords = (load_table(spark, "/root/testdata/sf0.01", "orders")
                .filter(F.col("o_orderpriority") == "1-URGENT"))
        return (li.join(ords, li.l_orderkey == ords.o_orderkey)
                  .groupBy("o_orderpriority").count())

    conf = spark.conf
    app_thr = "spark.sql.optimizer.runtime.bloomFilter." \
              "applicationSideScanSizeThreshold"
    cre_thr = "spark.sql.optimizer.runtime.bloomFilter." \
              "creationSideThreshold"
    bcast = "spark.sql.autoBroadcastJoinThreshold"
    old_bcast = conf.get(bcast)
    assert conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    try:
        conf.set(bcast, "-1")  # force the shuffle join blooms exist for
        assert "bloom_filter" not in _executed_plan(j())  # fixture scale
        conf.set(app_thr, "0")
        conf.set(cre_thr, "100MB")
        plan = _executed_plan(j())
        assert "bloom_filter_agg" in plan and "might_contain" in plan
    finally:
        conf.set(bcast, old_bcast)
        conf.unset(app_thr)
        conf.unset(cre_thr)


def test_pruned_partitions_are_never_read(spark, tmp_path):
    """Behavioral proof of pruning (stronger than the plan string):
    corrupt every file in the non-selected partitions — the star join
    still succeeds with the right answer because DPP never schedules
    tasks for those partitions, while an unpruned full read of the
    same table fails on the corrupt files."""
    import os

    import pytest

    fact_dir = str(tmp_path / "factc")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(fact_dir)
    want = li.filter(F.col("l_returnflag") == "R").count()
    # capture the schema BEFORE corrupting: schema inference reads a
    # footer at read() time, which would touch a corrupt file before
    # any pruning can happen
    schema = spark.read.parquet(fact_dir).schema
    for flag in ("A", "N"):
        pdir = os.path.join(fact_dir, f"l_returnflag={flag}")
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                with open(os.path.join(pdir, f), "wb") as fh:
                    fh.write(b"corrupt! not parquet at all")
            if f.startswith("."):  # Hadoop .crc sidecars
                os.remove(os.path.join(pdir, f))
    dim_dir = str(tmp_path / "dimc")
    spark.createDataFrame([("R", "returned")],
                          "flag string, label string") \
        .write.mode("overwrite").parquet(dim_dir)
    fact = spark.read.schema(schema).parquet(fact_dir)
    sel = spark.read.parquet(dim_dir).filter(F.col("label") == "returned")
    got = (fact.join(sel, fact.l_returnflag == sel.flag)
               .groupBy("label").count().collect())
    assert got[0]["count"] == want  # pruned partitions never touched
    with pytest.raises(Exception):  # full read must hit the corruption
        spark.read.schema(schema).parquet(fact_dir).count()
