"""q16 per-branch profile + folded-array-branch A/B at sf0.1."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lambda_kafka_to_s3_parquet_spark import get_spark
from lambda_kafka_to_s3_parquet_spark.session import load_table


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="q16-profile")
    load_table(spark, sf_dir, "lineitem").count()

    e = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    print("emb rows", emb.count(), "dim",
          emb.select(F.size("embedding")).first()[0], flush=True)

    kx = F.get_json_object("props", "$.k").cast("bigint")
    json_b = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(kx), 2).alias("va"),
        F.max(kx).cast("double").alias("vb"),
    )
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    sum_sq = F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x * x)
    total = F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x)
    arr_old = emb.select(
        F.col("vec_id").cast("string").alias("ks"),
        F.size("embedding").cast("bigint").alias("n1"),
        F.round(F.element_at(emb_d, 1), 6).alias("v1"),
        F.round(F.sqrt(sum_sq), 6).alias("v2"),
        F.round(total / F.size("embedding"), 6).alias("v3"),
    )
    both = F.aggregate(
        "embedding",
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("ss")),
        lambda a, x: F.struct(
            (a["s"] + x.cast("double")).alias("s"),
            (a["ss"] + x.cast("double") * x.cast("double")).alias("ss"),
        ),
    )
    arr_new = emb.select(
        F.col("vec_id").cast("string").alias("ks"),
        F.size("embedding").cast("bigint").alias("n1"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("v1"),
        F.round(F.sqrt(both["ss"]), 6).alias("v2"),
        F.round(both["s"] / F.size("embedding"), 6).alias("v3"),
    )
    date_b = o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("ka"),
        F.month("o_orderdate").cast("bigint").alias("kb"),
    ).agg(
        F.count("*").alias("na"),
        F.countDistinct("o_custkey").alias("nb"),
        F.max(F.datediff("o_orderdate", F.lit("1995-01-01"))).cast("bigint").alias("nc"),
        F.countDistinct(F.dayofweek("o_orderdate")).alias("nd"),
        F.min(F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM")).alias("sa"),
        F.min(F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd")).alias("sb"),
    )
    string_b = p.filter(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.length("p_name").cast("bigint").alias("k2"),
        F.upper("p_brand").alias("s1"),
        F.substring("p_name", 1, 8).alias("s2"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("s3"),
        F.regexp_replace("p_type", " ", "_").alias("s4"),
        F.regexp_extract("p_type", "([a-z]+)$", 1).alias("s5"),
    )
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.90))
    )
    pct_b = l.groupBy("l_returnflag").agg(
        pcts.alias("_p"), F.round(F.max("l_extendedprice"), 2).alias("_p100")
    )
    branches = [
        ("json", json_b), ("array_old", arr_old), ("array_new", arr_new),
        ("date", date_b), ("string", string_b), ("pct", pct_b),
    ]
    for r in range(3):
        for name, df in branches:
            s0, t0 = steal(), time.perf_counter()
            noop(df)
            print(f"RUN {r} {name}: {time.perf_counter()-t0:.3f}s "
                  f"steal={steal()-s0:.1f}", flush=True)
    a = sorted(map(tuple, arr_old.collect()))
    b = sorted(map(tuple, arr_new.collect()))
    print("ARRAY_ROWS_IDENTICAL", a == b, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
