"""A/B the aux-table writes (new salted layout vs old one-char-key shuffle)
against an existing dictionary/, back-to-back in one session so VM host
steal is common-mode. Usage: python tools/time_aux.py <index_dir> <cpus>"""
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

idx = sys.argv[1]
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .appName("time-aux").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from polaris_spark.index.build import build_completion_table, build_fuzzy_table

scratch = "/dev/shm/aux_ab"


def leg(name, fn):
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    # stage the dictionary in place
    os.symlink(os.path.join(idx, "dictionary"),
               os.path.join(scratch, "dictionary"))
    t0 = time.time()
    fn()
    w = time.time() - t0
    print(f"{name}: {w:.1f}s", flush=True)
    return w


def old_completion():
    from polaris_spark.tokenizer import parts_col
    dic = spark.read.parquet(os.path.join(scratch, "dictionary"))
    needs_derive = F.col("term").rlike("[A-Z._']")
    acro = F.regexp_replace(F.col("term"), "[^A-Z]", "")
    derived = F.array_union(
        F.array(F.lower(F.col("term"))),
        F.transform(parts_col(F.col("term")), lambda s: F.lower(s)))
    derived = F.when(F.length(acro) > 1,
                     F.array_union(derived, F.array(F.lower(acro)))
                     ).otherwise(derived)
    keys = F.when(needs_derive, derived).otherwise(
        F.array(F.lower(F.col("term"))))
    comp = dic.select(F.explode(keys).alias("key"), "term", "df", "cf")
    comp = comp.withColumn("k1", F.substring("key", 1, 1))
    (comp.repartition("k1").sortWithinPartitions("key")
     .write.mode("overwrite").partitionBy("k1")
     .parquet(os.path.join(scratch, "completion")))


def old_fuzzy():
    dic = (spark.read.parquet(os.path.join(scratch, "dictionary"))
           .groupBy("term").agg(F.sum("df").alias("df")))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.length("term") - 1),
        lambda i: F.col("term").substr(i, F.lit(2))))
    fz = (dic.where(F.length("term") >= 2)
          .select(F.explode(grams).alias("gram"), "term", "df")
          .withColumn("g1", F.substring("gram", 1, 1)))
    (fz.repartition("g1").sortWithinPartitions("gram")
     .write.mode("overwrite").partitionBy("g1")
     .parquet(os.path.join(scratch, "fuzzy_ngrams")))


leg("new_completion", lambda: build_completion_table(spark, scratch))
leg("new_fuzzy", lambda: build_fuzzy_table(spark, scratch))
leg("old_completion", old_completion)
leg("old_fuzzy", old_fuzzy)
leg("new_completion2", lambda: build_completion_table(spark, scratch))
leg("new_fuzzy2", lambda: build_fuzzy_table(spark, scratch))
spark.stop()
