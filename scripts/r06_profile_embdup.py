"""Stage-level profile of embedding_dup_pairs at sf1.0 (guide §1)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oplogtoredis_spark.operators.dedup import embedding_dup_pairs_lsh  # noqa: E402
from oplogtoredis_spark.operators.similarity import lsh_bucket_tables  # noqa: E402
from oplogtoredis_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF = "/root/testdata/sf1.0"
spark = get_spark("prof", master="local[32]", shuffle_partitions=128)
spark.sparkContext.setLogLevel("ERROR")


def t(label, df):
    t0 = time.time()
    spark.sparkContext.setJobDescription(label)
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.time() - t0:.2f}s")


emb = entry._emb(spark, SF)
bk = lsh_bucket_tables(emb, "vec_id", "embedding", 4, 8, carry_all=True)
t("buckets", bk)

a = bk.select(F.col("_id").alias("id_a"), "tbl", "bkt",
              *[F.col(f"_b{i}").alias(f"_ea{i}") for i in range(7)])
b = bk.select(F.col("_id").alias("id_b"), "tbl", "bkt",
              *[F.col(f"_b{i}").alias(f"_eb{i}") for i in range(7)])
em = None
for i in range(7):
    term = (F.col("tbl") > i) & (F.col(f"_ea{i}") == F.col(f"_eb{i}"))
    em = term if em is None else em | term
cand = (a.join(F.broadcast(b), on=["tbl", "bkt"])
        .where(F.col("id_a") < F.col("id_b")).where(~em)
        .select("id_a", "id_b"))
t("candidates(first-collision)", cand)

full = embedding_dup_pairs_lsh(emb, "vec_id", "embedding",
                               threshold=0.4, n_planes=4, n_tables=8)
t("full", full)
spark.stop()
