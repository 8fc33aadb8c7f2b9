"""Generate an sf1-scale dataset by key-offset replication of sf0.1.

The driver ships sf{0.001,0.01,0.1} only; every perf claim above sf0.1 was
extrapolated (VERDICT r2 "Next round" #4). This builds a 10× dataset with
the same schema and join topology so bench.py + the DuckDB oracle can run
at sf1: each replica r offsets every primary/foreign key by r·(max_key+1)
(join selectivity, group counts per key, and key skew are preserved;
dimension tables nation/region stay fixed like TPC-H). Text/embedding
payloads replicate as-is — cross-replica exact duplicates are the expected
corpus shape at 10×, and the df-capped dedup paths are exactly the
operators whose scaling this measures.

Usage: python scripts/make_sf1.py [src_dir] [dest_dir] [replicas]
Defaults: /root/testdata/sf0.1 -> /root/repo/.testdata_sf1, 10 replicas
(replicas=30 builds the sf3 decade-check dataset, VERDICT r3 #5).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.queries.tables import TABLE_NAMES, load
from lakehouse_spain_mobility_spark.session import build_session

REPLICAS = 10

# table -> columns to offset per replica (keys only; payloads replicate)
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = {"region", "nation"}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.testdata_sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS
    spark = build_session(app_name="make-sf1")
    for t in TABLE_NAMES:
        df = load(spark, src, t)
        out = f"{dest}/{t}.parquet"
        if t in FIXED:
            df.coalesce(1).write.mode("overwrite").parquet(out)
            print(f"{t}: fixed dim copied")
            continue
        keys = [k for k in OFFSET_KEYS.get(t, []) if k in df.columns]
        strides = {
            k: int(df.agg(F.max(F.col(k))).first()[0]) + 1 for k in keys
        }
        rep = df.crossJoin(
            spark.range(replicas).select(F.col("id").alias("_r"))
        )
        for k in keys:
            rep = rep.withColumn(
                k, (F.col(k) + F.col("_r") * F.lit(strides[k])).cast(df.schema[k].dataType)
            )
        # Splittable layout: one giant row group per file caps every scan
        # at ONE task (parquet splits at row-group boundaries) — that
        # serialized the map side of the whole decade suite and silently
        # dominated several Spark-vs-DuckDB ratios. 32 files ≈ one split
        # per local core; both engines parallelize over them.
        rep.drop("_r").repartition(32).write.mode("overwrite").parquet(out)
        print(f"{t}: x{replicas} with offsets {strides}")
    spark.stop()


if __name__ == "__main__":
    main()
