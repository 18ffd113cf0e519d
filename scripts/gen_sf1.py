"""Generate an sf1.0 dataset for SCALING measurements (r8 VERDICT item 4).

The driver ships sf{0.001,0.01,0.1}; every 100 TB claim in SCALING.md is a
plan-shape argument plus sf0.1 timings. This script manufactures one more
measured order of magnitude: a deterministic 10x scale-up of
/root/testdata/sf0.1 written to .scratch/sf1.0 (gitignored).

SCOPE: scaling measurement ONLY. Correctness oracles always run on the
driver's own sf0.01 tables — this synthetic tier is never used as an
oracle input, so it does not violate the "use the driver's testdata as
inputs" rule; it exists so bench numbers at 10x sf0.1 are measured, not
argued.

Construction (seed-free, fully deterministic — xxhash64-derived noise
only, per the repo's determinism playbook):

- region/nation: fixed dimensions, copied as-is (TPC-H semantics: these
  do not grow with SF).
- customer/supplier/part/orders/lineitem/events: 10 copies, every key
  column offset by copy * stride where stride = max_key + 1 per key
  family — the driver's keys are dense [0, n), so exact strides keep
  the scaled keys dense [0, 10n) (bench.py's point-lookup key
  generation assumes density), FK integrity holds within each copy,
  and non-key columns keep the sf0.1 value distributions
  (selectivities of the TPC-H predicates are preserved exactly).
- events: user_id/event_id strided; timestamps UNCHANGED, so 10x events
  land in the same time window (sessionize/window workloads see 10x
  density, which is what a bigger cluster tenant looks like).
- documents: doc_id strided; for copies 1..9 every 7th word is prefixed
  with a copy tag. This makes cross-copy texts NOT near-duplicates
  (k-shingle Jaccard vs the original ~0.2, far under the 0.7-0.8 dedup
  thresholds) so MinHash/LSH candidate volume grows linearly with SF
  instead of quadratically in the copy count; the near-dup pairs the
  driver planted WITHIN sf0.1 are preserved verbatim inside each copy,
  so dedup yield still scales 10x.
- embeddings: vec_id strided; copies 1..9 get per-element noise
  (xxhash64(vec_id, j) mapped to [-0.05, 0.05]) so vectors are distinct
  but the cluster structure (label field) survives for IVF/recall
  workloads.

Run:  python scripts/gen_sf1.py   (~1 min, writes ~170 MB)
"""

from __future__ import annotations


import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")
DST = os.environ.get(
    "SPARK_GRAFT_DST_SF",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scratch", "sf1.0"),
)
COPIES = int(os.environ.get("SPARK_GRAFT_COPIES", "10"))

# key column -> stride family; every column in a family shares one
# stride so FK joins stay intact across the copy offset.
KEY_FAMILIES = {
    "custkey": ["c_custkey", "o_custkey"],
    "orderkey": ["o_orderkey", "l_orderkey"],
    "partkey": ["p_partkey", "l_partkey"],
    "suppkey": ["s_suppkey", "l_suppkey"],
    "event": ["event_id"],
    "user": ["user_id"],
    "doc": ["doc_id"],
    "vec": ["vec_id"],
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FIXED_DIMS = {"region", "nation"}


def _strides(spark: SparkSession) -> dict[str, int]:
    """One exact stride (max_key + 1) per key family, from the observed
    max — the driver's keys are dense [0, n), so this keeps the scaled
    keys dense [0, COPIES*n)."""
    out: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        mx = 0
        for t in TABLES:
            path = f"{SRC}/{t}.parquet"
            df = spark.read.parquet(path)
            hit = [c for c in cols if c in df.columns]
            for c in hit:
                v = df.agg(F.max(F.col(c)).alias("m")).collect()[0].m
                mx = max(mx, int(v))
        out[fam] = mx + 1
    return out


def _offset_keys(df: DataFrame, copy: int, strides: dict[str, int]) -> DataFrame:
    for fam, cols in KEY_FAMILIES.items():
        for c in cols:
            if c in df.columns:
                df = df.withColumn(c, F.col(c) + F.lit(copy * strides[fam]))
    return df


def _perturb_documents(df: DataFrame, copy: int) -> DataFrame:
    if copy == 0:
        return df
    tag = F.lit(f"c{copy}q")
    words = F.split(F.col("text"), " ")
    salted = F.transform(
        words,
        lambda w, i: F.when(i % 7 == 0, F.concat(tag, w)).otherwise(w),
    )
    df = df.withColumn("text", F.array_join(salted, " "))
    return df.withColumn("n_chars", F.length("text"))


def _perturb_embeddings(df: DataFrame, copy: int) -> DataFrame:
    if copy == 0:
        return df
    vec = F.col("embedding")
    noisy = F.transform(
        vec,
        lambda x, j: (
            x
            + (
                F.xxhash64(F.col("vec_id"), j, F.lit(copy)) % 1000
            ).cast("float")
            / 10000.0
            - 0.05
        ).cast("float"),
    )
    return df.withColumn("embedding", noisy)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("gen_sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    os.makedirs(DST, exist_ok=True)
    strides = _strides(spark)
    print("strides:", strides, flush=True)
    for t in TABLES:
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in FIXED_DIMS:
            out = src
        else:
            parts = []
            for i in range(COPIES):
                c = _offset_keys(src, i, strides)
                if t == "documents":
                    c = _perturb_documents(c, i)
                elif t == "embeddings":
                    c = _perturb_embeddings(c, i)
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        n_files = 1 if t in FIXED_DIMS else 16
        out.repartition(n_files).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"{t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows",
              flush=True)
    print("DONE", DST)


if __name__ == "__main__":
    sys.exit(main())
