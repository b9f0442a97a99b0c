"""Synthesize build/sf1: a 10x replica of /root/testdata/sf0.1 for the
round-5 bench scale point (round-4 verdict #6 — make fixed-overhead
claims measurable and surface any hidden superlinear query).

Method: each table is unioned 10 times with CONSISTENT key offsets
(replica i shifts every key family by i * (max_key + 1)), so join
cardinalities scale linearly like a real 10x corpus would:
  - events: event_id / user_id offset (ts kept — hourly distributions
    unchanged, conversations multiply)
  - documents: doc_id offset; replica i>0 appends a ' zz<i>' token so
    replicas are NEAR-duplicates, not byte-duplicates (stresses the
    LSH path realistically)
  - embeddings: doc_id offset, vectors kept
  - customer/orders/lineitem: custkey/orderkey offsets kept in sync so
    q3's join fan-out scales linearly; part/supplier offsets likewise
  - region/nation: copied as-is (dimension semantics, q-set here
    never aggregates them per-row)

Deterministic (pure column arithmetic, no RNG). Writes are one-shot;
rerun deletes and regenerates. Usage:
    python tools/make_sf1.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def main(out_dir: str = "build/sf1", replicas: int = 10) -> None:
    from pyspark.sql import functions as F

    from mms_rdf_spark.session import get_spark

    spark = get_spark("make-sf1", cores=16)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def replicate(name: str, offsets: dict[str, int],
                  mutate=None) -> None:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(replicas):
            part = df
            for col, base in offsets.items():
                part = part.withColumn(
                    col, (F.col(col) + F.lit(i * base))
                    .cast(df.schema[col].dataType))
            if mutate is not None:
                part = mutate(part, i)
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: {df.count()} -> {out.count()} rows", flush=True)

    def key_base(name: str, col: str) -> int:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        return int(df.agg(F.max(col)).first()[0]) + 1

    ev_e = key_base("events", "event_id")
    ev_u = key_base("events", "user_id")
    doc = key_base("documents", "doc_id")
    cust = key_base("customer", "c_custkey")
    okey = key_base("orders", "o_orderkey")
    part_k = key_base("part", "p_partkey")
    supp_k = key_base("supplier", "s_suppkey")

    replicate("events", {"event_id": ev_e, "user_id": ev_u})

    def doc_mutate(df, i):
        if i == 0:
            return df
        return df.withColumn(
            "text", F.concat(F.coalesce(F.col("text"), F.lit("")),
                             F.lit(f" zz{i}")))
    replicate("documents", {"doc_id": doc}, mutate=doc_mutate)
    replicate("embeddings", {"vec_id": key_base("embeddings", "vec_id")})
    replicate("customer", {"c_custkey": cust})
    replicate("orders", {"o_orderkey": okey, "o_custkey": cust})
    replicate("lineitem", {"l_orderkey": okey, "l_partkey": part_k,
                           "l_suppkey": supp_k})
    replicate("part", {"p_partkey": part_k})
    replicate("supplier", {"s_suppkey": supp_k})
    for dim in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write \
            .mode("overwrite").parquet(f"{out_dir}/{dim}.parquet")
        print(f"{dim}: copied", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:3] if len(sys.argv) > 1 else ()))
