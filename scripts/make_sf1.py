"""Generate a local sf1 slice (10× the sf0.1 bench scale) for the
exact-vs-approx scale measurements (VERDICT r6 directive #5).

Replicates sf0.1's fact tables 10× with shifted ENTITY keys — more
orders / users / documents at the same per-entity row counts, which is
how the real corpus grows (window partition sizes stay constant; only
cardinality scales). Row values are otherwise untouched so the value
distributions (and therefore percentile work) are realistic. Dimension
tables are identical views of the sf0.1 parquet.

Output: /tmp/sf1/{table}.parquet — NOT committed, regenerate on demand:
    python scripts/make_sf1.py [src_sf_dir] [out_dir]
Chain for higher scales (SF_COPIES defaults to 10):
    python scripts/make_sf1.py /tmp/sf1 /tmp/sf10   # 100x bench scale
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = int(os.environ.get("SF_COPIES", "10"))
SCALED = {
    # table -> columns to shift by i * (max+1) per replica
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
PASSTHROUGH = ["region", "nation", "customer", "supplier", "part", "embeddings"]


def main() -> None:
    import pyspark.sql.functions as F

    from collimate_spark.session import get_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    spark = get_session("make-sf1")

    for t in PASSTHROUGH:
        dst = os.path.join(out, f"{t}.parquet")
        srcp = os.path.join(src, f"{t}.parquet")
        if os.path.lexists(dst):
            if os.path.islink(dst):
                os.unlink(dst)
            else:
                shutil.rmtree(dst, ignore_errors=True)
        os.symlink(srcp, dst)

    for t, keys in SCALED.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        strides = {
            k: r[0] + 1 for k, r in zip(keys, [df.agg(F.max(k)).first() for k in keys])
        }
        parts = []
        for i in range(COPIES):
            p = df
            for k, stride in strides.items():
                p = p.withColumn(k, (F.col(k) + F.lit(i * stride)).cast(df.schema[k].dataType))
            parts.append(p)
        un = parts[0]
        for p in parts[1:]:
            un = un.unionByName(p)
        dst = os.path.join(out, f"{t}.parquet")
        un.repartition(32).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{t}: {n} rows -> {dst}")

    spark.stop()


if __name__ == "__main__":
    main()
