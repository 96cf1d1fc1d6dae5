"""Duplication-level (K) sweep of the first-colliding-band claiming
boundary: at what clone-group size does claiming win/lose for the
minhash candidate join and for the simhash verify-then-dedup path?
Corpus: sf0.1 documents (5k base docs) replicated K times with
distinct ids, written once per K to /tmp/ksweep/K{K}."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from recommendation_translation_spark.session import get_spark
import pyspark.sql.functions as F

spark = get_spark(app_name="claiming_sweep")
base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
NB = base.count()

from recommendation_translation_spark.operators.dedup import (
    minhash_bands, minhash_bands_wide, band_collision_pairs, simhash,
)

def corpus(K):
    path = f"/tmp/ksweep/K{K}"
    if not os.path.isdir(path):
        reps = spark.range(K).select(F.col("id").alias("rep"))
        (base.crossJoin(reps)
             .select((F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text")
             .write.mode("overwrite").parquet(path))
    return spark.read.parquet(path)

def t(f):
    t0 = time.perf_counter(); n = f().count(); return round(time.perf_counter() - t0, 2), n

def minhash_distinct(df):
    st = minhash_bands(df, k=16, bands=8)
    a, b = st.alias("a"), st.alias("b")
    return (a.join(b, ["band", "band_hash"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
             .distinct())

def minhash_claim(df):
    return band_collision_pairs(minhash_bands_wide(df, k=16, bands=8), bands=8)

def simhash_distinct(df, bits=64, max_hamming=3):
    # the pre-rewrite shape: per-band join, hamming per collision, distinct
    m = max_hamming + 2
    baseb, rem = divmod(bits, m)
    widths = [baseb + 1] * rem + [baseb] * (m - rem)
    offsets = [sum(widths[:i]) for i in range(m)]
    blocks = [F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(F.lit((1 << widths[i]) - 1)) for i in range(m)]
    bands = []
    bid = 0
    for i in range(m):
        for j in range(i + 1, m):
            key = F.shiftleft(blocks[i], widths[j]).bitwiseOR(blocks[j]).cast("long")
            bands.append(F.struct(F.lit(bid).alias("band"), key.alias("key"))); bid += 1
    s = simhash(df, bits=bits).localCheckpoint()
    stacked = s.select("doc_id", "simhash", F.explode(F.array(*bands)).alias("b")).select("doc_id", "simhash", "b.band", "b.key")
    a, b = stacked.alias("a"), stacked.alias("b")
    return (a.join(b, ["band", "key"]).filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"),
                     F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"))
             .filter(F.col("hamming") <= max_hamming).distinct())

def simhash_claim(df, bits=64, max_hamming=3):
    from recommendation_translation_spark.operators.dedup import simhash_pairs
    return simhash_pairs(df, max_hamming=max_hamming, bits=bits)

spark.range(1_000_000).selectExpr("sum(id)").collect()
print("K base_docs total_docs | mh_distinct mh_claim | sh64_distinct sh64_claim (2 runs each, min)")
for K in [1, 2, 5, 10, 30]:
    df = corpus(K); n = df.count()
    row = [f"K={K} n={n}"]
    for name, f in [("mh_dist", lambda: minhash_distinct(df)), ("mh_claim", lambda: minhash_claim(df)),
                    ("sh_dist", lambda: simhash_distinct(df)), ("sh_claim", lambda: simhash_claim(df))]:
        t1, r1 = t(f); t2, r2 = t(f)
        assert r1 == r2
        row.append(f"{name}={min(t1,t2)} (rows={r1})")
    print(" | ".join(row), flush=True)
