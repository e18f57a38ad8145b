import sys, os, time, shutil, importlib
sys.path.insert(0, "/root/repo")
from clj_orc_spark.session import get_spark
from clj_orc_spark.pipeline import decode, encode, verify_digest
from pyspark.sql import functions as F
spark = get_spark(master="local[32]", app_name="phase-verify")
spark.sparkContext.setLogLevel("ERROR")
src = "/tmp/clj-orc-spark-bench-500000/tokens.parquet"
out = "/dev/shm/phase-verify-store"
if not os.path.isdir(out+"/manifest"):
    shutil.rmtree(out, ignore_errors=True)
    encode(spark, src, out, resume=False)

def digest(df):
    h = F.xxhash64("doc_id", "tokens", "n_tok", "source")
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"), F.expr("bit_xor(h)").alias("hxor"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum")).collect()[0]

for rep in range(3):
    t0=time.time(); d0 = decode(spark, out); t_plan = time.time()-t0   # driver-side plan only
    t0=time.time(); n = d0.count(); t_count = time.time()-t0           # bench "decode" phase job
    t0=time.time(); s = digest(spark.read.parquet(src)); t_src = time.time()-t0
    t0=time.time(); d = digest(decode(spark, out)); t_dec = time.time()-t0
    print(f"rep{rep}: plan {t_plan:.2f}s count(decode job) {t_count:.2f}s src_digest {t_src:.2f}s decoded_digest {t_dec:.2f}s", flush=True)
spark.stop()
