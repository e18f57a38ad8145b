import sys, os, time, shutil
sys.path.insert(0, "/root/repo")
from clj_orc_spark.session import get_spark
from clj_orc_spark.pipeline import decode, encode, verify_digest
from pyspark.sql import functions as F
spark = get_spark(master="local[32]", app_name="ab-verify-5m")
spark.sparkContext.setLogLevel("ERROR")
src = "/tmp/clj-orc-spark-bench-5000000/tokens.parquet"
out = "/dev/shm/ab-verify-5m-store"
if not os.path.isdir(out+"/manifest"):
    shutil.rmtree(out, ignore_errors=True)
    encode(spark, src, out, resume=False)

h = F.xxhash64("doc_id", "tokens", "n_tok", "source")
def old_digest(df):
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("cnt"), F.expr("bit_xor(h)").alias("hxor"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("hsum")).collect()[0]

for rep in range(2):
    t0=time.time(); s = old_digest(spark.read.parquet(src)); t_src = time.time()-t0
    t0=time.time(); d = old_digest(decode(spark, out)); t_dec = time.time()-t0
    t0=time.time(); v = verify_digest(spark.read.parquet(src), decode(spark, out)); t_union = time.time()-t0
    print(f"rep{rep}: src_digest {t_src:.1f}s decoded_digest {t_dec:.1f}s seq_total {t_src+t_dec:.1f}s union {t_union:.1f}s bit={v['bit_identical']}", flush=True)
spark.stop()
