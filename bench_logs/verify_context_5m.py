import sys, os, time, shutil
sys.path.insert(0, "/root/repo")
from clj_orc_spark.session import get_spark
from clj_orc_spark.pipeline import decode, encode, verify_digest
from pyspark.sql import functions as F
spark = get_spark(master="local[32]", app_name="verify-ctx-5m")
spark.sparkContext.setLogLevel("ERROR")
src = "/tmp/clj-orc-spark-bench-5000000/tokens.parquet"
out = "/dev/shm/verify-ctx-5m-store"
shutil.rmtree(out, ignore_errors=True)
t0=time.time(); encode(spark, src, out, resume=False); print(f"encode {time.time()-t0:.1f}s", flush=True)
t0=time.time(); decode(spark, out).write.format("noop").mode("overwrite").save(); print(f"decode_noop {time.time()-t0:.1f}s", flush=True)
t0=time.time(); n=decode(spark, out).count(); print(f"decode_count {time.time()-t0:.1f}s n={n}", flush=True)
h = F.xxhash64("doc_id", "tokens", "n_tok", "source")
def leg(df):
    return df.select(h.alias("h")).agg(F.count(F.lit(1)), F.expr("bit_xor(h)"),
        F.sum(F.col("h").cast("decimal(38,0)"))).collect()[0]
t0=time.time(); leg(spark.read.parquet(src)); print(f"src_leg {time.time()-t0:.1f}s", flush=True)
t0=time.time(); leg(decode(spark, out)); print(f"decoded_leg {time.time()-t0:.1f}s", flush=True)
t0=time.time(); v=verify_digest(spark.read.parquet(src), decode(spark, out)); print(f"union {time.time()-t0:.1f}s bit={v['bit_identical']}", flush=True)
t0=time.time(); v=verify_digest(spark.read.parquet(src), decode(spark, out)); print(f"union2 {time.time()-t0:.1f}s", flush=True)
spark.stop()
