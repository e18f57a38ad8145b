import sys, time
sys.path.insert(0, "/root/repo")
from clj_orc_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[32]", app_name="srcdig")
spark.sparkContext.setLogLevel("ERROR")
src = "/tmp/clj-orc-spark-bench-500000/tokens.parquet"
df = spark.read.parquet(src)
for rep in range(3):
    t0=time.time(); df.write.format("noop").mode("overwrite").save(); t_noop=time.time()-t0
    t0=time.time()
    h = F.xxhash64("doc_id","tokens","n_tok","source")
    df.select(h.alias("h")).write.format("noop").mode("overwrite").save()
    t_hash_noop=time.time()-t0
    t0=time.time()
    df.select(h.alias("h")).agg(F.count(F.lit(1)), F.expr("bit_xor(h)"), F.sum(F.col("h").cast("decimal(38,0)"))).collect()
    t_agg=time.time()-t0
    print(f"rep{rep}: scan_noop {t_noop:.2f}s  scan+hash_noop {t_hash_noop:.2f}s  full_digest {t_agg:.2f}s", flush=True)
spark.stop()
