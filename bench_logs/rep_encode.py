import sys, os, time, shutil
sys.path.insert(0, "/root/repo")
from clj_orc_spark.session import get_spark
from clj_orc_spark.pipeline import encode
spark = get_spark(master="local[32]", app_name="rep-encode")
spark.sparkContext.setLogLevel("ERROR")
src = "/tmp/clj-orc-spark-bench-500000/tokens.parquet"
for i in range(5):
    out = f"/dev/shm/rep-encode-{i}"
    shutil.rmtree(out, ignore_errors=True)
    la0 = open("/proc/loadavg").read().split()[0]
    t0 = time.time()
    encode(spark, src, out, resume=False)
    w = time.time()-t0
    la1 = open("/proc/loadavg").read().split()[0]
    print(f"rep {i}: {w:.2f}s  loadavg {la0}->{la1}", flush=True)
    shutil.rmtree(out, ignore_errors=True)
spark.stop()
