import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow as pa, pyarrow.parquet as pq, importlib, glob
D = importlib.import_module("clj_orc_spark.pipeline.decode")
E = importlib.import_module("clj_orc_spark.pipeline.encode")
from clj_orc_spark.kernels import crc32, decode_any

# need an encoded store: encode a few rowgroups serially first
import shutil
out="/dev/shm/prof-decode-store"
if not glob.glob(out+"/chunks/*/*.parquet"):
    shutil.rmtree(out, ignore_errors=True)
    from clj_orc_spark.session import get_spark
    spark = get_spark(master="local[8]", app_name="prof-enc")
    spark.sparkContext.setLogLevel("ERROR")
    E.encode(spark, "/tmp/clj-orc-spark-bench-500000/tokens.parquet", out, resume=False)
    spark.stop()

files = sorted(glob.glob(out+"/chunks/*/*.parquet"))
print("chunk files:", len(files))
schema = E.DEFAULT_SCHEMA
t_read=t_group=t_dec=0.0
import pyarrow.compute as pc
kern_time={}
import clj_orc_spark.kernels as K
odec = K.decode_any
def timed_decode_any(payload, meta):
    t0=time.time(); r=odec(payload, meta)
    kern_time[meta["codec"]] = kern_time.get(meta["codec"],0.0)+time.time()-t0
    return r
D.decode_any = timed_decode_any
rows_total=0
N = min(len(files), 16)
for f in files[:N]:
    t0=time.time(); tbl = pq.read_table(f); t_read += time.time()-t0
    t0=time.time()
    ids = np.unique(tbl.column("chunk_id").to_numpy())
    groups=[tbl.filter(pc.equal(tbl.column("chunk_id"), cid)) for cid in ids]
    t_group += time.time()-t0
    for g in groups:
        t0=time.time()
        res = D.decode_chunk_table(g, None, schema)
        rows_total += res.num_rows
        t_dec += time.time()-t0
sc = len(files)/N
print(f"rows decoded: {rows_total} over {N}/{len(files)} files")
print(f"read {t_read:.2f}s group {t_group:.2f}s decode {t_dec:.2f}s -> extrapolated read {t_read*sc:.1f} group {t_group*sc:.1f} decode {t_dec*sc:.1f}")
print("kernel decode seconds:", {k: round(v*sc,2) for k,v in sorted(kern_time.items(), key=lambda x:-x[1])})
