import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow.parquet as pq
import importlib; E = importlib.import_module("clj_orc_spark.pipeline.encode")

src = "/tmp/clj-orc-spark-bench-500000/tokens.parquet"
md = pq.read_metadata(src)
print("row groups:", md.num_row_groups, "rows:", md.num_rows)
pf = pq.ParquetFile(src)
schema = E.DEFAULT_SCHEMA
cols = [n for n,_ in schema]

N_RG = 8  # profile 8 row groups
t_read = t_csum = t_enc = 0.0
col_time = {}
import clj_orc_spark.selector as S
orig = S.encode_column
def timed_encode_column(col, kind, cache=None, key=None, policy="size"):
    t0=time.time(); r = orig(col, kind, cache, key, policy)
    col_time[key] = col_time.get(key,0.0) + time.time()-t0
    return r
E.encode_column = timed_encode_column

cache = {}
seq = 0
chunk_bytes = E.DEFAULT_CHUNK_BYTES
nbytes_read = 0
for g in range(N_RG):
    t0=time.time(); tbl = pf.read_row_group(g, columns=cols); t_read += time.time()-t0
    nbytes_read += tbl.nbytes
    t0=time.time(); csum = E._row_weight_csum(tbl, schema); t_csum += time.time()-t0
    row=0
    while row < tbl.num_rows:
        base = int(csum[row-1]) if row else 0
        end = int(np.searchsorted(csum, base+chunk_bytes, side="right"))
        end = min(tbl.num_rows, max(row+1,end))
        t0=time.time()
        rows = E._encode_chunk_rows(tbl.slice(row,end-row), 0, seq, cache, "size", schema)
        t_enc += time.time()-t0
        seq+=1; row=end
total_rg = md.num_row_groups
sc = total_rg/N_RG
print(f"read: {t_read:.3f}s  csum: {t_csum:.3f}s  encode_chunks: {t_enc:.3f}s  (over {N_RG} rgs, {nbytes_read/1e6:.0f} MB arrow)")
print(f"extrapolated serial totals for {total_rg} rgs: read {t_read*sc:.1f}s csum {t_csum*sc:.1f}s enc {t_enc*sc:.1f}s")
print("per-column encode seconds:", {k: round(v,3) for k,v in sorted(col_time.items(), key=lambda x:-x[1])})
