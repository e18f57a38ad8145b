import sys, time, cProfile, pstats, io, glob, json
sys.path.insert(0, "/root/repo")
import numpy as np, pyarrow.parquet as pq, importlib
import pyarrow.compute as pc
E = importlib.import_module("clj_orc_spark.pipeline.encode")
from clj_orc_spark.kernels.dict_ import DictInt

files = sorted(glob.glob("/dev/shm/prof-decode-store/chunks/*/*.parquet"))
tbl = pq.read_table(files[0])
# find a token_values row
mask = pc.equal(tbl.column("col"), "token_values")
sub = tbl.filter(mask)
payload = sub.column("payload")[0].as_py()
meta = json.loads(sub.column("meta")[0].as_py())
print("codec:", meta["codec"], "n:", meta["n"], "payload MB:", len(payload)/1e6)
DictInt.decode(payload, meta)  # warm
t0=time.time(); arr = DictInt.decode(payload, meta); t1=time.time()
print(f"decode one chunk: {t1-t0:.3f}s for {len(arr)} vals")
pr = cProfile.Profile(); pr.enable()
DictInt.decode(payload, meta)
pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(20)
print(s.getvalue())
print(json.dumps(meta["codes"], default=str)[:1200])
