import sys, os, time, shutil, importlib
sys.path.insert(0, "/root/repo")
from clj_orc_spark.session import get_spark
E = importlib.import_module("clj_orc_spark.pipeline.encode")
spark = get_spark(master="local[32]", app_name="phase-encode")
spark.sparkContext.setLogLevel("ERROR")
src = "/tmp/clj-orc-spark-bench-500000/tokens.parquet"

# monkeypatch timers
t = {}
_wc, _cm = E._write_chunks, E._commit_manifest
def wc(encoded, chunks_dir):
    t0=time.time(); _wc(encoded, chunks_dir); t["write_chunks"]=time.time()-t0
def cm(spark, out_dir, chunks_dir, pending, n_phys):
    t0=time.time(); _cm(spark, out_dir, chunks_dir, pending, n_phys=n_phys); t["commit_manifest"]=time.time()-t0
E._write_chunks = wc
E._commit_manifest = cm
_lcp = E._load_or_compute_rowgroup_plan
def lcp(*a, **k):
    t0=time.time(); r=_lcp(*a,**k); t["plan"]=time.time()-t0; return r
E._load_or_compute_rowgroup_plan = lcp

for i in range(3):
    out = f"/dev/shm/phase-encode-{i}"
    shutil.rmtree(out, ignore_errors=True)
    t.clear()
    t0=time.time()
    E.encode(spark, src, out, resume=False)
    total=time.time()-t0
    print(f"rep {i}: total {total:.2f}s  phases {dict((k,round(v,2)) for k,v in t.items())}  residual {total-sum(t.values()):.2f}s", flush=True)
    shutil.rmtree(out, ignore_errors=True)
spark.stop()
