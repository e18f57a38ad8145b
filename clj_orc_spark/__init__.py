"""clj_orc_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch rebuild of the columnar encode/decode core that the reference
(nfcharles/clj-orc) delegates to Apache orc-core 1.5.5 (reference
`project.clj:9`), re-imagined Spark-first:

* pure-numpy codec kernels (dict, RLE, bit-pack, frame-of-reference delta,
  patched-base, FSST for strings) — the analog of the reference's type-keyed
  deserializer dispatch table (`src/orc/col.clj:155-174`), but vectorized
  whole-column instead of per-cell interpreted dispatch
  (`src/orc/core.clj:34-43`);
* a per-chunk codec auto-selector (the explicit version of ORC's
  dictionary-vs-direct threshold decision);
* a Spark `mapInArrow` encode pipeline producing encoded chunk rows plus a
  codec-manifest sidecar (the analog of the reference's stream metadata +
  header record, `src/orc/read.clj:89,93`), with byte-budget chunk flushing
  modeled on the reference's JSON chunker (`src/orc/json.clj:80-91`);
* a decode pipeline + bit-identity verifier reproducing the reference's
  round-trip fixture semantics (`test/orc/fixture.clj:38-58`,
  `test/orc/read_test.clj:33-39`).
"""

__version__ = "0.1.0"
