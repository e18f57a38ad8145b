"""Deterministic synthetic token-table generator (FIXTURES.md F2).

The engine's primary input per BASELINE.json input_hint:
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``.
Mirrors the reference's fixture-writer-with-generator-fns pattern
(`test/orc/fixture.clj:38-58`, deterministic per-column generators at
`test/orc/read_test.clj:26-27`) — seeded, reproducible, parameterized by size.

Generation is **block-deterministic**: data is produced in fixed 8192-row
blocks, each seeded by ``(seed, block_idx)``, so the same rows come out
whether generated locally (tests) or distributed via ``spark.range`` +
``mapInArrow`` (scale path) — any 10^12-row extension just means more blocks.

Also writes the **reference ORC copy** (`pyarrow.orc`, default options —
the stand-in for the orc-core 1.5.5 writer the reference drives,
`project.clj:9`, `test/orc/fixture.clj:25-27`) whose byte size is the
compression bar the engine must beat.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

BLOCK_ROWS = 8192
VOCAB = 50_257
SOURCES = np.array(["web", "code", "books", "wiki"])
SOURCE_WEIGHTS = np.array([0.70, 0.15, 0.10, 0.05])
NTOK_MU, NTOK_SIGMA = 6.0, 1.0
NTOK_MIN, NTOK_MAX = 1, 8192

TOKEN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.field("element", pa.int32(), nullable=False)), nullable=False),
        pa.field("n_tok", pa.int32(), nullable=False),
        pa.field("source", pa.string(), nullable=False),
    ]
)


def gen_block(block_idx: int, n_rows: int, seed: int = 42) -> pa.RecordBatch:
    """Generate one deterministic block of the token table."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, block_idx]))
    row0 = block_idx * BLOCK_ROWS

    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_WEIGHTS)
    source = SOURCES[src_idx]

    n_tok = np.clip(
        np.rint(rng.lognormal(NTOK_MU, NTOK_SIGMA, n_rows)), NTOK_MIN, NTOK_MAX
    ).astype(np.int32)

    total = int(n_tok.sum())
    # zipf(1.1) CLIPPED to vocab (never modulo — modulo flattens the skew)
    flat = np.minimum(rng.zipf(1.1, total), VOCAB).astype(np.int32) - 1

    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, type=pa.int32())
    ).cast(TOKEN_SCHEMA.field("tokens").type)

    shard = rng.integers(0, 16, n_rows)
    seq = row0 + np.arange(n_rows)
    doc_id = pa.array(
        [f"{s}-{sh:04d}-{q:08d}" for s, sh, q in zip(source, shard, seq)],
        type=pa.string(),
    )

    return pa.RecordBatch.from_arrays(
        [doc_id, tokens, pa.array(n_tok, type=pa.int32()), pa.array(source, type=pa.string())],
        schema=TOKEN_SCHEMA,
    )


def gen_table(n_rows: int, seed: int = 42) -> pa.Table:
    """Materialize ``n_rows`` of the token table (driver-side, for tests)."""
    batches = []
    block = 0
    remaining = n_rows
    while remaining > 0:
        take = min(BLOCK_ROWS, remaining)
        batches.append(gen_block(block, take, seed))
        block += 1
        remaining -= take
    if not batches:
        batches = [gen_block(0, 0, seed)]
    return pa.Table.from_batches(batches, schema=TOKEN_SCHEMA)


def write_token_table(
    out_dir: str, n_rows: int, seed: int = 42, with_orc_reference: bool = True
) -> dict:
    """Write parquet input + reference ORC copy; return paths and byte sizes.

    Cached: if the directory already holds a table of the same shape, reuse it
    (datagen must not pollute encode benchmarks).
    """
    import pyarrow.orc as paorc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pq_path = os.path.join(out_dir, "tokens.parquet")
    orc_path = os.path.join(out_dir, "tokens.orc")
    row_group_rows = 8192
    marker = os.path.join(out_dir, f".gen-{n_rows}-{seed}-rg{row_group_rows}")
    if not os.path.exists(marker):
        table = gen_table(n_rows, seed)
        # bounded row groups → splittable scan (a single giant row group
        # collapses read parallelism to 1 task; 8192-row groups ≈ 20 MB raw,
        # enough granularity to feed every core of the fused pyarrow scan)
        pq.write_table(table, pq_path, row_group_size=row_group_rows)
        if with_orc_reference:
            paorc.write_table(table, orc_path)  # defaults — the size bar
        open(marker, "w").close()
    return {
        "parquet": pq_path,
        "orc": orc_path if os.path.exists(orc_path) else None,
        "parquet_bytes": os.path.getsize(pq_path),
        "orc_bytes": os.path.getsize(orc_path) if os.path.exists(orc_path) else None,
        "n_rows": n_rows,
    }


def spark_gen(spark, n_rows: int, seed: int = 42, n_partitions: int | None = None):
    """Distributed token-table generation: ``spark.range`` over block ids →
    ``mapInArrow`` → same bytes as :func:`gen_table` (block determinism).

    This is the 10^12-sequence scale path: no driver materialization, one
    block per ~8192 rows, generation parallelism = cluster width.
    """
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    n_blocks = max(1, -(-n_rows // BLOCK_ROWS))
    if n_partitions is None:
        n_partitions = min(n_blocks, spark.sparkContext.defaultParallelism * 2)

    def gen_partition(it):
        for batch in it:
            for bid in batch.column(0).to_pylist():
                take = min(BLOCK_ROWS, n_rows - bid * BLOCK_ROWS)
                if take > 0:
                    yield gen_block(bid, take, seed)

    schema = StructType(
        [
            StructField("doc_id", StringType(), False),
            StructField("tokens", ArrayType(IntegerType(), False), False),
            StructField("n_tok", IntegerType(), False),
            StructField("source", StringType(), False),
        ]
    )
    return (
        spark.range(0, n_blocks, numPartitions=n_partitions)
        .mapInArrow(gen_partition, schema)
    )
