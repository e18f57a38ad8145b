"""Selector tests: the right codec wins on its target shape, estimates track
actual sizes, and the plain-fallback guard holds (SURVEY.md §7 step 3)."""

import numpy as np

from clj_orc_spark.kernels import StringCol, decode_any
from clj_orc_spark.selector import encode_column, select_int, select_str

RNG = np.random.default_rng(7)


def test_rle_wins_on_runs():
    arr = np.repeat(np.arange(50, dtype=np.int32), 1000)
    winner, ests = select_int(arr)
    assert winner == "rle", ests


def test_delta_wins_on_monotone_offsets():
    arr = np.cumsum(RNG.integers(1, 8192, 10000)).astype(np.int64)
    winner, ests = select_int(arr)
    assert winner == "delta", ests


def test_ranked_dict_wins_on_zipf_tokens():
    """Round 3: frequency-ranked dict (codes concentrate near 0, patched-FOR
    packs them near-entropy) beats direct patched-FOR on zipfian token ids;
    patched still beats flat-width among the direct family."""
    arr = (np.minimum(RNG.zipf(1.1, 100_000), 50_257) - 1).astype(np.int32)
    winner, ests = select_int(arr)
    assert winner == "dict_int", ests
    assert ests["dict_int"] < ests["patched_for"] < ests["for_bitpack"]


def test_dict_wins_on_low_card_strings():
    col = StringCol.from_list([b"web", b"code", b"books", b"wiki"] * 5000)
    winner, ests = select_str(col)
    assert winner == "dict_str", ests


def test_fsst_wins_on_prefix_heavy_ids():
    col = StringCol.from_list(
        [f"web-{i % 13:04d}-{i:08d}".encode() for i in range(20000)]
    )
    winner, ests = select_str(col)
    assert winner == "fsst", ests


def test_estimates_track_actual():
    """Estimated size for the winner must be within 2x of actual payload."""
    cases = [
        (np.repeat(np.arange(50, dtype=np.int32), 1000), "int"),
        (np.cumsum(RNG.integers(1, 100, 5000)).astype(np.int64), "int"),
        ((np.minimum(RNG.zipf(1.1, 50_000), 50_257) - 1).astype(np.int32), "int"),
        (StringCol.from_list([b"a", b"bb", b"a"] * 3000), "str"),
        (StringCol.from_list([f"src-{i:06d}".encode() for i in range(9000)]), "str"),
    ]
    for column, kind in cases:
        payload, meta, sel = encode_column(column, kind)
        est = sel["estimates"][sel["codec"]]
        actual = sel["actual_bytes"]
        assert actual <= est * 2 + 64 and est <= actual * 2 + 64, (sel, kind)


def test_encode_column_roundtrip_and_guard():
    # incompressible data: guard must keep us at ~plain size
    arr = RNG.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, 5000, dtype=np.int64)
    payload, meta, sel = encode_column(arr, "int")
    assert np.array_equal(decode_any(payload, meta), arr)
    assert len(payload) <= arr.nbytes

    col = StringCol.from_list([RNG.bytes(40) for _ in range(2000)])
    payload, meta, sel = encode_column(col, "str")
    out = decode_any(payload, meta)
    assert out.data == col.data and np.array_equal(out.offsets, col.offsets)
    assert len(payload) <= len(col.data) + 8 * col.n + 64


def test_speed_policy_prefers_direct_on_marginal_dict_win():
    """policy='speed': dict_int only wins with a >25% size margin over the
    best direct codec; zipf tokens (~35% margin) keep dict, near-uniform
    low-card data (marginal margin) falls back to the direct family."""
    # heavily-skewed low-card data: dict wins by a wide margin → kept
    skewed = RNG.choice(
        np.array([3, 70_001, 1_000_003], dtype=np.int32),
        size=100_000, p=[0.9, 0.09, 0.01],
    ).astype(np.int32)
    w, ests = select_int(skewed, policy="speed")
    assert w == "dict_int", ests

    uniform = RNG.integers(0, 4096, 100_000).astype(np.int32)
    w_size, e_size = select_int(uniform, policy="size")
    w_speed, e_speed = select_int(uniform, policy="speed")
    # uniform codes save nothing over direct packing: speed policy must not
    # pick dict, whatever size picked
    assert w_speed != "dict_int", e_speed
