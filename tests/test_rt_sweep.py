"""Range-tombstone application tiers (compact._apply_rts) must be EXACTLY
equivalent to the reference per-cell rule:

    keep cell x unless exists rt r with
        r.min <= x.sk AND x.sk <= r.max AND r.ts >= x.ts

(reference semantics: CassSSTableReducer.java:142-153's streaming
tracker). The O(C x R) probe tier IS that rule verbatim; the skyline +
binary-search tier (for RT-heavy partitions) is compared against it here
on adversarial random inputs: nested / overlapping / identical / point
ranges, inclusive-bound collisions, and ts ties."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aegisthus_spark.compact import _apply_rts, _rt_probe

_SCHEMA = (
    "i int, "
    "cells array<struct<sk: binary, ts: long, value: binary>>, "
    "rts array<struct<min_sk: binary, max_sk: binary, ts: long>>"
)


def _both_tiers(spark, rows):
    """Returns collected rows with .probe and .sky columns."""
    df = spark.createDataFrame(rows, _SCHEMA)
    df = df.withColumn(
        "probe", F.expr(_rt_probe("cells", "rts", "min_sk", "max_sk"))
    )
    # probe_max=0 forces EVERY non-empty-RT row onto the skyline tier
    df = _apply_rts(df, "cells", "rts", "min_sk", "max_sk", "sky", probe_max=0)
    return df.collect()


def _rand_partitions(seed: int, n: int):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        nc, nr = rng.randint(0, 14), rng.randint(0, 10)
        # tiny key alphabet + tiny ts range -> dense collisions on bounds
        # and deletion-time ties
        cells = sorted(
            (bytes([rng.randint(0, 5)]) + bytes([rng.randint(0, 2)]) * rng.randint(0, 1),
             rng.randint(0, 6))
            for _ in range(nc)
        )
        rts = []
        for _ in range(nr):
            a = bytes([rng.randint(0, 5)])
            b = bytes([rng.randint(0, 5)])
            lo, hi = min(a, b), max(a, b)
            rts.append((lo, hi, rng.randint(0, 6)))
        out.append(
            (i,
             [(sk, ts, b"v%d" % k) for k, (sk, ts) in enumerate(cells)],
             rts)
        )
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_skyline_equals_probe_on_random_partitions(spark, seed):
    rows = _rand_partitions(seed, 120)
    for r in _both_tiers(spark, rows):
        assert r.sky == r.probe, (
            f"partition {r.i}: skyline {r.sky} != probe {r.probe}; "
            f"inputs {rows[r.i]}"
        )


def test_skyline_adversarial_shapes(spark):
    """Hand-picked shapes: nested ts-increasing-inward (max antichain),
    identical ranges with different ts, point RTs on cell keys, RT start
    == cell key (inclusive min), RT end == cell key (inclusive max),
    dominance-skipped RT whose end event must still expire cleanly."""
    def c(sk, ts):
        return (sk, ts, b"v")

    parts = [
        # nested, ts increasing inward: antichain holds all three
        (0,
         [c(b"\x02", 0), c(b"\x03", 2), c(b"\x04", 9)],
         [(b"\x00", b"\x09", 1), (b"\x01", b"\x05", 2), (b"\x02", b"\x04", 3)]),
        # identical ranges, different ts (dominance collapses to max)
        (1, [c(b"\x01", 1), c(b"\x01", 5)],
         [(b"\x00", b"\x02", 3), (b"\x00", b"\x02", 2), (b"\x00", b"\x02", 1)]),
        # point RT exactly on the cell key, ts tie (>= covers)
        (2, [c(b"\x01", 4)], [(b"\x01", b"\x01", 4)]),
        # RT start == cell key (inclusive min)
        (3, [c(b"\x02", 1)], [(b"\x02", b"\x05", 9)]),
        # RT end == cell key (inclusive max)
        (4, [c(b"\x05", 1)], [(b"\x01", b"\x05", 9)]),
        # cell just past the RT end survives
        (5, [c(b"\x06", 1)], [(b"\x01", b"\x05", 9)]),
        # empties
        (6, [], [(b"\x00", b"\xff", 9)]),
        (7, [c(b"\x01", 1)], []),
        (8, [], []),
        # older RT does not cover a newer cell
        (9, [c(b"\x01", 5)], [(b"\x00", b"\x02", 4)]),
        # dominance-skipped inner RT (lower ts, smaller range): cells
        # after the DOMINATOR's end must not see a stale active entry
        (10, [c(b"\x02", 1), c(b"\x05", 1)],
         [(b"\x00", b"\x04", 9), (b"\x01", b"\x03", 1)]),
        # gap between disjoint RTs: the end boundary must reset max ts
        (11, [c(b"\x02", 1), c(b"\x04", 1), c(b"\x06", 1)],
         [(b"\x01", b"\x02", 9), (b"\x05", b"\x07", 9)]),
    ]
    got = _both_tiers(spark, parts)
    for r in got:
        assert r.sky == r.probe, f"partition {r.i}"
    by_i = {r.i: r.sky for r in got}
    # spot-check absolute semantics, not just probe agreement
    assert [bytes(x.sk) for x in by_i[0]] == [b"\x04"]  # ts 9 survives
    assert [x.ts for x in by_i[1]] == [5]
    assert by_i[2] == []
    assert by_i[3] == []
    assert by_i[4] == []
    assert len(by_i[5]) == 1
    assert len(by_i[9]) == 1
    assert [bytes(x.sk) for x in by_i[10]] == [b"\x05"]
    assert [bytes(x.sk) for x in by_i[11]] == [b"\x04"]


def test_skyline_preserves_cell_order_for_lww(spark):
    """Survivors must keep the input's sorted order — LWW downstream
    keeps the LAST of each sk group."""
    rows = [(0,
             [(b"\x01", 1, b"a"), (b"\x01", 2, b"b"), (b"\x02", 1, b"c"),
              (b"\x02", 3, b"d"), (b"\x03", 1, b"e")],
             [(b"\x02", b"\x02", 2)])]
    got = _both_tiers(spark, rows)[0].sky
    assert [(bytes(x.sk), x.ts) for x in got] == [
        (b"\x01", 1), (b"\x01", 2), (b"\x02", 3), (b"\x03", 1)
    ]


_key = st.binary(min_size=1, max_size=2).map(lambda b: bytes([b[0] % 8]) + b[1:])


@settings(max_examples=20, deadline=None)
@given(
    cells=st.lists(st.tuples(_key, st.integers(0, 5)), max_size=10),
    rts=st.lists(st.tuples(_key, _key, st.integers(0, 5)), max_size=8),
)
def test_skyline_equals_probe_hypothesis(spark, cells, rts):
    """Fresh-seed fuzz every run over a tiny key/ts alphabet (dense
    bound/tie collisions) — the two tiers must agree on every shape
    hypothesis invents."""
    rows = [(0,
             [(sk, ts, b"v%d" % i) for i, (sk, ts) in enumerate(sorted(cells))],
             [(min(a, b), max(a, b), ts) for a, b, ts in rts])]
    for r in _both_tiers(spark, rows):
        assert r.sky == r.probe, rows


def test_binary_search_depth_covers_admitted_segments():
    """Review-caught off-by-one: _RT_BS_STEPS halvings converge only for
    fewer than 2^steps segments, and each admitted RT contributes two
    skyline segments — the dispatcher bound must keep 2*R strictly under
    the search's capacity."""
    from aegisthus_spark.compact import _RT_BS_STEPS, _RT_SKYLINE_MAX

    assert 2 * _RT_SKYLINE_MAX < (1 << _RT_BS_STEPS)


def test_default_dispatch_uses_probe_for_few_rts(spark):
    """With the default threshold, a 1000-RT partition takes the skyline
    tier and a 3-RT partition the probe tier — both produce the rule's
    answer (sanity via the probe oracle on the big one)."""
    rng = random.Random(5)
    cells = sorted(
        (b"k%06d" % rng.randint(0, 4000), rng.randint(0, 6))
        for _ in range(500)
    )
    big_rts = []
    for _ in range(1000):
        a, b = rng.randint(0, 4000), rng.randint(0, 4000)
        lo, hi = min(a, b), max(a, b)
        big_rts.append((b"k%06d" % lo, b"k%06d" % hi, rng.randint(0, 6)))
    rows = [
        (0, [(sk, ts, b"v") for sk, ts in cells], big_rts),
        (1, [(sk, ts, b"v") for sk, ts in cells], big_rts[:3]),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    df = df.withColumn(
        "probe", F.expr(_rt_probe("cells", "rts", "min_sk", "max_sk"))
    )
    df = _apply_rts(df, "cells", "rts", "min_sk", "max_sk", "out")
    for r in df.collect():
        assert r.out == r.probe, f"partition {r.i}"
