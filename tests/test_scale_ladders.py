"""Scale-rung correctness for the adaptive-granularity ladders.

Four candidate-generating operators pick their index granularity from a
corpus-size ladder (SemDeDup cells, SAX word length, pHash width,
cosine sign-bucket width). The DuckDB oracle only ever exercises the
FLOOR rung (driver fixtures are below every threshold), so the upper
rungs need their own correctness signal. The invariant that holds at
every rung: an EXACT duplicate collides in every band/bucket/cell at any
granularity (hamming 0 / identical word / identical bucket), so planted
exact dups must always be found. Multiprobe additionally guarantees
hamming-1 bucket misses are recovered.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from log_agent_spark.operators.dedup import embedding_near_dups
from log_agent_spark.operators.multimodal import (
    phash_neardup_pairs,
    phash_table,
)


def test_phash_wide_rung_finds_exact_dups(spark):
    """At the 32-bit rung an exact payload copy hashes identically
    (hamming 0 <= 3), so every planted clone pair must surface."""
    base = [(i, f"payload text with entropy {i * 37 % 101} " * 9) for i in range(40)]
    clones = [(100 + i, p) for i, p in base[:10]]
    df = spark.createDataFrame(base + clones, ["id", "p"])
    hashed = phash_table(df, "id", "p", blocks=32)
    pairs = {
        (r.media_a, r.media_b)
        for r in phash_neardup_pairs(hashed, blocks=32).collect()
    }
    for i in range(10):
        assert (i, 100 + i) in pairs, f"clone pair ({i}, {100 + i}) missing"


def test_cosine_upper_rung_multiprobe_recovers_flipped_sign(spark):
    """Above the 4,000-row floor the bucket widens to 9 sign bits and the
    LHS probes hamming-1 neighbors: a near-dup whose ONE borderline
    component flips sign (bucket differs in exactly one bit) must still be
    found; an exact dup (identical bucket) must always be found."""
    dim = 16
    n_filler = 4_100  # > ladder floor of 4,000 -> 9-bit rung + multiprobe

    def vec(seed: int) -> list[float]:
        # hash-spread pseudo-random in [-1, 1); the modulus must be a
        # prime > n_filler so the generator's period exceeds the seed
        # range (a 2,000 modulus made seeds 2,000 apart bit-identical —
        # review r7b) — distinct seeds give distinct, mutually-far vectors
        return [
            (((seed * 2_654_435_761 + j * 40_503) % 8_191) / 4_095.5) - 1.0
            for j in range(dim)
        ]

    base = vec(1)
    base[2] = 0.0005  # borderline-positive component
    exact = list(base)  # true copy AFTER all mutations: cosine exactly 1
    flipped = list(base)
    flipped[2] = -0.0005  # sign flip on the borderline dim: bucket differs
    # in exactly bit 2, cosine still ~1
    rows = [(0, base), (1, exact), (2, flipped)]
    rows += [(10 + i, vec(i + 5)) for i in range(n_filler)]
    df = spark.createDataFrame(rows, ["vec_id", "emb"])
    found = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dups(df, threshold=0.999).collect()
    }
    assert (0, 1) in found, "exact dup lost at the upper rung"
    assert (0, 2) in found, "hamming-1 bucket split not recovered by multiprobe"


def test_sax_fine_rung_keeps_clone_pairs(spark, tmp_path):
    """Above 2,000 users the SAX word lengthens to 14 segments; users with
    IDENTICAL series still share any-length words (distance 0) and must
    dominate the top-k."""
    import datetime

    n_users = 2_200  # > ladder floor of 2,000 -> seg_len 2 rung

    def day_count(u: int, d: int) -> int:
        count = 1 + ((u % 50) * (d + 3)) % 7
        if (d + u % 50) % 4 == 0:
            count += 5
        return count

    rows = []
    anchor = datetime.datetime(2024, 1, 1)
    for u in range(n_users):
        # series shape is a function of u mod 50 (some residues also
        # coincide — e.g. multiples of both 7 and 4 — which is fine: the
        # assertion below checks true series equality, not the residue)
        for d in range(28):
            for k in range(day_count(u, d)):
                rows.append((u, anchor + datetime.timedelta(days=d, seconds=k)))
    events = spark.createDataFrame(rows, ["user_id", "ts"])
    src = str(tmp_path / "sax_events")
    events.write.parquet(f"{src}/events.parquet")

    from log_agent_spark.operators.timeseries import q_sax_similarity

    out = q_sax_similarity(spark, src).collect()
    assert len(out) == 10
    # every top-10 pair must be a true clone pair (identical 28-day count
    # vector, distance 0) — the fine rung cannot rank a non-clone above
    # the thousands of available clones
    for r in out:
        assert r.dist == 0.0
        assert [day_count(r.u1, d) for d in range(28)] == [
            day_count(r.u2, d) for d in range(28)
        ]


def test_pick_rung_validates_and_selects():
    import pytest

    from log_agent_spark.ladder import is_floor, pick_rung

    ladder = ((10, 4), (100, 8), (float("inf"), 16))
    assert pick_rung(0, ladder) == 4
    assert pick_rung(10, ladder) == 4  # caps are inclusive
    assert pick_rung(11, ladder) == 8
    assert pick_rung(10**12, ladder) == 16
    assert is_floor(4, ladder) and not is_floor(8, ladder)
    with pytest.raises(ValueError):
        pick_rung(5, ((100, 4), (10, 8), (float("inf"), 16)))  # unordered
    with pytest.raises(ValueError):
        pick_rung(5, ((10, 4), (100, 8)))  # no unbounded rung


def test_sax_ladder_rungs_divide_series_length():
    """Every SAX rung must evenly segment the 28-day series — enforced at
    import (ADVICE r7: the constraint was comment-only; a non-divisor rung
    silently dropped the trailing partial segment from every word)."""
    from log_agent_spark.operators import timeseries as ts

    for _cap, seg in ts._SAX_SEG_LADDER:
        assert ts._TS_D % seg == 0, (seg, ts._TS_D)
