"""Value-pinned snapshots for the rows-only registry queries (VERDICT r5 #3).

These queries have no DuckDB oracle — their outputs are seeded/engine-
specific (Spark RNG, xxhash64, KMeans init, BRP projections) — so the driver
records a rows-only check. Each gets a VALUE pin here: a sha256 over the
canonically-sorted stringified result at sf0.001 under the test session
config (local[8], shuffle_partitions=8; seeded paths can legally depend on
partitioning). Verified stable across three fresh JVM sessions before
pinning.

What a pin failure means, in likelihood order:

1. the driver regenerated /root/testdata with different CONTENT — run
   tests/test_fixture_contract.py first (FIXTURES.md §F7) and regenerate
   every ``_PINS`` entry below with the same three-fresh-sessions protocol;
2. an intentional algorithm change — regenerate the pin and say so in the
   commit;
3. an unintentional behavior change — the regression these pins exist to
   catch (the r4 streaming-reader bug class: driver rows-only checks stay
   "clean" while values silently go wrong).

q53 (ALS) and q93 (quality classifier) are pinned separately with
metric-level tolerances (tests/test_ml_layer.py, tests/test_quality.py) —
float fit paths don't hash stably, scalar metrics do.
"""

from __future__ import annotations

import hashlib

import pytest

from ds_ga1004_bigdata_project_spark.queries import REGISTRY

from .conftest import SF_SMOKE

#: query -> (sha256[:16] of sorted stringified rows at sf0.001, row count).
_PINS: dict[str, tuple[str, int]] = {
    "q54_stratified_sample": ("8143d2847e4bbace", 3),
    "q55_hash_sample": ("23f05d388ab8b188", 5),
    "q56_minhash_pairs": ("f22c3ea04370f37a", 28),
    "q57_simhash_groups": ("443e0b2f5694f8ff", 432),
    "q58_ivf_topk": ("2c537a25b36cd4c9", 50),
    "q59_brp_lsh_neighbors": ("b96a156e75a30b1c", 1252),
    "q61_bernoulli_sample": ("7bd77bcca224a972", 3),
    "q64_neardup_corpus": ("63dcc01bd05c2a7c", 5),
    # q154: no DuckDB oracle by design (iterative argmax-per-round);
    # the merge list is exact-integer deterministic and additionally
    # verified against a pure-Python BPE reference in test_subword.py.
    "q154_bpe_merges": ("19467f56e56394e1", 24),
    # q164: rows-only because it consumes q154's merge loop; the encode
    # join + fertility agg are exact integers + one rounded divide, and
    # test_subword.py checks fertility against the pure-Python reference.
    "q164_bpe_fertility": ("5da5df01e15b8ac4", 5),
}


def _canonical_hash(df) -> tuple[str, int]:
    rows = sorted(tuple(map(str, r)) for r in df.collect())
    return hashlib.sha256(repr(rows).encode()).hexdigest()[:16], len(rows)


@pytest.mark.parametrize("name", sorted(_PINS))
def test_rows_only_query_value_pin(spark, name):
    got_hash, got_n = _canonical_hash(REGISTRY[name].build(spark, SF_SMOKE))
    want_hash, want_n = _PINS[name]
    assert (got_hash, got_n) == (want_hash, want_n), (
        f"{name} snapshot drifted (see module docstring for triage): "
        f"got ({got_hash}, {got_n}) want ({want_hash}, {want_n})")
