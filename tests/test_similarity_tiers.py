"""Cross-tier consistency: the JVM-expression and BLAS near-dup tiers must
produce identical pairs and bit-identical rounded cosines."""

from __future__ import annotations

from ds_ga1004_bigdata_project_spark.operators import similarity as sim
from ds_ga1004_bigdata_project_spark.sources.catalog import Catalog

from .conftest import SF_SMOKE


def test_expression_and_blas_tiers_agree(spark):
    emb = Catalog(spark, SF_SMOKE).embeddings
    expr = {(r["a"], r["b"]): r["cosine_sim"]
            for r in sim.cosine_neardup_pairs(emb, threshold=0.3).collect()}
    blas = {(r["a"], r["b"]): r["cosine_sim"]
            for r in sim.cosine_neardup_pairs_blas(emb, threshold=0.3).collect()}
    assert expr.keys() == blas.keys() and len(expr) > 0
    for k in expr:
        assert expr[k] == blas[k], f"pair {k}: {expr[k]} != {blas[k]}"


def test_blocked_tier_agrees_and_never_collects(spark):
    # The q41-registered blocked tier must match the BLAS tier exactly and
    # keep the whole computation distributed (no driver-side collect).
    emb = Catalog(spark, SF_SMOKE).embeddings
    blas = {(r["a"], r["b"]): r["cosine_sim"]
            for r in sim.cosine_neardup_pairs_blas(emb, threshold=0.3).collect()}
    blocked_df = sim.cosine_neardup_pairs_blocked(emb, threshold=0.3, n_blocks=4)
    blocked = {(r["a"], r["b"]): r["cosine_sim"] for r in blocked_df.collect()}
    assert blocked == blas and len(blocked) > 0
    # single-block degenerate case still correct (pure diagonal path)
    one = {(r["a"], r["b"]): r["cosine_sim"]
           for r in sim.cosine_neardup_pairs_blocked(
               emb, threshold=0.3, n_blocks=1).collect()}
    assert one == blas
