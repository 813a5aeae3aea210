"""Whole-catalog physical-plan audit: no CartesianProduct or
BroadcastNestedLoopJoin outside the documented whitelist.

The whitelist entries are deliberate: quadratic exact baselines whose
scale paths are separate queries, and single-row scalar build sides
(global average / cutoff threshold) which are equivalent to literal
filters. Anything new that plans a nested loop fails here before it
can regress a 100 TB run.
"""

from __future__ import annotations

import pytest

from kwwhat_spark.queries import REGISTRY

# query -> reason the nested loop is acceptable
WHITELIST = {
    # (similarity_topk left the list: the Arrow/BLAS partial-top-k
    # rewrite eliminated its cross join.)
    "dedup_cosine_exact": "deliberate exact baseline (scale: cosine_near_dup_pairs)",
    "tpch_q22_sales_opportunity": "single-row global-average build side",
    "tpch_q11_important_stock": "single-row cutoff build side",
    "funnel_conversion": "single-row stage totals cross-join",
    "tfidf_top_terms": "single-row corpus-size build side",
    "semantic_dedup": "exact cosine pair side is the deliberate baseline (scale: cosine_near_dup_pairs)",
    "ocpp_chat_bi_entities": "five single-row metric partials cross-joined "
    "into one row (the BI module's whitelisted scalar-combine pattern)",
    "knn_graph_quantized_replayable": "oracle-twin shape: all-pairs over a "
    "200-row bounded slice only (prod kNN is knn_graph/knn_graph_sharded)",
    "ocpp_chat_bi_pop": "two single-row metric partials cross-joined into "
    "one row per period (the BI module's whitelisted scalar-combine "
    "pattern, same as ocpp_chat_bi_entities)",
    "heavy_hitters_bigrams": "single-row corpus-total build side (the "
    "ceil(theta*N) threshold scalar, same shape as tfidf_top_terms)",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_nested_loop_plans(spark, sf_dir, name):
    plan = (
        REGISTRY[name]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    flagged = [w for w in ("CartesianProduct", "BroadcastNestedLoopJoin") if w in plan]
    if name in WHITELIST:
        return  # documented exception — reason in WHITELIST
    assert not flagged, f"{name} plans {flagged}; whitelist it only with a scale rationale"
