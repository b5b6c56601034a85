"""Whole-catalog plan audit: every registered query must optimize to a
plan with no cartesian product — the one shape that's always wrong at
100TB. (Per-query plan details — pushdown, broadcast, pruning — are
asserted in tests/test_plans.py; this is the catalog-wide backstop so a
new query can't silently regress.)"""

from __future__ import annotations

from event_stream_starter_spark.plans import plan_features
from event_stream_starter_spark.queries import all_queries


def test_no_query_plans_a_cartesian_product(spark, sf_dir):
    offenders = []
    for name, spec in sorted(all_queries().items()):
        f = plan_features(spec.fn(spark, sf_dir))
        if f.has_cartesian:
            offenders.append(name)
    assert not offenders, f"cartesian product in: {offenders}"


def test_bm25_global_topk_is_take_ordered_not_full_sort(spark, sf_dir):
    """x_bm25_topk's global top-k must compile to TakeOrderedAndProject
    (per-partition top-k + driver merge of k rows), and the rank window
    may only run over the k-row result — never a Window over the full
    match set. Pins the round-3 de-windowing fix (queries/textdata.py
    x_bm25_topk) so a refactor can't silently reintroduce the global
    sort-window."""
    plan = (
        all_queries()["x_bm25_topk"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # The only Sort allowed is inside the k-row post-limit stage; the
    # pre-limit match set must not be globally sorted. TakeOrdered
    # itself prints no Sort node, so: at most one Sort, and it must
    # appear after the TakeOrderedAndProject line (child stages print
    # below their parents in this tree, so an earlier index = closer to
    # the root = the bounded k-row side).
    take_at = plan.index("TakeOrderedAndProject")
    sorts = [i for i in range(len(plan)) if plan.startswith("Sort ", i)]
    assert all(i < take_at for i in sorts), "full-match-set Sort below TakeOrdered"


def test_epoch_shuffle_has_no_corpus_global_sort(spark, sf_dir):
    """x_epoch_shuffle's permutation must rank inside hash-prefix
    buckets — the only single-partition exchange allowed is the 256-row
    offsets branch (child = the bucket-count HashAggregate). Pins the
    decomposition so a refactor can't silently fall back to the naive
    global ROW_NUMBER (whose plan is a SinglePartition exchange over
    the whole corpus feeding an unpartitioned window)."""
    plan = (
        all_queries()["x_epoch_shuffle"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The corpus ranking window is PARTITIONED by the bucket key.
    assert "row_number() windowspecdefinition(bkt" in plan
    # Exactly one single-partition exchange, and its immediate child is
    # the bucket-count aggregate (256 rows), never the corpus.
    occurrences = plan.count("Exchange SinglePartition")
    assert occurrences == 1, plan
    tail = plan[plan.index("Exchange SinglePartition"):]
    first_child = tail.splitlines()[1] if len(tail.splitlines()) > 1 else ""
    assert "HashAggregate" in first_child, plan


def test_plans_doc_in_sync_with_dump_script():
    """Every query scripts/dump_plans.py promises a section for must
    actually have one in the committed PLANS.md — the round-3 failure
    mode was the script gaining an entry while the doc stayed stale."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import dump_plans

    doc = open(
        os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    ).read()
    missing = [name for name, _ in dump_plans.SHOW if f"## {name}" not in doc]
    assert not missing, f"PLANS.md stale — regenerate: {missing}"


def test_bpe_pair_topk_is_take_ordered_not_full_sort(spark, sf_dir):
    """x_bpe_first_merge's top-20 must be TakeOrderedAndProject over the
    pair histogram — a full histogram sort would be the trainer's
    per-round bottleneck at a 100M-word vocabulary (the argmax in
    train_bpe shares this plan with limit(1))."""
    plan = (
        all_queries()["x_bpe_first_merge"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    take_at = plan.index("TakeOrderedAndProject")
    sorts = [i for i in range(len(plan)) if plan.startswith("Sort ", i)]
    assert all(i < take_at for i in sorts), "pair-histogram Sort below TakeOrdered"


def test_cms_exact_arm_is_take_ordered_not_full_sort(spark, sf_dir):
    """x_cms_heavy_hitters' exact candidate arm must compile to
    TakeOrderedAndProject over the token histogram — at corpus scale a
    full histogram sort would dwarf the fixed-size sketch the query
    exists to showcase. (The final 20-row orderBy sits above it; only
    the histogram-sized sort is the hazard.)"""
    plan = (
        all_queries()["x_cms_heavy_hitters"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_no_unsalted_bounded_key_corpus_window(spark, sf_dir):
    """Registry-wide guard (VERDICT r6 task 2): a window partitioned
    SOLELY by the bounded-cardinality query-id key (qid-style, |keys| =
    the literal query set) over corpus-proportional input exchanges the
    corpus onto |Q| reducers — the skewed-shuffle shape the salted
    two-phase rank (operators/similarity.salted_topn) exists to avoid.

    Decidable plan-text approximation: any executed plan that contains
    a qid-partitioned window WITHOUT a salt column must ALSO contain
    the salted phase-1 window ((qid, ..., __salt)) — i.e., the plain
    window may only be the bounded phase-2 re-rank of a two-phase
    top-n (its input pre-filtered to <= n_salts*n rows per qid by the
    phase-1 rank), never a direct corpus rank. A query whose qid
    window input is bounded a priori still satisfies this by
    construction (its arms are built with salted_topn). Would have
    caught the round-6 quantization-family shortlist finding at
    authoring time."""
    import re

    offenders = []
    for name, spec in sorted(all_queries().items()):
        plan = (
            spec.fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        norm = re.sub(r"#\d+L?", "#", plan)
        specs = re.findall(
            r"windowspecdefinition\(([^)]*?)specifiedwindowframe", norm
        )
        plain = [s for s in specs if "qid#" in s and "salt#" not in s]
        salted = [s for s in specs if "qid#" in s and "salt#" in s]
        if plain and not salted:
            offenders.append((name, plain[0][:80]))
    assert not offenders, f"unsalted qid-window plans: {offenders}"
