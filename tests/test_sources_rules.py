"""SWR dimension cache + rules hot-reload behavior tests."""

from __future__ import annotations

import pytest
import yaml

from event_stream_starter_spark.rules.hotreload import HotReloadRegistry
from event_stream_starter_spark.sources.dimensions import DimensionCache


class FakeClock:
    def __init__(self, t0: float = 1000.0):
        self.t = t0

    def __call__(self) -> float:
        return self.t


def test_swr_serves_stale_on_failed_refresh(spark):
    clock = FakeClock()
    calls = {"n": 0}

    def fetch():
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("provider down")
        return spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")

    cache = DimensionCache(fetch, ttl_sec=10, clock=clock)
    snap1 = cache.current()
    assert snap1.version == 1 and not snap1.degraded

    clock.t += 60  # TTL expired → refresh fires and fails
    snap2 = cache.current()
    assert snap2.version == 1 and snap2.degraded
    assert snap2.df.count() == 2  # stale data still served

    facts = spark.createDataFrame([(1,), (3,)], "k int")
    out = cache.enrich(facts, on=["k"])
    rows = {r["k"]: (r["v"], r["dim_degraded"]) for r in out.collect()}
    assert rows[1] == ("a", True)
    assert rows[3][0] is None  # left join keeps unmatched facts


def test_swr_first_fetch_failure_raises(spark):
    cache = DimensionCache(lambda: (_ for _ in ()).throw(RuntimeError("x")))
    with pytest.raises(RuntimeError):
        cache.current()


def test_backend_failover_order_and_stamp(spark):
    from event_stream_starter_spark.sources.dimensions import fetch_with_failover

    def broken():
        raise RuntimeError("primary down")

    def ok():
        return spark.createDataFrame([(1, "x")], "k int, v string")

    fetch = fetch_with_failover([("apify", broken), ("graphql", ok)])
    df = fetch()
    rows = df.collect()
    assert rows[0]["source_backend"] == "graphql"

    fetch_all_fail = fetch_with_failover([("a", broken), ("b", broken)])
    with pytest.raises(RuntimeError, match="all backends failed"):
        fetch_all_fail()


def test_outbox_channel_routing_broadcast(spark):
    """J8: outbox payloads route to channel config via broadcast join."""
    import pyspark.sql.functions as F

    outbox = spark.createDataFrame(
        [(1, "k1", 100), (2, "k2", 200), (3, "k3", 999)],
        "id long, event_key string, channel_id long",
    )
    channels = spark.createDataFrame(
        [(100, "tg", 2), (200, "slack", 5)],
        "channel_id long, transport string, rate_per_sec int",
    )
    routed = outbox.join(F.broadcast(channels), "channel_id", "left")
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["id"]: r["transport"] for r in routed.collect()}
    assert rows == {1: "tg", 2: "slack", 3: None}


def test_hotreload_ttl_mtime_and_version(tmp_path):
    path = tmp_path / "rules.yml"
    path.write_text(yaml.safe_dump({"rules": [{"id": "R1", "score": 5}]}))
    clock = FakeClock()
    reg = HotReloadRegistry(
        str(path), lambda p: yaml.safe_load(open(p)), ttl_sec=5, clock=clock
    )

    r1 = reg.current()
    assert r1.value["rules"][0]["score"] == 5
    assert reg.reload_count == 1

    # Within TTL: no stat, no reload even if the file changed.
    path.write_text(yaml.safe_dump({"rules": [{"id": "R1", "score": 9}]}))
    assert reg.current().value["rules"][0]["score"] == 5

    # Past TTL: mtime differs → atomic swap to new value, version advances.
    clock.t += 10
    r2 = reg.current()
    assert r2.value["rules"][0]["score"] == 9
    assert r2.version != r1.version
    assert reg.reload_count == 2

    # Past TTL again with unchanged file: TTL refreshed, no reload.
    clock.t += 10
    r3 = reg.current()
    assert r3.version == r2.version
    assert reg.reload_count == 2


def test_compiled_conditions_agree_across_engines_fuzz(spark):
    """Property fuzz of the rules grammar: random condition ASTs over the
    whitelisted fields compile to ONE SQL string that must evaluate to
    identical row sets in Spark and DuckDB — including null fields under
    three-valued logic (the 'null field → rule does not match' law)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    from event_stream_starter_spark.rules.compiler import compile_condition

    fields = ["buy_tax", "heat_slope", "evidence_count", "last_sentiment"]
    rows = []
    vals = [None, -2.0, 0.0, 0.5, 3.0, 10.0]
    sents = [None, "pos", "neg", "neu"]
    for i in range(72):
        rows.append(
            (
                i,
                vals[i % len(vals)],
                vals[(i // 2) % len(vals)],
                None if i % 7 == 0 else float(i % 5),
                sents[i % len(sents)],
            )
        )
    sdf = spark.createDataFrame(
        rows,
        "row_id long, buy_tax double, heat_slope double,"
        " evidence_count double, last_sentiment string",
    )
    sdf.createOrReplaceTempView("fuzz_sig")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fuzz_sig(row_id BIGINT, buy_tax DOUBLE, heat_slope DOUBLE,"
        " evidence_count DOUBLE, last_sentiment VARCHAR)"
    )
    con.executemany("INSERT INTO fuzz_sig VALUES (?,?,?,?,?)", rows)

    num = st.sampled_from(["-2", "0", "0.5", "3", "10.0"])
    numf = st.sampled_from(fields[:3])
    cmp_op = st.sampled_from([">", ">=", "<", "<=", "==", "!="])

    rng_op = st.sampled_from(["<", "<="])
    atom = st.one_of(
        st.tuples(numf, cmp_op, num).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
        # Python-style chained comparison (desugared by the compiler)
        st.tuples(num, rng_op, numf, rng_op, num).map(
            lambda t: f"{t[0]} {t[1]} {t[2]} {t[3]} {t[4]}"
        ),
        st.sampled_from(fields).map(lambda f: f"{f} is null"),
        st.sampled_from(fields).map(lambda f: f"{f} is not null"),
        st.sampled_from(["pos", "neg", "neu"]).map(
            lambda s: f"last_sentiment == '{s}'"
        ),
    )

    def boolean(children):
        return st.one_of(
            st.tuples(children, st.sampled_from(["and", "or"]), children).map(
                lambda t: f"({t[0]} {t[1]} {t[2]})"
            ),
            children.map(lambda c: f"not ({c})"),
        )

    cond_strategy = st.recursive(atom, boolean, max_leaves=6)

    @settings(max_examples=25, deadline=None)
    @given(cond=cond_strategy)
    def check(cond):
        sql = compile_condition(cond)
        s_rows = {
            r["row_id"]
            for r in spark.sql(
                f"SELECT row_id FROM fuzz_sig WHERE {sql}"
            ).collect()
        }
        d_rows = {
            r[0]
            for r in con.execute(
                f"SELECT row_id FROM fuzz_sig WHERE {sql}"
            ).fetchall()
        }
        assert s_rows == d_rows, cond

    check()


def test_rule_reason_with_quote_compiles_both_engines(spark):
    """Free-text reason strings (config-provided) must be escaped into
    the emitted SQL: an apostrophe cannot break out of the literal."""
    import duckdb

    from event_stream_starter_spark.rules.compiler import load_ruleset

    rs = load_ruleset(
        {
            "version": "v1",
            "thresholds": {"opportunity": 5, "caution": -5},
            "missing_map": {"o'brien": ["heat_slope"]},
            "groups": [
                {
                    "name": "g",
                    "priority": 10,
                    "rules": [
                        {
                            "id": "Q1",
                            "condition": "buy_tax >= 0",
                            "score": 8,
                            "reason": "doesn't look safe",
                        }
                    ],
                }
            ],
        }
    )
    spark.createDataFrame(
        [(0.1, None)], "buy_tax double, heat_slope double"
    ).createOrReplaceTempView("quote_sig")
    con = duckdb.connect()
    con.execute("CREATE TABLE quote_sig(buy_tax DOUBLE, heat_slope DOUBLE)")
    con.execute("INSERT INTO quote_sig VALUES (0.1, NULL)")
    for dialect, run in (
        ("spark", lambda q: spark.sql(q).collect()[0]),
        ("duckdb", lambda q: con.execute(q).fetchall()[0]),
    ):
        reasons, missing = run(
            f"SELECT {rs.reasons_sql(dialect=dialect)} AS r, "
            f"{rs.missing_sources_sql(dialect=dialect)} AS m FROM quote_sig"
        )
        assert "doesn't look safe" in reasons
        assert missing == "o'brien"


def test_hotreload_serves_cached_on_failed_reload(tmp_path):
    """A half-written rules file at TTL expiry must not crash the
    caller: the registry serves the last good value and retries after
    the next TTL window; only a FIRST load failure raises."""
    import pytest

    from event_stream_starter_spark.rules.hotreload import HotReloadRegistry

    p = tmp_path / "rules.yml"
    p.write_text("v: 1")
    clock = [0.0]

    def loader(path):
        text = open(path).read()
        if "BROKEN" in text:
            raise ValueError("parse error")
        return text

    reg = HotReloadRegistry(str(p), loader, ttl_sec=5.0, clock=lambda: clock[0])
    assert reg.current().value == "v: 1"

    p.write_text("BROKEN {{{")
    clock[0] = 10.0  # TTL expired, file changed, loader raises
    got = reg.current()
    assert got.value == "v: 1"  # old value served, no exception

    p.write_text("v: 2")
    clock[0] = 20.0  # recovered file picked up on the next expiry
    assert reg.current().value == "v: 2"

    bad = tmp_path / "missing.yml"
    bad.write_text("BROKEN")
    first = HotReloadRegistry(str(bad), loader, ttl_sec=5.0, clock=lambda: clock[0])
    with pytest.raises(ValueError):
        first.current()


def test_swr_degraded_snapshot_revalidates_after_ttl(spark):
    """A failed refresh must not pin the cache: the degraded snapshot is
    re-validated once per TTL window (not on every call) and recovers
    when the backend comes back."""
    clock = FakeClock()
    calls = {"n": 0}
    plan = [True, False, False, True]  # ok, down, down, recovered

    def fetch():
        ok = plan[min(calls["n"], len(plan) - 1)]
        calls["n"] += 1
        if not ok:
            raise RuntimeError("provider down")
        return spark.createDataFrame([(calls["n"], "x")], "k int, v string")

    cache = DimensionCache(fetch, ttl_sec=10, clock=clock)
    assert cache.current().version == 1

    clock.t += 60
    assert cache.current().degraded  # failure #1 → stale served
    n_after_fail = calls["n"]
    assert cache.current().degraded  # still degraded...
    assert calls["n"] == n_after_fail  # ...and within TTL: NO retry storm

    clock.t += 60
    assert cache.current().degraded  # failure #2: retried once per window

    clock.t += 60
    snap = cache.current()  # backend recovered → fresh snapshot swaps in
    assert not snap.degraded and snap.version == 2


def test_reasons_dedup_by_text_keeps_higher_priority(spark):
    """T6 parity (eval_event.py:536-543): reasons are deduplicated by
    TEXT before the top-3 cut — two rules sharing a reason string emit
    it once, at the higher-priority position, in both dialects."""
    import duckdb

    from event_stream_starter_spark.rules.compiler import load_ruleset

    rs = load_ruleset(
        {
            "version": "v1",
            "thresholds": {"opportunity": 5, "caution": -5},
            "groups": [
                {
                    "name": "g",
                    "priority": 10,
                    "rules": [
                        {"id": "A", "condition": "buy_tax >= 0", "score": 8,
                         "reason": "dup reason"},
                        {"id": "B", "condition": "buy_tax >= 0", "score": 2,
                         "reason": "dup reason", "priority": 5},
                        {"id": "C", "condition": "buy_tax >= 0", "score": 1,
                         "reason": "other", "priority": 1},
                    ],
                }
            ],
        }
    )
    spark.createDataFrame([(0.1,)], "buy_tax double").createOrReplaceTempView(
        "dedup_sig"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE dedup_sig(buy_tax DOUBLE)")
    con.execute("INSERT INTO dedup_sig VALUES (0.1)")
    s = spark.sql(
        f"SELECT {rs.reasons_sql(dialect='spark')} AS r FROM dedup_sig"
    ).first()["r"]
    d = con.execute(
        f"SELECT {rs.reasons_sql(dialect='duckdb')} AS r FROM dedup_sig"
    ).fetchone()[0]
    assert s == d == "dup reason;other"


def test_compiler_desugars_chained_comparison_rejects_backslash():
    """Chained comparisons are Python semantics in the reference dialect
    (api/rules/eval_event.py:213-260): `a < b < 5` == `a < b and b < 5`.
    SQL would parse them as `(a < b) < 5`, so the compiler desugars to a
    conjunction at compile time. Backslash in a shared-SQL string literal
    cannot mean the same thing in Spark (escape char) and DuckDB
    (literal) — still rejected."""
    import pytest

    from event_stream_starter_spark.rules.compiler import (
        RuleCompileError,
        compile_condition,
    )

    # accepted vectors (reference dialect)
    assert (
        compile_condition("buy_tax < sell_tax < 5")
        == "(buy_tax < sell_tax AND sell_tax < 5)"
    )
    assert (
        compile_condition("0 <= buy_tax <= sell_tax < 5")
        == "(0 <= buy_tax AND buy_tax <= sell_tax AND sell_tax < 5)"
    )
    # a desugared chain composes with the surrounding boolean grammar
    assert compile_condition(
        "honeypot == false and 1 < buy_tax < 3"
    ) == "honeypot = FALSE AND (1 < buy_tax AND buy_tax < 3)"
    # rejected vectors
    with pytest.raises(RuleCompileError, match="backslash"):
        compile_condition("last_sentiment == 'a\\b'")
    # a paren-forced residual chain is still a compile error, not SQL
    with pytest.raises(RuleCompileError, match="chained comparison"):
        compile_condition("(buy_tax < sell_tax) < 5")
    # postfix nullcheck after a comparison is not a chain — reject
    with pytest.raises(RuleCompileError, match="chained comparison"):
        compile_condition("buy_tax < sell_tax is null")
    # ... and the same after a DESUGARED chain: `a < b < 5 is null` is a
    # parse error in the reference (ast eval raises -> no match), so the
    # compiler must reject it rather than emit `(...) IS NULL` (which
    # would MATCH on NULL operands — silent divergence).
    with pytest.raises(RuleCompileError, match="chained comparison"):
        compile_condition("buy_tax < sell_tax < 5 is null")
    # (whereas a trailing cmp+atom merely extends the chain, as in Python)
    assert (
        compile_condition("buy_tax < sell_tax < 5 == buy_tax")
        == "(buy_tax < sell_tax AND sell_tax < 5 AND 5 = buy_tax)"
    )
    # Parenthesized bare atoms participate in chains (Python ast.Compare
    # accepts `(a) < b < 5` as a chain); parens are kept in the SQL.
    assert (
        compile_condition("(buy_tax) < sell_tax < 5")
        == "((buy_tax) < sell_tax AND sell_tax < 5)"
    )
    assert (
        compile_condition("buy_tax < ((sell_tax)) < 5")
        == "(buy_tax < ((sell_tax)) AND ((sell_tax)) < 5)"
    )
    # The guard resets across boolean operators and parens.
    assert compile_condition("buy_tax >= 1 and (sell_tax < 2 or honeypot == true)")


def test_compiler_chained_comparison_evaluates_python_semantics(spark):
    """The desugared SQL must evaluate like Python's chained comparison
    in both dialects, including the NULL-middle case (no match)."""
    import duckdb

    from event_stream_starter_spark.rules.compiler import compile_condition

    sql = compile_condition("0 < buy_tax < 0.3")
    rows = [(0.1, "in"), (0.5, "out"), (None, "null")]
    spark.createDataFrame(rows, "buy_tax double, tag string").createOrReplaceTempView(
        "chaincheck"
    )
    got_s = {
        r["tag"]
        for r in spark.sql(f"SELECT tag FROM chaincheck WHERE {sql}").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE chaincheck(buy_tax DOUBLE, tag VARCHAR)")
    con.executemany("INSERT INTO chaincheck VALUES (?, ?)", rows)
    got_d = {r[0] for r in con.execute(f"SELECT tag FROM chaincheck WHERE {sql}").fetchall()}
    assert got_s == got_d == {"in"}


def test_reasons_sql_with_zero_rules_and_backslash_reason(spark):
    """missing_map-only rulesets must emit valid SQL (no leading comma),
    and a backslash in a reason survives the Spark dialect's escaping."""
    import duckdb

    from event_stream_starter_spark.rules.compiler import RuleSet, load_ruleset

    rs = RuleSet(rules=[], missing_map={"dex": ["dex_liquidity"]})
    con = duckdb.connect()
    con.execute("CREATE TABLE z(dex_liquidity DOUBLE, buy_tax DOUBLE)")
    con.execute("INSERT INTO z VALUES (NULL, 0.1)")
    spark.createDataFrame(
        [(None, 0.1)], "dex_liquidity double, buy_tax double"
    ).createOrReplaceTempView("z")
    for dialect, run in (
        ("spark", lambda q: spark.sql(q).first()[0]),
        ("duckdb", lambda q: con.execute(q).fetchone()[0]),
    ):
        assert run(f"SELECT {rs.reasons_sql(dialect=dialect)} FROM z") == (
            "missing dex data"
        )

    rs2 = load_ruleset(
        {
            "version": "v1",
            "groups": [{"name": "g", "priority": 1, "rules": [
                {"id": "B1", "condition": "buy_tax >= 0", "score": 1,
                 "reason": "path C:\\ bad"},
            ]}],
        }
    )
    for dialect, run in (
        ("spark", lambda q: spark.sql(q).first()[0]),
        ("duckdb", lambda q: con.execute(q).fetchone()[0]),
    ):
        assert run(f"SELECT {rs2.reasons_sql(dialect=dialect)} FROM z") == (
            "path C:\\ bad"
        )


def test_onchain_verdict_replays_reference_vectors(spark):
    """Replay the upstream rules-engine vectors (reference
    tests/test_rules_engine.py:42-110) through the compiled SQL:
    upgrade (all upgrade conds) → 1.0, downgrade priority (both branches
    true) → downgrade 1.0, hold → 0.5, unsupported window →
    insufficient 0.0 with note 'window_unsupported'."""
    from event_stream_starter_spark.rules.onchain import load_onchain_rules

    rules = load_onchain_rules(
        {
            "windows": [30, 60, 180],
            "thresholds": {
                "active_addr_pctl": {"high": 0.95, "mid": 0.80},
                "growth_ratio": {"fast": 2.0, "slow": 1.2},
                "top10_share": {"high_risk": 0.70, "mid_risk": 0.40},
                "self_loop_ratio": {"suspicious": 0.20, "watch": 0.10},
            },
            "upgrade_if": [
                "active_addr_pctl>=high",
                "growth_ratio>=fast",
            ],
            "downgrade_if": [
                "top10_share>=high_risk",
                "self_loop_ratio>=suspicious",
            ],
        }
    )
    frags = rules.verdict_sql(window_col="window_min")
    rows = [
        # (name, active, growth, top10, self_loop, window)
        ("upgrade", 0.96, 2.5, 0.30, 0.05, 60),
        ("downgrade_priority", 0.96, 2.5, 0.75, 0.25, 60),
        ("hold", 0.85, 1.5, 0.30, 0.05, 60),
        ("insufficient_window", 0.85, 1.5, 0.30, 0.05, 90),
        ("null_window", 0.96, 2.5, 0.30, 0.05, None),  # NULL ≠ supported
    ]
    df = spark.createDataFrame(
        rows,
        "name string, active_addr_pctl double, growth_ratio double,"
        " top10_share double, self_loop_ratio double, window_min int",
    ).selectExpr(
        "name",
        f"{frags['verdict']} AS verdict",
        f"CAST({frags['confidence']} AS DOUBLE) AS confidence",
        f"{frags['note']} AS note",
    )
    got = {r["name"]: (r["verdict"], r["confidence"], r["note"]) for r in df.collect()}
    assert got == {
        "upgrade": ("upgrade", 1.0, None),
        "downgrade_priority": ("downgrade", 1.0, None),
        "hold": ("hold", 0.5, None),
        "insufficient_window": ("insufficient", 0.0, "window_unsupported"),
        "null_window": ("insufficient", 0.0, "window_unsupported"),
    }


def test_r4_market_risk_null_props_is_safe(spark):
    """Reference vector (tests/test_market_risk.py missing-field case):
    an event with NULL/empty props must produce NO tags and
    market_risk=false — never a crash or a spurious tag from
    NULL-propagating comparisons."""
    import pyspark.sql.functions as F

    k = F.get_json_object("props", "$.k").cast("int")
    tags = F.filter(
        F.array(
            F.when(F.col("value") > 80, F.lit("MR01")),
            F.when(k > 90, F.lit("MR02")),
            F.when((F.col("value") < 5) & (k < 10), F.lit("MR03")),
        ),
        lambda x: x.isNotNull(),
    )
    df = spark.createDataFrame(
        [
            (1, None, 50.0),          # NULL props, mid value → nothing
            (2, "{}", 90.0),          # no k key, high value → MR01 only
            (3, "{\"k\": 95}", 2.0),  # k high, low value → MR02 (MR03 needs k<10)
            (4, None, 90.0),          # NULL props, high value → MR01 only
        ],
        "event_id long, props string, value double",
    ).select(
        "event_id",
        F.array_join(tags, "|").alias("mr_tags"),
        (F.size(tags) > 0).alias("market_risk"),
    )
    got = {r["event_id"]: (r["mr_tags"], r["market_risk"]) for r in df.collect()}
    assert got == {
        1: ("", False),
        2: ("MR01", True),
        3: ("MR02", True),
        4: ("MR01", True),
    }


def test_canonical_url_full_fidelity_vectors():
    """Hand-derived vectors for the parser-path C2 residuals
    (api/events.py:123-173): IDN punycode, default-port behavior AFTER
    scheme normalization (the reference's quirk: http://h:80 keeps :80
    because the check runs against the already-https scheme),
    lowercased-key TUPLE sort, re-encoding ('=' in a value escapes to
    %3D), blank values kept, bare host → '/', fail-open on junk."""
    from event_stream_starter_spark.functions.normalize import _canonical_url

    vectors = {
        # IDN → punycode; unicode path survives; trailing slash collapsed
        "https://BÜcher.example/bücher/": "https://xn--bcher-kva.example/bücher",
        # http :80 survives scheme normalization (https default is 443)
        "http://Example.com:80/a": "https://example.com:80/a",
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:8080/a": "https://example.com:8080/a",
        # tuple sort on (lowercased key, value); tracking params dropped
        "https://x.com/p?B=2&a=1&utm_x=1&REF=h": "https://x.com/p?a=1&b=2",
        # '=' inside a value is percent-encoded by the re-encode
        "https://x.com/q?k=v=w": "https://x.com/q?k=v%3Dw",
        # blank values kept (keep_blank_values=True)
        "https://x.com/q?a=&b=1": "https://x.com/q?a=&b=1",
        # bare host gains the root path
        "https://x.com": "https://x.com/",
        # scheme-relative input: '' scheme normalizes to https
        "//x.com/a": "https://x.com/a",
        # whitespace stripped before parsing
        "  https://x.com/a  ": "https://x.com/a",
        # fragment dropped
        "https://x.com/a#frag": "https://x.com/a",
    }
    for raw, want in vectors.items():
        assert _canonical_url(raw) == want, raw
    assert _canonical_url(None) is None
    assert _canonical_url("") is None
    assert _canonical_url(123) is None
    # fail-open: an unparseable port returns the INPUT unchanged
    junk = "https://x.com:notaport/a"
    assert _canonical_url(junk) == junk


def test_normalize_url_and_text_agree_across_engines_fuzz(spark):
    """Property fuzz of the C1/C2 normalization laws: generated URL and
    text shapes (tracking params in any position, fragments, trailing
    slashes, dangling '&', www/bare-domain mentions, handles, runs of
    whitespace) must normalize identically through the Spark column
    expressions and the SHIPPED DuckDB oracle law (the c2 oracle's own
    SQL template, instantiated over the generated values)."""
    import duckdb
    import pyspark.sql.functions as F
    from hypothesis import given, settings, strategies as st

    from event_stream_starter_spark.functions.normalize import (
        normalize_text,
        normalize_url,
    )
    from event_stream_starter_spark.queries.scalars import URL_NORM_SQL_TEMPLATE

    host = st.sampled_from(["x.com", "example.org", "sub.domain.io"])
    path = st.sampled_from(["", "/a", "/a/b", "/a&b/c", "/status/123"])
    param = st.sampled_from(
        ["utm_source=tw", "utm_medium=x", "ref=home", "ref_src=abc",
         "id=7", "q=spark", "b=2", "a=1"]
    )
    frag = st.sampled_from(["", "#frag", "#a/b"])
    slashes = st.sampled_from(["", "/", "//"])
    scheme = st.sampled_from(["http://", "https://"])

    @settings(max_examples=40, deadline=None)
    @given(
        scheme=scheme,
        host=host,
        path=path,
        params=st.lists(param, min_size=0, max_size=4),
        fragment=frag,
        trail=slashes,
    )
    def run_url(scheme, host, path, params, fragment, trail):
        url = scheme + host + path + ("?" + "&".join(params) if params else "")
        url = url + trail + fragment
        sdf = spark.createDataFrame([(url,)], "url string")
        got = sdf.select(normalize_url(F.col("url")).alias("n")).first()["n"]
        con = duckdb.connect()
        sql = URL_NORM_SQL_TEMPLATE.format(
            src="(SELECT 1 AS doc_id, ? AS raw_url)"
        )
        want = con.execute(sql, [url]).fetchone()[1]
        con.close()
        assert got == want, f"url={url!r}: spark={got!r} duck={want!r}"

    run_url()

    # C1 text normalization: mirror the c1 oracle's law inline (scheme'd
    # URL strip, www strip, bare-domain strip to space, handle strip,
    # whitespace collapse) — identical fragments to the c1 oracle SQL.
    txt_sql = """
        SELECT trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(lower(?), 'https?://[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
            'www\\.[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
            '\\b[a-zA-Z0-9][a-zA-Z0-9-]*\\.(?:com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[ \\t\\n\\x0b\\f\\r,\\.!?;:]',
            ' ', 'g'),
            '@\\w+', '', 'g'),
            '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS n
    """
    word = st.sampled_from(
        ["hello", "WORLD", "#tag", "@user", "token.com", "www.site.io",
         "https://x.com/a?b=1", "pump", "x.commune", "end.io"]
    )

    @settings(max_examples=40, deadline=None)
    @given(words=st.lists(word, min_size=0, max_size=6),
           sep=st.sampled_from([" ", "  ", "\t", " , ", "\x0b", "\x0b "]))
    def run_text(words, sep):
        text = sep.join(words)
        sdf = spark.createDataFrame([(text,)], "text string")
        got = sdf.select(normalize_text(F.col("text")).alias("n")).first()["n"]
        con = duckdb.connect()
        want = con.execute(txt_sql, [text]).fetchone()[0]
        con.close()
        assert got == want, f"text={text!r}: spark={got!r} duck={want!r}"

    run_text()


def test_nfc_normalize_text_full_combining_vectors(spark):
    """Hand-derived vectors for C1's in-engine NFC step (reference
    api/events.py:388 normalizes unconditionally before the strip laws):
    combining sequences compose BEFORE lowercase/strip, so a decomposed
    input and its precomposed twin normalize identically, and the
    composed string is shorter than the decomposed one."""
    import unicodedata

    from pyspark.sql import functions as F

    from event_stream_starter_spark.functions.normalize import (
        nfc,
        normalize_text_full,
    )

    vectors = [
        # (decomposed input, expected normalize_text_full output)
        ("Cafe\u0301", "caf\u00e9"),
        ("A\u030angstro\u0308m UNITS", "\u00e5ngstr\u00f6m units"),
        ("@user e\u0301clair", "\u00e9clair"),
        # combining mark glued to a URL token strips with the URL
        ("https://x.co/p\u0301 rest", "rest"),
        # precomposed twin of the first vector \u2014 same output
        ("Caf\u00e9", "caf\u00e9"),
        (None, None),    ]
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(vectors)], "i long, raw string"
    ).select("i", normalize_text_full(F.col("raw")).alias("out"),
             F.length(nfc(F.col("raw"))).alias("nfc_len"),
             F.length("raw").alias("raw_len"))
    got = {r["i"]: (r["out"], r["nfc_len"], r["raw_len"]) for r in df.collect()}
    for i, (raw, want) in enumerate(vectors):
        out, nfc_len, raw_len = got[i]
        assert out == want, (raw, out)
        if raw is not None:
            # composition really happened: length shrinks iff the input
            # had composable combining pairs (python is the cross-check)
            assert nfc_len == len(unicodedata.normalize("NFC", raw)), raw
            assert raw_len == len(raw), raw
