"""Corpus-distribution statistics and mixture reweighting.

Two training-data operators a corpus release / mixture tuner needs that
the datacard family doesn't yet cover:

- ``x_zipf_entropy``: per-language token-distribution datasheet — Zipf
  power-law slope fitted on the frequency head (Zipf 1949; Piantadosi
  2014 reviews the head-fit practice), unigram Shannon entropy,
  type/token ratio, hapax fraction and top-100 mass. The entropy uses
  H = log2(N) - (1/N)·Σ f·log2(f), so the corpus-sized pass is ONE
  aggregate with no per-token probability join; the rank-dependent
  stats (slope, head mass) rank only the top-V types per language via
  the salted two-phase top-n (operators/similarity.salted_topn), never
  a per-lang window over the full vocabulary — at 100 TB a per-lang
  vocab is ~10^8 types and a plain per-lang rank window would sort it
  on |langs| reducers.

- ``x_doremi_weights``: DoReMi-style domain reweighting (Xie et al.
  2023 "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  Pretraining"): one exponentiated-gradient step
  w_i ∝ share_i · exp(η · excess_i) over per-domain clipped excess
  loss. The published method uses a small proxy model vs a reference
  model; the engine's deterministic stand-ins are the two LMs it
  already fully oracles — excess_i = max(0, mean add-one-trigram nll −
  mean KN-trigram nll) per source, i.e. how far the weaker scorer lags
  the stronger one on that domain (hardest-to-learn domains get
  upweighted, the DoReMi law). Swapping real model losses in changes
  only the two nll inputs; the EG update stays as-is.
  ``x_doremi_weights_multiround`` iterates the step (Alg. 1's loop)
  with a per-round current-weight baseline — see its block comment.

Numeric posture (the x_kn/x_ccnet contract): per-doc nll values are the
bit-equal 6-dp doubles both LM oracles already certify; per-domain means
sum those as DECIMAL(18,6) (order-independent) before one double
division; the EG numerators round share·exp(η·excess) to 12 dp before a
DECIMAL(28,12) sum, so a 1-ulp cross-engine exp() difference (~1e-16)
cannot flip a 5e-13 rounding quantum, and the normalizing denominator
is exact.

Reference parity: the reference ships no corpus-statistics or mixture
module; these extend the training-pipeline surface (SURVEY §2 "beyond
the reference" families) with published methods only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import textan
from ..operators.similarity import salted_topn
from . import query
from .knlm import _KN_CTES_SQL, _kn_cc_scored
from .textdata import _CCNET_CTES_SQL, _TOKS_DUCK

_ZIPF_HEAD = 1000  # types per language the slope is fitted on
_MASS_HEAD = 100  # types per language for the head-mass stat


@query(
    "x_zipf_entropy",
    f"""
    WITH zt AS (
        SELECT lang, unnest({_TOKS_DUCK}) AS tok FROM documents
    ), zty AS (
        SELECT lang, tok, COUNT(*) AS f FROM zt GROUP BY lang, tok
    ), zst AS (
        SELECT lang,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_types,
               CAST(SUM(CAST(ROUND(CAST(f AS DOUBLE)
                                   * log2(CAST(f AS DOUBLE)), 7)
                             AS DECIMAL(28,9))) AS DOUBLE) AS sflf
        FROM zty GROUP BY lang
    ), zrk AS (
        SELECT lang, f,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY f DESC, tok ASC) AS r
        FROM zty
    ), zhd AS (
        SELECT lang,
               CAST(SUM(CASE WHEN r <= {_MASS_HEAD} THEN f ELSE 0 END)
                    AS BIGINT) AS mass_head,
               regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE)))
                   AS slope
        FROM zrk WHERE r <= {_ZIPF_HEAD} GROUP BY lang
    )
    SELECT zst.lang, n_tokens, n_types,
           ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) + 0
               AS type_token_ratio,
           ROUND(CAST(hapax_types AS DOUBLE) / CAST(n_types AS DOUBLE), 6) + 0
               AS hapax_frac,
           ROUND(log2(CAST(n_tokens AS DOUBLE))
                 - sflf / CAST(n_tokens AS DOUBLE), 6) + 0 AS entropy_bits,
           ROUND(CAST(mass_head AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) + 0
               AS top100_mass,
           ROUND(slope, 6) + 0 AS zipf_slope
    FROM zst JOIN zhd ON zst.lang = zhd.lang
    """,
    survey_ids=(
        "training-pipeline: per-language token-distribution datasheet — "
        "Zipf slope on the top-1000 frequency head (salted two-phase "
        "rank, no per-lang vocab-wide window), unigram Shannon entropy "
        "via one order-independent aggregate, TTR / hapax / top-100 "
        "mass; full value-hash oracle incl. the regr_slope fit"
    ),
)
def x_zipf_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus token-distribution statistics.

    Emits (lang, n_tokens, n_types, type_token_ratio, hapax_frac,
    entropy_bits, top100_mass, zipf_slope).

    Scale shape: explode is map-side; the (lang, tok) type table is the
    one corpus shuffle (partial-agg combine, so the exchange carries
    distinct types per partition); the whole-vocab stats reduce that
    table in one per-lang aggregate (f·log2 f terms rounded to 7 dp and
    summed as DECIMAL(28,9) — order-independent, 1-ulp log differences
    can't flip a term); rank-dependent stats touch only the top-1000
    types per lang via salted_topn, so no per-lang window ever sees the
    full vocabulary. regr_slope posture = w4_regr_slope (round 6 + 0;
    x = ln(rank) ≤ ln(1000), no cancellation risk).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(textan.tokens(F.col("text"))).alias("tok")
    )
    types = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("f"))
    fd = F.col("f").cast("double")
    stats = types.groupBy("lang").agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_types"),
        F.sum(F.round(fd * F.log2(fd), 7).cast("decimal(28,9)"))
        .cast("double")
        .alias("sflf"),
    )
    head = salted_topn(
        types,
        order=(F.desc("f"), F.asc("tok")),
        n=_ZIPF_HEAD,
        rank_name="r",
        part_cols=("lang",),
        salt_key="tok",
    )
    rd = F.col("r").cast("double")
    fits = head.groupBy("lang").agg(
        F.sum(F.when(F.col("r") <= _MASS_HEAD, F.col("f")).otherwise(0))
        .cast("bigint")
        .alias("mass_head"),
        F.regr_slope(F.log(fd), F.log(rd)).alias("slope"),
    )
    nt = F.col("n_tokens").cast("double")
    return stats.join(F.broadcast(fits), "lang").select(
        "lang",
        "n_tokens",
        "n_types",
        (F.round(F.col("n_types").cast("double") / nt, 6) + 0).alias(
            "type_token_ratio"
        ),
        (
            F.round(
                F.col("hapax_types").cast("double")
                / F.col("n_types").cast("double"),
                6,
            )
            + 0
        ).alias("hapax_frac"),
        (F.round(F.log2(nt) - F.col("sflf") / nt, 6) + 0).alias(
            "entropy_bits"
        ),
        (
            F.round(F.col("mass_head").cast("double") / nt, 6) + 0
        ).alias("top100_mass"),
        (F.round(F.col("slope"), 6) + 0).alias("zipf_slope"),
    )


_DOREMI_ETA = 1.0  # EG step size (Xie et al. 2023 use 1.0)

# Shared oracle CTE chain ending in `drw` = the final per-source weight
# table (w6 = the 6-dp weight both engines emit) — reused by
# x_doremi_weights and the x_doremi_resample consumer.
_DOREMI_CTES = """drdoc AS (
        SELECT d.source, k.n_grams,
               ROUND(k.s / k.n_grams, 6) AS kn_nll,
               ROUND(c.s / c.n_grams, 6) AS cc_nll
        FROM knscored k
        JOIN ccscored c ON k.doc_id = c.doc_id AND k.lang = c.lang
        JOIN documents d ON d.doc_id = k.doc_id
    ), drdom AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_grams) AS BIGINT) AS token_mass,
               CAST(SUM(CAST(cc_nll AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mcc,
               CAST(SUM(CAST(kn_nll AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mkn
        FROM drdoc GROUP BY source
    ), drtot AS (
        SELECT CAST(SUM(token_mass) AS BIGINT) AS tot_mass FROM drdom
    ), drex AS (
        SELECT source, n_docs, token_mass,
               CAST(token_mass AS DOUBLE) / CAST(tot_mass AS DOUBLE)
                   AS ref_share,
               greatest(ROUND(mcc, 6) - ROUND(mkn, 6), 0.0) AS excess
        FROM drdom, drtot
    ), drnum AS MATERIALIZED (
        -- referenced twice (drden + drw): materialize, or the inlined
        -- upstream corpus-sized LM chain evaluates twice
        SELECT *,
               CAST(ROUND(ref_share * exp({eta} * excess), 12)
                    AS DECIMAL(28,12)) AS num
        FROM drex
    ), drden AS (
        SELECT SUM(num) AS den FROM drnum
    ), drw AS (
        SELECT source, n_docs, token_mass, ref_share, excess,
               ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0
                   AS w6
        FROM drnum, drden
    )""".format(eta=_DOREMI_ETA)


@query(
    "x_doremi_weights",
    "WITH "
    + _KN_CTES_SQL.format(src="documents")
    + ", "
    + _CCNET_CTES_SQL.format(src="documents")
    + ", "
    + _DOREMI_CTES
    + """
    SELECT source, n_docs, token_mass,
           ROUND(ref_share, 6) + 0 AS ref_share,
           ROUND(excess, 6) + 0 AS excess,
           w6 AS weight
    FROM drw
    """,
    survey_ids=(
        "training-pipeline: DoReMi domain reweighting (Xie et al. 2023) "
        "— one exponentiated-gradient step w_i ∝ share_i·exp(η·excess_i) "
        "over per-source clipped excess loss between the engine's two "
        "fully-oracled trigram LMs (add-one proxy vs KN reference); "
        "weights themselves value-hash-checked"
    ),
)
def x_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain weights over `source` (see module docstring).

    Emits (source, n_docs, token_mass, ref_share, excess, weight),
    weight = EG update of the token-mass reference share by the clipped
    per-domain excess nll, normalized over domains.

    Scale shape: both LM scorers are broadcast-model map passes with one
    per-doc rollup each (the certified x_kn/x_ccnet plans); the two
    score frames and the corpus join on doc_id (one row per doc); the
    domain rollup reduces to |sources| rows, and the EG normalization
    is an aggregate over that bounded table joined back broadcast —
    nothing after the per-doc rollup is corpus-sized.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "source"
    )
    # Both LM scores from ONE gram explode + per-doc rollup
    # (knlm._kn_cc_scored, bit-equal to the standalone scorers by the
    # pinned golden): the twin _kn_scored + _ccnet_scored chains paid
    # the corpus explode twice plus a doc_id sort-merge join to zip
    # the score frames back together.
    per_doc = _kn_cc_scored(docs.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        "n_grams",
        F.round(F.col("kn_s") / F.col("n_grams"), 6).alias("kn_nll"),
        F.round(F.col("cc_s") / F.col("n_grams"), 6).alias("cc_nll"),
    ).join(docs.select("doc_id", "source"), "doc_id")
    dom = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("token_mass"),
        (
            F.sum(F.col("cc_nll").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mcc"),
        (
            F.sum(F.col("kn_nll").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mkn"),
        # Plan barrier at the |sources|-row neck (the per-round
        # localCheckpoint pattern, applied to the base table): the EG
        # tail references dom repeatedly (tot / ex / num / den, plus
        # x_doremi_resample's rate table) and each reference re-inlines
        # the corpus-sized twin-LM chain into the plan — 220 Exchange
        # nodes for x_doremi_weights, 300 for resample, before. Exchange
        # reuse dedupes most of the runtime re-execution but the
        # optimizer/codegen cost of the re-expanded plan is real
        # (measured ~1s/run at sf0.1), and the barrier collapses the
        # plans to one chain + bounded-table arithmetic (guide §3.3).
    ).localCheckpoint(eager=True)
    # EG tail as ONE plan over the checkpointed |sources| table: the
    # scalar aggregates (total mass, EG denominator) are global-window
    # sums instead of agg + crossJoin(broadcast) branches — same exact
    # values (bigint / decimal sums are order-independent), one
    # SinglePartition exchange shared by every window instead of two
    # broadcast-exchange jobs (guide §2.4; VERDICT r10 next-round #3).
    w_all = Window.partitionBy()
    ex = dom.select(
        "source",
        "n_docs",
        "token_mass",
        (
            F.col("token_mass").cast("double")
            / F.sum("token_mass").over(w_all).cast("double")
        ).alias("ref_share"),
        F.greatest(
            F.round(F.col("mcc"), 6) - F.round(F.col("mkn"), 6), F.lit(0.0)
        ).alias("excess"),
    )
    num = ex.withColumn(
        "num",
        F.round(
            F.col("ref_share") * F.exp(F.lit(_DOREMI_ETA) * F.col("excess")),
            12,
        ).cast("decimal(28,12)"),
    )
    return num.select(
        "source",
        "n_docs",
        "token_mass",
        (F.round(F.col("ref_share"), 6) + 0).alias("ref_share"),
        (F.round(F.col("excess"), 6) + 0).alias("excess"),
        (
            F.round(
                F.col("num").cast("double")
                / F.sum("num").over(w_all).cast("double"),
                6,
            )
            + 0
        ).alias("weight"),
    )


# --- Multi-round DoReMi (Xie 2023 Algorithm 1's iterated EG) -----------------
# The published algorithm iterates: per round the proxy trains a step
# under the current weights and the per-domain excess shifts. With the
# frozen LM pair the raw excess is constant, so iterating the raw EG
# step would collapse to one step at R·η; the iterated form therefore
# uses the REGRET-STYLE baseline from the same minimax objective: each
# round re-centers excess on the CURRENT-weight-weighted mean
# (a_i = max(excess_i − Σ_j w_j·excess_j, 0)) before the EG update —
# domains above the weighted average keep gaining weight, the baseline
# rises as mass concentrates, and the recurrence genuinely depends on
# every previous round. Swapping a real re-trained proxy in replaces
# only the constant excess column with a per-round one.

_DOREMI_ROUNDS = 4


def _doremi_rounds_ctes(rounds: int) -> str:
    """R rounds of the baseline-re-centered EG recurrence as CTEs over
    drex (source, n_docs, token_mass, ref_share, excess) — all
    |sources|-sized. Numeric discipline per round: the baseline is a
    12-dp-rounded DECIMAL sum (order-independent), the adjusted excess
    is rounded to 9 dp before exp(), numerators round to 12 dp into a
    DECIMAL(28,12) sum, the new weight rounds to 6 dp — so a 1-ulp
    cross-engine exp()/mul difference cannot flip any stored digit.

    Every dr{{t}} is MATERIALIZED: each round references the previous
    round TWICE (baseline + numerator), so inlined CTEs would re-expand
    the whole upstream corpus-sized LM chain 2^R times — materializing
    pins the recurrence to R evaluations of a |sources|-row table (the
    Spark twin localCheckpoints each round for the same reason)."""
    parts = [
        "dr0 AS MATERIALIZED (SELECT source, n_docs, token_mass, ref_share,"
        " excess, ROUND(ref_share, 6) + 0 AS w FROM drex)"
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f"""drb{t} AS (
        SELECT CAST(SUM(CAST(ROUND(w * excess, 12) AS DECIMAL(28,12)))
                    AS DOUBLE) AS b
        FROM dr{p}
    ), drn{t} AS (
        SELECT d.*,
               CAST(ROUND(w * exp({_DOREMI_ETA}
                        * ROUND(greatest(excess - b, 0.0), 9)), 12)
                    AS DECIMAL(28,12)) AS num
        FROM dr{p} d, drb{t}
    ), drd{t} AS (
        SELECT SUM(num) AS den FROM drn{t}
    ), dr{t} AS MATERIALIZED (
        SELECT source, n_docs, token_mass, ref_share, excess,
               ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0 AS w
        FROM drn{t}, drd{t}
    )"""
        )
    return ", ".join(parts)


@query(
    "x_doremi_weights_multiround",
    "WITH "
    + _KN_CTES_SQL.format(src="documents")
    + ", "
    + _CCNET_CTES_SQL.format(src="documents")
    + ", "
    + _DOREMI_CTES
    + ", "
    + _doremi_rounds_ctes(_DOREMI_ROUNDS)
    + f"""
    SELECT f.source, f.n_docs, f.token_mass,
           ROUND(f.ref_share, 6) + 0 AS ref_share,
           ROUND(f.excess, 6) + 0 AS excess,
           r1.w AS weight_r1,
           f.w AS weight
    FROM dr{_DOREMI_ROUNDS} f JOIN dr1 r1 USING (source)
    """,
    survey_ids=(
        "training-pipeline: MULTI-ROUND DoReMi (Xie et al. 2023 Alg. 1) "
        "— the EG step iterated with a per-round current-weight "
        "baseline over the frozen excess table; every round's decimal "
        "recurrence value-hash-checked (the corpus-sized nll rollup "
        "computes ONCE; rounds touch only |sources|-sized tables)"
    ),
)
def x_doremi_weights_multiround(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated DoReMi weights: (source, n_docs, token_mass, ref_share,
    excess, weight_r1, weight) — weight after {_DOREMI_ROUNDS} rounds of
    the baseline-re-centered EG recurrence (see the block comment above
    for why the baseline, not the raw excess, is what iterates).

    Scale shape: identical to x_doremi_weights up to the domain table —
    both LM scorings are the certified broadcast-model map passes, ONE
    per-doc rollup each, computed ONCE — then every round is arithmetic
    over the |sources|-row frame with two broadcast scalar aggregates;
    R never touches the corpus again."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "source"
    )
    # Both LM scores from ONE gram explode + per-doc rollup
    # (knlm._kn_cc_scored, bit-equal to the standalone scorers by the
    # pinned golden): the twin _kn_scored + _ccnet_scored chains paid
    # the corpus explode twice plus a doc_id sort-merge join to zip
    # the score frames back together.
    per_doc = _kn_cc_scored(docs.select("doc_id", "lang", "text")).select(
        "doc_id",
        "lang",
        "n_grams",
        F.round(F.col("kn_s") / F.col("n_grams"), 6).alias("kn_nll"),
        F.round(F.col("cc_s") / F.col("n_grams"), 6).alias("cc_nll"),
    ).join(docs.select("doc_id", "source"), "doc_id")
    dom = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").cast("bigint").alias("token_mass"),
        (
            F.sum(F.col("cc_nll").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mcc"),
        (
            F.sum(F.col("kn_nll").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mkn"),
        # Plan barrier at the |sources|-row neck (the per-round
        # localCheckpoint pattern, applied to the base table): the EG
        # tail references dom repeatedly (tot / ex / num / den, plus
        # x_doremi_resample's rate table) and each reference re-inlines
        # the corpus-sized twin-LM chain into the plan — 220 Exchange
        # nodes for x_doremi_weights, 300 for resample, before. Exchange
        # reuse dedupes most of the runtime re-execution but the
        # optimizer/codegen cost of the re-expanded plan is real
        # (measured ~1s/run at sf0.1), and the barrier collapses the
        # plans to one chain + bounded-table arithmetic (guide §3.3).
    ).localCheckpoint(eager=True)
    # The EG recurrence as ONE plan over the checkpointed |sources|
    # table (guide §2.4; VERDICT r10 next-round #3). The per-round
    # eager localCheckpoints existed to stop each round's TWO
    # references to the previous round (baseline + numerator)
    # re-expanding the corpus-sized LM chain 2^R times — but with the
    # chain already pinned behind `dom`'s barrier, every round is pure
    # |sources|-row arithmetic rooted at the checkpoint scan, and
    # chained withColumns reference the previous round's COLUMN (an
    # attribute, not an inlined subtree), so the plan stays linear: one
    # SinglePartition exchange + 2 Window nodes per round, zero extra
    # jobs. The scalar aggregates are global-window DECIMAL sums —
    # order-independent, bit-equal to the agg + crossJoin(broadcast)
    # form they replace.
    w_all = Window.partitionBy()
    cur = dom.select(
        "source",
        "n_docs",
        "token_mass",
        (
            F.col("token_mass").cast("double")
            / F.sum("token_mass").over(w_all).cast("double")
        ).alias("ref_share"),
        F.greatest(
            F.round(F.col("mcc"), 6) - F.round(F.col("mkn"), 6), F.lit(0.0)
        ).alias("excess"),
    ).withColumn("w", F.round(F.col("ref_share"), 6) + 0)
    for t in range(1, _DOREMI_ROUNDS + 1):
        b = (
            F.sum(
                F.round(F.col("w") * F.col("excess"), 12).cast(
                    "decimal(28,12)"
                )
            )
            .over(w_all)
            .cast("double")
        )
        cur = cur.withColumn(
            "num",
            F.round(
                F.col("w")
                * F.exp(
                    F.lit(_DOREMI_ETA)
                    * F.round(
                        F.greatest(F.col("excess") - b, F.lit(0.0)), 9
                    )
                ),
                12,
            ).cast("decimal(28,12)"),
        )
        cur = cur.withColumn(
            "w",
            F.round(
                F.col("num").cast("double")
                / F.sum("num").over(w_all).cast("double"),
                6,
            )
            + 0,
        ).drop("num")
        if t == 1:
            cur = cur.withColumn("weight_r1", F.col("w"))
    return cur.select(
        "source",
        "n_docs",
        "token_mass",
        (F.round(F.col("ref_share"), 6) + 0).alias("ref_share"),
        (F.round(F.col("excess"), 6) + 0).alias("excess"),
        "weight_r1",
        F.col("w").alias("weight"),
    )


@query(
    "x_readability",
    f"""
    WITH rdoc AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '[.!?]+')) AS raw_sent,
               list_filter({_TOKS_DUCK}, w -> regexp_matches(w, '[a-z]'))
                   AS words
        FROM documents
    ), rst AS (
        SELECT doc_id,
               CAST(greatest(raw_sent, 1) AS BIGINT) AS n_sentences,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum(list_transform(words,
                    w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')),
                                  1))), 0) AS BIGINT) AS n_syllables
        FROM rdoc
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CASE WHEN n_words = 0 THEN NULL ELSE
               ROUND(0.39 * (CAST(n_words AS DOUBLE)
                             / CAST(n_sentences AS DOUBLE))
                     + 11.8 * (CAST(n_syllables AS DOUBLE)
                               / CAST(n_words AS DOUBLE))
                     - 15.59, 6) + 0 END AS fk_grade,
           CASE WHEN n_words = 0 THEN NULL ELSE
               ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE)
                                        / CAST(n_sentences AS DOUBLE))
                     - 84.6 * (CAST(n_syllables AS DOUBLE)
                               / CAST(n_words AS DOUBLE)), 6) + 0 END
               AS reading_ease
    FROM rst
    """,
    survey_ids=(
        "training-pipeline: readability scoring — Flesch-Kincaid grade "
        "+ Flesch reading ease (Kincaid et al. 1975) from letter-word, "
        "sentence-run and vowel-group syllable counts; the classic "
        "document-difficulty feature quality classifiers consume; full "
        "value-hash oracle (all-integer counts, one rounded linear "
        "combination)"
    ),
)
def x_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability: (doc_id, n_words, n_sentences,
    n_syllables, fk_grade, reading_ease). Words = whitespace tokens
    containing a letter; sentences = [.!?]+ runs (min 1); syllables =
    vowel groups per word (min 1/word) — the standard heuristic
    implementation of the published formulas. Letterless docs emit
    counts with NULL grades.

    Scale shape: map-only (one regexp pass per doc, aggregates fold
    over the in-row token array) — no shuffle at all; composes with
    x_quality_bins / x_gopher_rules as another per-doc feature.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    words = F.filter(
        textan.tokens(t), lambda w: w.rlike("[a-z]")
    )
    base = docs.select(
        "doc_id",
        F.greatest(
            F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0))),
            F.lit(1),
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            words,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc
            + F.greatest(
                F.size(
                    F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))
                ),
                F.lit(1),
            ).cast("bigint"),
        ).alias("n_syllables"),
    )
    wd = F.col("n_words").cast("double")
    st = F.col("n_sentences").cast("double")
    sy = F.col("n_syllables").cast("double")
    fk = F.round(
        F.lit(0.39) * (wd / st) + F.lit(11.8) * (sy / wd) - F.lit(15.59), 6
    ) + 0
    ease = F.round(
        F.lit(206.835) - F.lit(1.015) * (wd / st) - F.lit(84.6) * (sy / wd),
        6,
    ) + 0
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(fk)
        .alias("fk_grade"),
        F.when(F.col("n_words") == 0, F.lit(None).cast("double"))
        .otherwise(ease)
        .alias("reading_ease"),
    )


@query(
    "x_doremi_resample",
    "WITH "
    + _KN_CTES_SQL.format(src="documents")
    + ", "
    + _CCNET_CTES_SQL.format(src="documents")
    + ", "
    + _DOREMI_CTES
    + """, drrates AS (
        SELECT source,
               ROUND(w6 * CAST(tot_mass AS DOUBLE)
                     / CAST(token_mass AS DOUBLE), 6) AS rate
        FROM drw CROSS JOIN drtot
    )
    SELECT d.doc_id, d.source, r.rate AS sample_rate,
           CAST(FLOOR(r.rate) AS BIGINT)
               + CASE WHEN CAST(concat('0x',
                               substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 1000000
                       < CAST(ROUND((r.rate - FLOOR(r.rate)) * 1000000)
                              AS BIGINT)
                      THEN 1 ELSE 0 END AS n_copies
    FROM documents d JOIN drrates r ON d.source = r.source
    """,
    survey_ids=(
        "training-pipeline: DoReMi mixture APPLIED — per-source resample "
        "rate w_i·T/mass_i from the EG weights, per-doc deterministic "
        "copy count (floor + hash-Bernoulli, the x_temperature_resample "
        "law) — closes the reweight->resample loop end-to-end with a "
        "full value-hash oracle"
    ),
)
def x_doremi_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the DoReMi weights as a resampling plan: source i's
    expected share of the resampled corpus token mass is w_i, via
    per-source rate w_i·T/mass_i and the engine's deterministic
    floor+hash-Bernoulli copy count (n_copies=0 drops, >=2 repeats —
    x_temperature_resample's semantics keyed on source with the EG
    weights instead of the temperature law).

    Scale shape: the rate table is |sources| rows riding the (already
    bounded) weights pipeline; the corpus is scanned once map-side
    with a broadcast join; no shuffle of document data at all beyond
    the weight pipeline's own rollups.
    """
    w = x_doremi_weights(spark, sf_dir)
    # Total mass as a global-window sum: one plan, no second reference
    # to the weights pipeline and no broadcast-exchange branch (exact
    # bigint sum — value-identical to the agg + crossJoin form).
    rates = w.select(
        "source",
        F.round(
            F.col("weight")
            * F.sum("token_mass").over(Window.partitionBy()).cast("double")
            / F.col("token_mass").cast("double"),
            6,
        ).alias("rate"),
    )
    docs = load_table(spark, sf_dir, "documents")
    u6 = (
        F.expr("conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)")
        .cast("bigint")
        % 1000000
    )
    thresh = F.round((F.col("rate") - F.floor("rate")) * 1000000).cast(
        "bigint"
    )
    return docs.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        F.col("rate").alias("sample_rate"),
        (
            F.floor("rate").cast("bigint")
            + F.when(u6 < thresh, 1).otherwise(0)
        ).alias("n_copies"),
    )


_VOCAB_HEAD = 100  # types per source in the overlap comparison


@query(
    "x_vocab_overlap",
    f"""
    WITH vot AS (
        SELECT source, unnest({{toks}}) AS tok FROM documents
    ), voty AS (
        SELECT source, tok, COUNT(*) AS f FROM vot GROUP BY source, tok
    ), vork AS (
        SELECT source, tok,
               row_number() OVER (PARTITION BY source
                                  ORDER BY f DESC, tok ASC) AS r
        FROM voty
    ), vohd AS (
        SELECT source, tok FROM vork WHERE r <= {_VOCAB_HEAD}
    ), vosz AS (
        SELECT source, COUNT(*) AS n FROM vohd GROUP BY source
    ), voov AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_shared
        FROM vohd a JOIN vohd b
          ON a.tok = b.tok AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT o.source_a, o.source_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(o.n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(o.n_shared AS DOUBLE)
                 / CAST(sa.n + sb.n - o.n_shared AS DOUBLE), 6) + 0
               AS jaccard
    FROM voov o
    JOIN vosz sa ON sa.source = o.source_a
    JOIN vosz sb ON sb.source = o.source_b
    """.format(toks=_TOKS_DUCK),
    survey_ids=(
        "training-pipeline: cross-source vocabulary-overlap matrix — "
        "Jaccard of each source pair's top-100 frequency heads (salted "
        "two-phase rank per source, bounded |sources|^2 output) — the "
        "domain-similarity diagnostic mixture design and dedup scoping "
        "consume; full value-hash oracle"
    ),
)
def x_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources: for every source
    pair (a < b), the sizes of each side's top-100 frequency
    head, the shared-type count and the Jaccard similarity. Near-1
    pairs are mixture-redundant (and prime cross-source dedup
    candidates); near-0 pairs add coverage.

    Scale shape: one (source, tok) type-table shuffle (partial-agg
    combine); the rank touches only salted-top-100 survivors
    per source (no vocab-wide per-source window); everything after is
    a |sources|x100-row table self-joined on tok — bounded at
    any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(textan.tokens(F.col("text"))).alias("tok")
    )
    types = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("f"))
    head = salted_topn(
        types,
        order=(F.desc("f"), F.asc("tok")),
        n=_VOCAB_HEAD,
        rank_name="r",
        part_cols=("source",),
        salt_key="tok",
    ).select("source", "tok")
    sz = head.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = head.select(F.col("source").alias("source_a"), "tok")
    b = head.select(F.col("source").alias("source_b"), "tok")
    ov = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        ov.join(
            F.broadcast(sz.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sz.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            (
                F.round(
                    F.col("n_shared").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                        "double"
                    ),
                    6,
                )
                + 0
            ).alias("jaccard"),
        )
    )


@query(
    "x_bigram_entropy",
    f"""
    WITH bet AS (
        SELECT doc_id, lang, {_TOKS_DUCK} AS toks FROM documents
    ), bep AS (
        SELECT lang, toks[CAST(i AS INTEGER)] AS a,
               toks[CAST(i AS INTEGER) + 1] AS b
        FROM bet,
             unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS u(i)
        WHERE toks[CAST(i AS INTEGER) + 1] IS NOT NULL
    ), bec AS (
        SELECT lang, a, b, COUNT(*) AS c FROM bep GROUP BY lang, a, b
    ), bectx AS (
        SELECT lang, a, CAST(SUM(c) AS BIGINT) AS ca FROM bec
        GROUP BY lang, a
    ), beterm AS (
        SELECT bec.lang, bec.c,
               CAST(ROUND(CAST(bec.c AS DOUBLE)
                          * log2(CAST(bectx.ca AS DOUBLE)
                                 / CAST(bec.c AS DOUBLE)), 7)
                    AS DECIMAL(28,9)) AS term
        FROM bec JOIN bectx ON bec.lang = bectx.lang AND bec.a = bectx.a
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) + 0
               AS bigram_ttr,
           ROUND(CAST(SUM(term) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) + 0
               AS cond_entropy_bits
    FROM beterm GROUP BY lang
    """,
    survey_ids=(
        "training-pipeline: per-language bigram conditional entropy "
        "H(next|prev) + bigram type/token ratio — the standard "
        "repetitiveness/diversity diagnostic next to x_zipf_entropy's "
        "unigram stats; per-bigram terms rounded 7 dp and DECIMAL-summed "
        "(order-independent), full value-hash oracle"
    ),
)
def x_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language H(next token | previous token) over within-document
    bigrams, plus bigram counts and type/token ratio: low conditional
    entropy = templated/repetitive text (boilerplate-heavy sources),
    high = diverse text. H = (1/N)·Σ c(ab)·log2(c(a·)/c(ab)), all
    counts exact integers, terms rounded to 7 dp and summed as
    DECIMAL(28,9) — order-independent and 1-ulp-log-proof (the
    x_zipf_entropy posture).

    Scale shape: the bigram explode is map-side; the (lang, a, b) type
    table is the one corpus-sized shuffle (partial-agg combine); the
    context rollup and the term join operate on TYPE tables keyed
    (lang, a) — co-partitioned aggregates, never corpus rows; the final
    per-lang rollup is bounded.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = textan.tokens(F.col("text"))
    pairs = F.expr(
        "filter(transform(sequence(1, greatest(size(__toks) - 1, 1)),"
        " i -> struct(element_at(__toks, i) as a,"
        " element_at(__toks, i + 1) as b)), p -> p.b is not null)"
    )
    bep = (
        docs.withColumn("__toks", toks)
        .select("lang", F.explode(pairs).alias("p"))
        .select("lang", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    bec = bep.groupBy("lang", "a", "b").agg(F.count(F.lit(1)).alias("c"))
    bectx = bec.groupBy("lang", "a").agg(F.sum("c").cast("bigint").alias("ca"))
    term = F.round(
        F.col("c").cast("double")
        * F.log2(F.col("ca").cast("double") / F.col("c").cast("double")),
        7,
    ).cast("decimal(28,9)")
    beterm = bec.join(bectx, ["lang", "a"]).select("lang", "c", term.alias("term"))
    nb = F.sum("c").cast("bigint")
    return beterm.groupBy("lang").agg(
        nb.alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"),
        (
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6
            )
            + 0
        ).alias("bigram_ttr"),
        (
            F.round(
                F.sum("term").cast("double") / F.sum("c").cast("double"), 6
            )
            + 0
        ).alias("cond_entropy_bits"),
    )
