"""Classical statistical tests as distributed aggregates (SURVEY §2B.13
extension): chi-square independence, Mann–Whitney U, one-way ANOVA, and
Kaplan–Meier survival — the experiment-analysis battery that sits next to
`analytics_ab_ttest` (Welch t) and `agg_ks_test` (distribution drift).

Every test here follows the same two determinism disciplines the t/KS pair
established (SURVEY §5.4):

- **exact integer partials**: the shuffled aggregates carry counts and
  cent-quantized sums (int64), never floats, so map-side combine order
  cannot change a bit;
- **quantize-then-sum for cross-row float terms**: where the statistic
  needs a sum of per-row float terms (chi-square cell contributions,
  Kaplan–Meier log-survival increments, ANOVA per-group sx²/n), each term
  is computed from exact ints by an expression written identically in both
  engines, rounded to a fixed integer grid (1e6/1e9/1e3), and only the
  resulting INTEGERS are summed — so neither Spark's combine order nor
  DuckDB's segment-tree window evaluation can produce a last-bit
  divergence. The quantization error is bounded by #terms × half-ulp of
  the grid, orders of magnitude below the reported rounding.

Scale shape (100 TB): every test collapses the fact table with ONE
map-side-combining hash aggregate (per cell / per distinct value / per
group / per user); all subsequent algebra runs on a domain-bounded
relation (#types × #cohorts cells, value-domain support, #groups,
#distinct-durations) exactly like `agg_ks_test`'s support-collapse, with
grand totals entering as broadcast one-row aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gvcf_hbase_spark.functions.ranks import attach_two_phase_cumsum
from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table

_CHI_SQUARE_ORACLE = """
    WITH t AS (
      SELECT event_type,
             TRY_CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) % 2 AS grp
      FROM events
      WHERE TRY_CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) IS NOT NULL
    ),
    cells AS (SELECT event_type, grp, count(*) AS o FROM t GROUP BY 1, 2),
    rt AS (SELECT event_type, count(*) AS r FROM t GROUP BY 1),
    ct AS (SELECT grp, count(*) AS c FROM t GROUP BY 1),
    n AS (SELECT count(*) AS n FROM t),
    frame AS (
      SELECT rt.event_type, ct.grp, rt.r, ct.c,
             COALESCE(cells.o, 0) AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN cells ON cells.event_type = rt.event_type AND cells.grp = ct.grp
    ),
    contrib AS (
      SELECT f.event_type, f.grp,
             CAST(floor(
               (f.o - CAST(f.r AS DOUBLE) * f.c / n.n)
               * (f.o - CAST(f.r AS DOUBLE) * f.c / n.n)
               / (CAST(f.r AS DOUBLE) * f.c / n.n) * 1e6 + 0.5
             ) AS BIGINT) AS contrib_1e6
      FROM frame f CROSS JOIN n
    )
    SELECT CAST(n.n AS BIGINT) AS n,
           CAST(count(DISTINCT c.event_type) AS BIGINT) AS n_types,
           CAST(count(DISTINCT c.grp) AS BIGINT) AS n_grps,
           CAST((count(DISTINCT c.event_type) - 1)
                * (count(DISTINCT c.grp) - 1) AS BIGINT) AS dof,
           CAST(sum(c.contrib_1e6) AS BIGINT) AS chi2_1e6
    FROM contrib c CROSS JOIN n
    GROUP BY n.n
"""


@register("analytics_chi_square", oracle=_CHI_SQUARE_ORACLE, tags=("analytics", "stats"))
def analytics_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    the A/B cohort (even/odd property key — the same assignment
    `analytics_ab_ttest` uses): χ² = Σ (O−E)²/E over the completed
    type × cohort contingency table, with zero-observed cells included
    (their contribution is E, which a groupBy alone would drop).

    Plan: one hash aggregate per marginal (cells, row totals, column
    totals — each map-side combining, each shuffling only its key), a
    ≤|types|×|cohorts| zero-cell completion (the type dim crossed with
    the ≤2-row broadcast cohort dim), and the grand total entering as a
    broadcast one-row aggregate. Per-cell contributions are computed
    from exact integer (o, r, c, n) by an expression identical in both
    engines, quantized to 1e-6, and summed as integers — the
    quantize-then-sum discipline in the module docstring, so χ² is
    bit-reproducible. dof = (R−1)(C−1) from the observed marginals."""
    ev = load_table(spark, sf_dir, "events")
    grp = (F.regexp_extract("props", r"(\d+)", 1).try_cast("bigint") % 2).alias("grp")
    t = ev.select("event_type", grp).filter(F.col("grp").isNotNull())
    cells = t.groupBy("event_type", "grp").agg(F.count("*").alias("o"))
    rt = t.groupBy("event_type").agg(F.count("*").alias("r"))
    ct = t.groupBy("grp").agg(F.count("*").alias("c"))
    n = t.agg(F.count("*").alias("n"))
    frame = (
        rt.crossJoin(F.broadcast(ct))
        .join(cells, ["event_type", "grp"], "left")
        .select("event_type", "grp", "r", "c", F.coalesce("o", F.lit(0)).alias("o"))
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    contrib = frame.crossJoin(F.broadcast(n)).select(
        "n",
        "event_type",
        "grp",
        F.floor((F.col("o") - e) * (F.col("o") - e) / e * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("contrib_1e6"),
    )
    return contrib.groupBy("n").agg(
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.countDistinct("grp").cast("bigint").alias("n_grps"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("grp") - 1)
        ).cast("bigint").alias("dof"),
        F.sum("contrib_1e6").cast("bigint").alias("chi2_1e6"),
    ).select("n", "n_types", "n_grps", "dof", "chi2_1e6")


_MANN_WHITNEY_ORACLE = """
    WITH sides AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             event_type = 'click' AS is_x
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pts AS (
      SELECT v,
             count(*) FILTER (is_x) AS n1x,
             count(*) FILTER (NOT is_x) AS n2x
      FROM sides GROUP BY v
    ),
    cum AS (
      SELECT v, n1x, n2x, n1x + n2x AS t_here,
             sum(n1x + n2x) OVER (ORDER BY v) AS cumall
      FROM pts
    ),
    parts AS (
      SELECT sum(n1x) AS n1, sum(n2x) AS n2,
             sum(n1x * (2 * (cumall - t_here) + t_here + 1)) AS r2_doubled,
             sum(t_here * t_here * t_here - t_here) AS tie_term
      FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(r2_doubled - n1 * (n1 + 1) AS BIGINT) AS u_doubled,
           CAST(tie_term AS BIGINT) AS tie_term,
           CASE WHEN
             n1 * n2 / 12.0 * ((n1 + n2 + 1)
               - CAST(tie_term AS DOUBLE)
                 / ((n1 + n2) * (n1 + n2 - 1.0))) > 0
           THEN CAST(floor(
             (r2_doubled - n1 * (n1 + 1) - n1 * n2)
             / (2 * sqrt(n1 * n2 / 12.0 * ((n1 + n2 + 1)
                 - CAST(tie_term AS DOUBLE)
                   / ((n1 + n2) * (n1 + n2 - 1.0))))) * 1e4 + 0.5
           ) AS BIGINT) END AS z_1e4
    FROM parts
"""


@register("analytics_mann_whitney", oracle=_MANN_WHITNEY_ORACLE, tags=("analytics", "stats"))
def analytics_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the click and view value distributions —
    the rank-sum test an analyst reaches for when `analytics_ab_ttest`'s
    normality assumption is off, with the exact tie-corrected normal
    approximation z.

    Exactness: both samples collapse to per-distinct-cent counts first
    (map-side combine, support bounded by the value DOMAIN), then the
    integer cumulative count over the support comes from the TWO-PHASE
    cumsum (functions/ranks.py): a keyed window inside cent-value
    buckets plus a broadcast join of per-bucket prefix totals — no
    single-partition window ever sees the support relation, so a wide
    value domain at 100× costs one more bucket, not one task. The tie
    block at value v occupies ranks before+1 … before+t, so
    2·R₁ = Σ n1ᵥ·(2·before + t + 1) — pure int64 (the doubling clears
    the ½ of the average rank; U is reported doubled for the same
    reason). The tie-correction term Σ(t³−t) is an integer sum. Only
    the final z divides/roots, computed from exact ints in one
    identical expression per engine; a degenerate zero variance (all
    values tied) yields NULL on both sides rather than an ANSI
    divide-by-zero."""
    ev = load_table(spark, sf_dir, "events")
    sides = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        (F.col("event_type") == "click").alias("is_x"),
    )
    pts = sides.groupBy("v").agg(
        F.sum(F.when(F.col("is_x"), 1).otherwise(0)).alias("n1x"),
        F.sum(F.when(~F.col("is_x"), 1).otherwise(0)).alias("n2x"),
    )
    cum = attach_two_phase_cumsum(
        pts.withColumn("t_here", F.col("n1x") + F.col("n2x")),
        [F.col("v")],
        F.floor(F.col("v") / 1000),  # per-$10 cent buckets, monotone in v
        {"t_here": "cumall"},
    ).select("v", "n1x", "n2x", "t_here", "cumall")
    parts = cum.agg(
        F.sum("n1x").alias("n1"),
        F.sum("n2x").alias("n2"),
        F.sum(
            F.col("n1x")
            * (2 * (F.col("cumall") - F.col("t_here")) + F.col("t_here") + 1)
        ).alias("r2_doubled"),
        F.sum(
            F.col("t_here") * F.col("t_here") * F.col("t_here") - F.col("t_here")
        ).alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u_doubled = F.col("r2_doubled") - n1 * (n1 + 1)
    var = (
        n1 * n2 / F.lit(12.0)
        * ((n1 + n2 + 1) - F.col("tie_term").cast("double") / ((n1 + n2) * (n1 + n2 - F.lit(1.0))))
    )
    z = (u_doubled - n1 * n2) / (2 * F.sqrt(var))
    return parts.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        u_doubled.cast("bigint").alias("u_doubled"),
        F.col("tie_term").cast("bigint").alias("tie_term"),
        F.when(var > 0, F.floor(z * 1e4 + F.lit(0.5)).cast("bigint")).alias("z_1e4"),
    )


_ANOVA_ORACLE = """
    WITH t AS (
      SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x FROM events
    ),
    g AS (
      SELECT event_type, count(*) AS ng, sum(x) AS sx, sum(x * x) AS sxx
      FROM t GROUP BY event_type
    ),
    q AS (
      SELECT ng, sx, sxx,
             CAST(floor(CAST(sx AS DOUBLE) * sx / ng * 1000 + 0.5) AS BIGINT)
               AS q_1e3
      FROM g
    ),
    tot AS (
      SELECT count(*) AS k, sum(ng) AS n, sum(sx) AS s_all,
             sum(sxx) AS sxx_all, sum(q_1e3) AS sq_1e3
      FROM q
    ),
    ss AS (
      SELECT k, n,
             sq_1e3 - CAST(floor(CAST(s_all AS DOUBLE) * s_all / n * 1000 + 0.5)
                           AS BIGINT) AS ssb_1e3,
             sxx_all * 1000 - sq_1e3 AS ssw_1e3
      FROM tot
    )
    SELECT CAST(k AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n,
           CAST(ssb_1e3 AS BIGINT) AS ss_between_1e3,
           CAST(ssw_1e3 AS BIGINT) AS ss_within_1e3,
           CASE WHEN k > 1 AND n > k AND ssw_1e3 > 0 THEN
             CAST(floor(
               (CAST(ssb_1e3 AS DOUBLE) / (k - 1))
               / (CAST(ssw_1e3 AS DOUBLE) / (n - k)) * 1e4 + 0.5
             ) AS BIGINT) END AS f_stat_1e4
    FROM ss
"""


@register("analytics_anova", oracle=_ANOVA_ORACLE, tags=("analytics", "stats"))
def analytics_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of event value (cents) across event
    types — does the mean differ across k groups, the k-arm
    generalization of `analytics_ab_ttest`.

    Partials are the textbook sufficient statistics — per-group
    (n, Σx, Σx²), exact int64 on cents — gathered by ONE map-side-
    combining aggregate; everything after runs on the ≤|types|-row
    relation. The one cross-group float, Σ sx²/n (the between-groups
    building block), is quantized per group to 1e-3 and summed as
    integers (quantize-then-sum; error ≤ k·5e-4, invisible at the 1e4
    rounding of F), making SSB/SSW and F bit-reproducible. Degenerate
    inputs (one group, zero within-group variance) yield NULL F on both
    sides instead of an ANSI divide-by-zero — the `anomaly_mad` lesson."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("bigint").alias("x")
    )
    g = t.groupBy("event_type").agg(
        F.count("*").alias("ng"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    q = g.select(
        "ng",
        "sx",
        "sxx",
        F.floor(F.col("sx").cast("double") * F.col("sx") / F.col("ng") * 1000 + F.lit(0.5))
        .cast("bigint")
        .alias("q_1e3"),
    )
    tot = q.agg(
        F.count("*").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sx").alias("s_all"),
        F.sum("sxx").alias("sxx_all"),
        F.sum("q_1e3").alias("sq_1e3"),
    )
    k, n = F.col("k"), F.col("n")
    ssb = F.col("sq_1e3") - F.floor(
        F.col("s_all").cast("double") * F.col("s_all") / n * 1000 + F.lit(0.5)
    ).cast("bigint")
    ssw = F.col("sxx_all") * 1000 - F.col("sq_1e3")
    ss = tot.select(k.alias("k"), n.alias("n"), ssb.alias("ssb_1e3"), ssw.alias("ssw_1e3"))
    f = (F.col("ssb_1e3").cast("double") / (F.col("k") - 1)) / (
        F.col("ssw_1e3").cast("double") / (F.col("n") - F.col("k"))
    )
    return ss.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n").cast("bigint").alias("n"),
        F.col("ssb_1e3").cast("bigint").alias("ss_between_1e3"),
        F.col("ssw_1e3").cast("bigint").alias("ss_within_1e3"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (F.col("ssw_1e3") > 0),
            F.floor(f * 1e4 + F.lit(0.5)).cast("bigint"),
        ).alias("f_stat_1e4"),
    )


_KM_DAY_US = 86_400_000_000

_KM_ORACLE = f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events
    ),
    u AS (
      SELECT user_id, min(t) AS t0,
             min(t) FILTER (event_type = 'purchase') AS tp,
             max(t) AS tend
      FROM ev GROUP BY user_id
    ),
    dur AS (
      SELECT (COALESCE(tp, tend) - t0) // {_KM_DAY_US} AS duration_days,
             tp IS NOT NULL AS is_event
      FROM u
    ),
    pts AS (
      SELECT duration_days,
             count(*) FILTER (is_event) AS d,
             count(*) FILTER (NOT is_event) AS c
      FROM dur GROUP BY duration_days
    ),
    ntot AS (SELECT count(*) AS n_users FROM u),
    risk AS (
      SELECT duration_days, d, c,
             ntot.n_users
               - (sum(d + c) OVER (ORDER BY duration_days) - (d + c)) AS n_risk
      FROM pts CROSS JOIN ntot
    ),
    terms AS (
      SELECT duration_days, d, c, n_risk,
             CASE WHEN d = 0 THEN 0
                  WHEN n_risk > d THEN CAST(floor(
                    ln((n_risk - d) / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5
                  ) AS BIGINT)
                  ELSE -60000000000 END AS term_1e9
      FROM risk
    ),
    surv AS (
      SELECT duration_days, d, c, n_risk,
             sum(term_1e9) OVER (ORDER BY duration_days) AS cum_1e9
      FROM terms
    )
    SELECT CAST(duration_days AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           CAST(floor(exp(cum_1e9 / 1e9) * 1e6 + 0.5) AS BIGINT) AS survival_1e6
    FROM surv WHERE d > 0
"""


@register("analytics_survival_km", oracle=_KM_ORACLE, tags=("analytics", "stats"))
def analytics_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase: each
    user's clock starts at their first event; users who never purchase
    are right-censored at their last observed event — the
    time-to-conversion / time-to-churn estimator, with censoring
    handled properly instead of dropped.

    Plan: one per-user aggregate (min / conditional-min / max — exact
    int64 µs), a map-side day quantization, then one aggregate onto the
    distinct-duration support relation; the at-risk counts come from an
    integer cumulative window over that domain-bounded relation (the
    `agg_ks_test` support-collapse shape) with the user total as a
    broadcast one-row aggregate. The survival product Π(1−dᵢ/nᵢ) is
    computed as exp of a cumulative sum of per-step log terms quantized
    to 1e-9 (quantize-then-sum: integer cumsum, so DuckDB's segment-tree
    window and Spark's running sum cannot diverge); a step that
    exhausts the risk set (n=d, true S=0) uses a −60 log sentinel that
    underflows exp to 0 at the 1e6 rounding instead of ln(0)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts_us_long").alias("t")
    )
    u = ev.groupBy("user_id").agg(
        F.min("t").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("t"))).alias("tp"),
        F.max("t").alias("tend"),
    )
    dur = u.select(
        F.expr(f"(coalesce(tp, tend) - t0) div {_KM_DAY_US}").alias("duration_days"),
        F.col("tp").isNotNull().alias("is_event"),
    )
    pts = dur.groupBy("duration_days").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(~F.col("is_event"), 1).otherwise(0)).alias("c"),
    )
    ntot = u.agg(F.count("*").alias("n_users"))
    w = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dc = F.col("d") + F.col("c")
    risk = pts.crossJoin(F.broadcast(ntot)).select(
        "duration_days",
        "d",
        "c",
        (F.col("n_users") - (F.sum(dc).over(w) - dc)).alias("n_risk"),
    )
    term = (
        F.when(F.col("d") == 0, F.lit(0).cast("bigint"))
        .when(
            F.col("n_risk") > F.col("d"),
            F.floor(
                F.log((F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double"))
                * 1e9
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(-60_000_000_000))
    )
    terms = risk.select("duration_days", "d", "c", "n_risk", term.alias("term_1e9"))
    surv = terms.select(
        "duration_days",
        "d",
        "c",
        "n_risk",
        F.sum("term_1e9").over(w).alias("cum_1e9"),
    )
    return surv.filter(F.col("d") > 0).select(
        F.col("duration_days").cast("bigint").alias("duration_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.floor(F.exp(F.col("cum_1e9") / 1e9) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("survival_1e6"),
    )


# ---------------------------------------------------------------------------
# Multiple-testing correction and resampling inference — the two pieces that
# turn the per-group test battery above into a defensible readout: BH-FDR
# controls the family-wise error when MANY groups are screened at once, and
# the Poisson bootstrap is the canonical distributed resampling scheme
# (per-row independent Poisson(1) weights ≈ multinomial resampling, no
# global coordination — the only bootstrap that works on a sharded corpus).
# ---------------------------------------------------------------------------

_BH_ORACLE = """
    WITH base AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    g AS (
      SELECT event_type, count(*) AS ng, sum(vc) AS sg
      FROM base GROUP BY event_type
    ),
    tot AS (
      SELECT count(*) AS n, sum(vc) AS s,
             sum(CAST(vc AS DOUBLE) * CAST(vc AS DOUBLE)) AS ssq,
             count(DISTINCT event_type) AS m
      FROM base
    ),
    scored AS (
      SELECT g.event_type, g.ng, tot.m,
             g.ng * (CAST(g.sg AS DOUBLE) / g.ng - CAST(tot.s AS DOUBLE) / tot.n)
                  * (CAST(g.sg AS DOUBLE) / g.ng - CAST(tot.s AS DOUBLE) / tot.n)
                  / ((tot.ssq - CAST(tot.s AS DOUBLE) * tot.s / tot.n) / (tot.n - 1))
               AS z2
      FROM g CROSS JOIN tot
    ),
    ranked AS (
      SELECT event_type, ng, m, z2,
             1.0 / (1.0 + z2) AS p,
             row_number() OVER (ORDER BY 1.0 / (1.0 + z2), event_type) AS i
      FROM scored
    )
    SELECT event_type, CAST(ng AS BIGINT) AS n_g,
           CAST(floor(z2 * 1e6 + 0.5) AS BIGINT) AS z2_1e6,
           CAST(floor(p * 1e9 + 0.5) AS BIGINT) AS p_1e9,
           CAST(floor(min(p * m / i) OVER (ORDER BY i DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1e9 + 0.5)
                AS BIGINT) AS p_bh_1e9
    FROM ranked
"""


@register("stats_bh_fdr", oracle=_BH_ORACLE, tags=("analytics", "stats"))
def stats_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment over a per-group mean-shift
    screen: every event_type gets z² = n_g(x̄_g - x̄)²/s² against the
    global mean, a monotone pseudo-p 1/(1+z²) (a real normal-CDF p
    needs exp/erf, which are NOT correctly-rounded-portable across
    engines — the monotone surrogate keeps the BH mechanics exact and
    bit-reproducible; SURVEY §5.4 allows only +,-,*,/,sqrt cross-row),
    then the BH step-up: p_bh(i) = min_{j≥i} p(j)·m/j via ONE running
    min over the rank-desc order.

    Scale: one map-side-combining aggregate collapses the fact table to
    #groups rows; the global moments enter as a 1-row broadcast; the
    rank/step-up windows run over the #groups-row aggregate, never the
    log. At 100 TB with millions of tested groups the step-up window is
    still just one sort of #groups rows."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )
    g = base.groupBy("event_type").agg(
        F.count("*").alias("ng"), F.sum("vc").alias("sg")
    )
    tot = base.agg(
        F.count("*").alias("n"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc").cast("double") * F.col("vc").cast("double")).alias("ssq"),
        F.countDistinct("event_type").alias("m"),
    )
    mean_g = F.col("sg").cast("double") / F.col("ng")
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("ssq") - F.col("s").cast("double") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    scored = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "ng",
        "m",
        (F.col("ng") * (mean_g - mean) * (mean_g - mean) / var).alias("z2"),
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.col("z2"))
    rank_w = Window.orderBy(p, "event_type")
    ranked = scored.select(
        "event_type", "ng", "m", "z2", p.alias("p"), F.row_number().over(rank_w).alias("i")
    )
    step_w = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ranked.select(
        "event_type",
        F.col("ng").cast("bigint").alias("n_g"),
        F.floor(F.col("z2") * 1e6 + F.lit(0.5)).cast("bigint").alias("z2_1e6"),
        F.floor(F.col("p") * 1e9 + F.lit(0.5)).cast("bigint").alias("p_1e9"),
        F.floor(
            F.min(F.col("p") * F.col("m") / F.col("i")).over(step_w) * 1e9 + F.lit(0.5)
        ).cast("bigint").alias("p_bh_1e9"),
    )


_BOOT_B = 16  # bootstrap replicas (columns, not rows — one aggregate pass)

# Poisson(1) CDF thresholds, written as identical literals on both engines.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _boot_oracle() -> str:
    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    cols = []
    for b in range(_BOOT_B):
        which = b // 8
        off = (b % 8) * 4 + 1
        u = (
            f"CAST(concat('0x', substr(md5(concat(CAST(event_id AS VARCHAR), ':{which}')), {off}, 4)) AS BIGINT) / 65536.0"
        )
        w = f"(CASE {cases.replace('u <', f'{u} <')} ELSE 6 END)"
        cols.append(f"sum({w}) AS sw{b}, sum({w} * vc) AS swx{b}")
    sums = ", ".join(cols)
    means = ", ".join(
        f"CAST(swx{b} AS DOUBLE) / sw{b}" for b in range(_BOOT_B)
    )
    return f"""
    WITH base AS (
      SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events
    ),
    agg AS (
      SELECT count(*) AS n, sum(vc) AS s, {sums} FROM base
    ),
    reps AS (
      SELECT CAST(s AS DOUBLE) / n AS point, unnest([{means}]) AS mean_b
      FROM agg
    )
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicas,
           CAST(floor(point * 100 + 0.5) AS BIGINT) AS point_1e4,
           CAST(floor(min(mean_b) * 100 + 0.5) AS BIGINT) AS lo_1e4,
           CAST(floor(max(mean_b) * 100 + 0.5) AS BIGINT) AS hi_1e4
    FROM reps GROUP BY point
"""


@register("stats_bootstrap_ci", oracle=_boot_oracle(), tags=("analytics", "stats"))
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value:
    replica b reweights each row by an independent Poisson(1) draw —
    the distributed bootstrap (no global multinomial coordination, so
    it shards perfectly; the row-count Poisson approximation error is
    O(1/n)). Draws are DETERMINISTIC: a 16-bit md5 slice per (row,
    replica) inverted through the Poisson CDF ladder — literal
    thresholds identical on both engines, so the oracle reproduces
    every weight bit-for-bit.

    Scale shape: the replica axis lives in COLUMNS — one map-side-
    combining aggregate computes all 16 (Σw, Σwx) pairs in a single
    pass over the fact table (16× arithmetic, 1× shuffle rows, zero
    explode), then a 1-row stack unpivots to replica means and min/max
    give the basic-bootstrap envelope. At 100 TB this is exactly one
    scan + one 1-row exchange; the naive explode-by-B form would ship
    B× the fact table."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
    )

    def weight(b: int):
        which = b // 8
        off = (b % 8) * 4 + 1
        h = F.md5(F.concat(F.col("event_id").cast("string"), F.lit(f":{which}")))
        u = F.conv(F.substring(h, off, 4), 16, 10).cast("long") / F.lit(65536.0)
        w = F.lit(6)
        for k in range(len(_POIS_CDF) - 1, -1, -1):
            w = F.when(u < _POIS_CDF[k], F.lit(k)).otherwise(w)
        return w

    aggs = [F.count("*").alias("n"), F.sum("vc").alias("s")]
    for b in range(_BOOT_B):
        wb = weight(b)
        aggs.append(F.sum(wb).alias(f"sw{b}"))
        aggs.append(F.sum(wb * F.col("vc")).alias(f"swx{b}"))
    one = base.agg(*aggs)
    stack_expr = ", ".join(
        f"cast(swx{b} as double) / sw{b}" for b in range(_BOOT_B)
    )
    reps = one.selectExpr(
        "cast(s as double) / n AS point",
        f"stack({_BOOT_B}, {stack_expr}) AS mean_b",
    )
    return reps.groupBy("point").agg(
        F.lit(_BOOT_B).cast("bigint").alias("n_replicas"),
        F.floor(F.min("mean_b") * 100 + F.lit(0.5)).cast("bigint").alias("lo_1e4"),
        F.floor(F.max("mean_b") * 100 + F.lit(0.5)).cast("bigint").alias("hi_1e4"),
    ).select(
        "n_replicas",
        F.floor(F.col("point") * 100 + F.lit(0.5)).cast("bigint").alias("point_1e4"),
        "lo_1e4",
        "hi_1e4",
    )
