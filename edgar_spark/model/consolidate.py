"""facts → filings consolidation: the reference's setData / generateData /
validateFinancialReport semantics (data_def.go:95-248) as pure column
expressions (whole-stage-codegen friendly; the only shuffles are one window
and one aggregate per run).

Semantics replicated exactly:

* zero-guard first-wins (data_def.go:205): per (filing, fin_type) the winner
  is the first NONZERO candidate in deterministic arrival order; if only zero
  candidates exist the field is a collected zero (0.0, presence set).
  The reference races goroutines across documents (parser.go:376-386); our
  pinned deterministic arrival order is (struct_affinity, doc_priority, seq):
  a fact's PRIMARY document — the statement that owns its struct (ops fields
  ← Operations/Income docs, cf ← Cash Flow, bs ← Assets, entity ← Entity
  Info) — beats secondary mentions (e.g. the cash-flow statement's
  NetIncomeLoss derivation line never shadows the income statement's), then
  doc_priority Entity<BS<CF<Ops<Inc<notes, then document order. This
  reproduces the reference's observed live-test behavior (e.g. Interest
  sourced from the income statement only when the CF statement lacks it,
  parser_test.go:858-887).
* NULL = presence bit unset; 0.0 = collected zero (SURVEY.md §1.4).
* WAShares sanity fix (data_def.go:160-163): when share count and WAShares
  differ by >2× (utils.go:170-181 semantics incl. IEEE 0-division), WAShares'
  value is overwritten with ShareCount's — observable only when the WAShares
  presence bit was set, which is exactly when ``washares`` is non-NULL.
* generate-on-missing (data_def.go:95-121, :137-151): GrossMargin = Revenue −
  CostOfSales; OpExpense = trunc2(Revenue − CostOfSales − OpIncome); Dps =
  trunc2(−Dividends / WAShares) else trunc2(−Dividends / ShareCount); a
  generated value of exactly 0 is REJECTED (stays missing) — the reference
  treats num==0 as generation failure (data_def.go:142-147).
* validation error string in reference order Bs, Entity, Cf, Ops
  (data_def.go:166-176) listing required-and-missing fields per struct.
* collected array in Entity, Bs, Cf, Ops struct order with Go field names
  (filing.go:279-302).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from edgar_spark.parse import meta

KEY = ["cik", "ticker", "filing_type", "filing_date", "accession"]

_STRUCT_DOC_NAME = {
    "bs": "Assets",
    "entity": "Entity Info",
    "cf": "Cash Flow",
    "ops": "Operations",
}
# data_def.go:166-176 validation order
_VALIDATE_ORDER = ["bs", "entity", "cf", "ops"]


def trunc2(c: Column) -> Column:
    """utils.go:165-167 round() = floor(x*100)/100 as a column expr.

    floor() on double returns BIGINT in Spark, which would overflow/error on
    ±inf/NaN/huge values where Go's math.Floor is the identity — guard those.
    """
    passthrough = c.isNull() | F.isnan(c) | (F.abs(c) >= F.lit(1e15))
    return F.when(passthrough, c).otherwise(F.floor(c * 100) / F.lit(100.0))


def same_scale(one: Column, two: Column) -> Column:
    """utils.go:170-181 as a column expr; double division so 0/0→NaN and
    x/0→±inf, and NaN/inf compare false against 1 (matches Go)."""
    val = F.when(one < two, (two - one) / one).otherwise((one - two) / two)
    return val <= F.lit(1.0)


# the statement that "owns" each struct's fields (primary source)
_PRIMARY_DOCS = {
    "entity": ("Entity Info",),
    "ops": ("Operations", "Income"),
    "cf": ("Cash Flow",),
    "bs": ("Assets",),
}


def _affinity() -> Column:
    """0 when the fact's doc is the primary statement for its struct."""
    expr = F.lit(1)
    for f in meta.FIELDS:
        primaries = _PRIMARY_DOCS[f.struct]
        expr = F.when(
            (F.col("fin_type") == f.fin_type) & F.col("doc_type").isin(*primaries),
            F.lit(0),
        ).otherwise(expr)
    return expr


def winners(facts: DataFrame) -> DataFrame:
    """Reduce candidate facts to one winner per (filing, fin_type):
    nonzero candidates first, in (struct_affinity, doc_priority, seq) arrival
    order; zeros only if no nonzero candidate exists."""
    w = Window.partitionBy(*KEY, "fin_type").orderBy(
        F.when(F.col("value") != 0.0, F.lit(0)).otherwise(F.lit(1)),
        _affinity(),
        "doc_priority",
        "seq",
    )
    return (
        facts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def widen(won: DataFrame) -> DataFrame:
    """Pivot winner rows to the wide filings layout via conditional agg
    (one shuffle; partial aggregation map-side)."""
    aggs = [
        F.max(F.when(F.col("fin_type") == f.fin_type, F.col("value"))).alias(f.col)
        for f in meta.FIELDS
    ]
    return won.groupBy(*KEY).agg(*aggs)


def finalize(wide: DataFrame) -> DataFrame:
    """WAShares fix → generation → validation/collected columns."""
    # --- WAShares sanity fix (before validation/generation) ---
    sc0 = F.coalesce(F.col("sharecount"), F.lit(0.0))
    wa0 = F.coalesce(F.col("washares"), F.lit(0.0))
    wide = wide.withColumn(
        "washares",
        F.when(
            F.col("washares").isNotNull() & ~same_scale(sc0, wa0), sc0
        ).otherwise(F.col("washares")),
    )

    # --- generation (only required+generate fields; 0-valued results rejected)
    gm_gen = F.col("revenue") - F.col("cost_of_revenue")
    wide = wide.withColumn(
        "gross_margin",
        F.when(
            F.col("gross_margin").isNull()
            & F.col("revenue").isNotNull()
            & F.col("cost_of_revenue").isNotNull()
            & (gm_gen != 0.0),
            gm_gen,
        ).otherwise(F.col("gross_margin")),
    )
    oe_gen = trunc2(F.col("revenue") - F.col("cost_of_revenue") - F.col("op_income"))
    wide = wide.withColumn(
        "op_expense",
        F.when(
            F.col("op_expense").isNull()
            & F.col("revenue").isNotNull()
            & F.col("cost_of_revenue").isNotNull()
            & F.col("op_income").isNotNull()
            & (oe_gen != 0.0),
            oe_gen,
        ).otherwise(F.col("op_expense")),
    )
    dps_gen = F.when(
        F.col("washares").isNotNull(),
        trunc2(F.col("dividends") * F.lit(-1.0) / F.col("washares")),
    ).when(
        F.col("sharecount").isNotNull(),
        trunc2(F.col("dividends") * F.lit(-1.0) / F.col("sharecount")),
    )
    wide = wide.withColumn(
        "dps",
        F.when(
            F.col("dps").isNull()
            & F.col("dividends").isNotNull()
            & dps_gen.isNotNull()
            & (dps_gen != 0.0),
            dps_gen,
        ).otherwise(F.col("dps")),
    )

    # --- collected array (filing.go:279-302 order, Go field names) ---
    collected = F.filter(
        F.array(
            *[
                F.when(F.col(f.col).isNotNull(), F.lit(f.go_name))
                for f in meta.COLLECTED_ORDER
            ]
        ),
        lambda x: x.isNotNull(),
    )
    wide = wide.withColumn("collected", collected)

    # --- validation error string (data_def.go:123-183) ---
    parts: List[Column] = []
    for struct in _VALIDATE_ORDER:
        req = [f for f in meta.FIELDS if f.struct == struct and f.required]
        missing = F.concat(
            *[
                F.when(F.col(f.col).isNull(), F.lit(f.go_name + ",")).otherwise(
                    F.lit("")
                )
                for f in req
            ]
        )
        parts.append(
            F.when(
                missing != "",
                F.concat(
                    F.lit("Missing fields in " + _STRUCT_DOC_NAME[struct] + "["),
                    missing,
                    F.lit("]\n"),
                ),
            ).otherwise(F.lit(""))
        )
    err = F.concat(*parts)
    wide = wide.withColumn(
        "validation_error", F.when(err != "", err).otherwise(F.lit(None))
    )
    return wide


def consolidate_facts(facts: DataFrame) -> DataFrame:
    """Full pipeline: candidates → winners → wide row → derived/validated."""
    return finalize(widen(winners(facts)))


def getters_view(filings: DataFrame) -> DataFrame:
    """The 27-getter public surface (filing.go:44-302): pass-through columns
    plus the sign-flipped Dividend (filing.go:188-196)."""
    return filings.withColumn("dividend", F.col("dividends") * F.lit(-1.0))


def collected_bitmask(struct: str) -> Column:
    """Recompute the reference's per-struct CollectedData bitmask (report.go
    bit tags) for JSON-golden export."""
    fields = [f for f in meta.FIELDS if f.struct == struct]
    expr = F.lit(0).cast("long")
    for f in fields:
        expr = expr + F.when(F.col(f.col).isNotNull(), F.lit(2**f.bit)).otherwise(
            F.lit(0)
        ).cast("long")
    return expr
