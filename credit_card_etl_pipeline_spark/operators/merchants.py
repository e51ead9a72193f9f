"""Merchant canonicalization (operators C3, C4).

C3 — ``clean_merchant_by_regex`` (refine.py:228-245): rules iterate in
priority-descending order; rows whose CURRENT merchant value matches
``Pattern`` get the whole value replaced by ``Replacement``;
empty-Replacement rules are skipped.  The reference's loop is
**sequential**: a later rule can re-match a value written by an earlier
rule (SURVEY §4 trap 3).  We replicate exactly by folding the rules into
a nested expression — ``m_k = CASE WHEN m_{k-1} RLIKE p_k THEN r_k ELSE
m_{k-1} END`` — still a single codegen'd projection, no UDF, no shuffle.

C4 — ``process_merchant_hybrid`` (db_to_RFManalysis.py:105-134): the
RFM job's three-stage resolver:

1. strip the longest matching payment prefix (prefixes sorted
   length-descending; db_to_RFManalysis.py:43-46,115-118);
2. exact lookup of the stripped name against the rule table's
   ``Replacement`` key (db_to_RFManalysis.py:122-125);
3. regex scan in priority order (db_to_RFManalysis.py:128-130);
4. fallback: keep the name, category ``Unknown`` (…:133-134).

Stage 2 compiles to a **broadcast equi-join** (the exact-lookup dict);
stages 1/3 are expression chains.  This mirrors the reference's
"exact-before-regex" hand optimization with Spark-native pieces.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schema as S
from ..functions.predicates import contains_ci, s


def clean_merchant_by_regex(
    df: DataFrame, rules: list[dict[str, Any]], merchant_col: str = S.MERCHANT
) -> DataFrame:
    """C3: sequential whole-value regex canonicalization."""
    expr: Column = s(merchant_col)  # astype(str) view: null → ''
    for rule in rules:
        pat, repl = rule.get("Pattern"), rule.get("Replacement")
        if not repl:
            continue
        expr = F.when(expr.rlike(pat), F.lit(repl)).otherwise(expr)
    # Restore the engine's internal null convention ('' ≡ null).
    return df.withColumn(merchant_col, F.when(expr == "", None).otherwise(expr))


def _strip_prefix_expr(col: Column, prefixes: list[str]) -> Column:
    """Stage 1: remove the FIRST matching prefix in length-descending
    order (the reference breaks after one strip).  Longest prefix must
    be evaluated first → nest it outermost."""
    expr = col
    for p in sorted({p.strip() for p in prefixes if p and p.strip()}, key=len):
        expr = F.when(col.startswith(p), F.substring(col, len(p) + 1, 2**31 - 1)).otherwise(
            expr
        )
    return expr


def resolve_merchant_hybrid(
    df: DataFrame,
    rules: list[dict[str, Any]],
    payment_prefixes: list[str],
    *,
    merchant_col: str = "merchant_name",
) -> DataFrame:
    """C4: append ``clean_merchant_name``, ``Category``, ``Sub_Category``,
    ``RFM_Exclusion`` columns.

    ``rules`` rows carry Pattern / Replacement / Priority / Category /
    Sub_Category / RFM_Exclusion (merchants.csv schema,
    db_to_RFManalysis.py:59-99).
    """
    spark = df.sparkSession
    # Reference trims, strips the first (longest) matching prefix, then
    # trims again (db_to_RFManalysis.py:115-120).  Null merchants resolve
    # to "Unknown"/"Unknown" (the isinstance guard, …:110-111).
    trimmed = F.trim(s(merchant_col))
    stripped = F.trim(_strip_prefix_expr(trimmed, payment_prefixes))
    df = df.withColumn("__stripped", stripped)

    # Stage 2: exact lookup on Replacement keys → broadcast equi-join.
    lookup_rows = []
    seen: set[str] = set()
    for r in rules:
        key = (r.get("Replacement") or "").strip()
        if key and key not in seen:
            seen.add(key)
            lookup_rows.append(
                (
                    key,
                    r.get("Category") or "",
                    r.get("Sub_Category") or "",
                    _parse_bool(r.get("RFM_Exclusion")),
                )
            )
    if lookup_rows:
        lookup = spark.createDataFrame(
            lookup_rows, "__k string, __cat string, __sub string, __excl boolean"
        )
        df = df.join(F.broadcast(lookup), df["__stripped"] == lookup["__k"], "left")
    else:
        df = (
            df.withColumn("__k", F.lit(None).cast("string"))
            .withColumn("__cat", F.lit(None).cast("string"))
            .withColumn("__sub", F.lit(None).cast("string"))
            .withColumn("__excl", F.lit(None).cast("boolean"))
        )

    # Stage 3: case-insensitive regex scan in priority order for stage-2
    # misses (FMW; the reference compiles every pattern with
    # re.IGNORECASE — db_to_RFManalysis.py:76).  Stage 4 fallback: keep
    # the stripped name, or the raw name if stripping emptied it; null
    # merchant → "Unknown" (…:130-134).
    fallback_name = (
        F.when(F.col(merchant_col).isNull(), F.lit("Unknown"))
        .when(F.col("__stripped") != "", F.col("__stripped"))
        .otherwise(s(merchant_col))
    )
    name3: Column = fallback_name
    cat3: Column = F.lit("Unknown")
    sub3: Column = F.lit("")
    excl3: Column = F.lit(False)
    for r in reversed(rules):
        pat = r.get("Pattern")
        if not pat:
            continue
        cond = F.col(merchant_col).isNotNull() & contains_ci(F.col("__stripped"), pat)
        name3 = F.when(cond, F.lit((r.get("Replacement") or "").strip())).otherwise(name3)
        cat3 = F.when(cond, F.lit(r.get("Category") or "")).otherwise(cat3)
        sub3 = F.when(cond, F.lit(r.get("Sub_Category") or "")).otherwise(sub3)
        excl3 = F.when(cond, F.lit(_parse_bool(r.get("RFM_Exclusion")))).otherwise(excl3)

    hit2 = F.col("__k").isNotNull() & F.col(merchant_col).isNotNull()
    return (
        df.withColumn(
            "clean_merchant_name", F.when(hit2, F.col("__stripped")).otherwise(name3)
        )
        .withColumn("Category", F.when(hit2, F.col("__cat")).otherwise(cat3))
        .withColumn("Sub_Category", F.when(hit2, F.col("__sub")).otherwise(sub3))
        .withColumn("RFM_Exclusion", F.when(hit2, F.col("__excl")).otherwise(excl3))
        .drop("__stripped", "__k", "__cat", "__sub", "__excl")
    )


def _parse_bool(v: Any) -> bool:
    """merchants.csv carries RFM_Exclusion as 'True'/'False' strings
    (db_to_RFManalysis.py:82)."""
    return str(v).strip().lower() == "true"
