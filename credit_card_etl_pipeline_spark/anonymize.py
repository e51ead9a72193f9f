"""Mock-data / anonymizer harness (operators C7, H14, H15, H16, G2).

Re-expression of the reference's ``generate_mock.py`` sampling +
masking engine (generate_mock.py:46-148) with one deliberate change:
every random choice is replaced by a **deterministic md5-derived
pseudo-random stream** (SURVEY §7 "make seeds explicit for
testability") — identical runs produce identical mock corpora, and the
DuckDB oracle can recompute them value-for-value.

Scale notes: the sampler and masking map are harness utilities that
collect only bounded driver-side state (per-keyword counts, the
distinct card list); the masking itself applies as a broadcast join
(C7) and the shifts/noise as pure column expressions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.hashing import md5_int60

#: Reference keyword pool (generate_mock.py:33-36 — trimmed to the
#: engine's synthetic corpus so samples stay interesting).
DEFAULT_KEYWORDS = ["LinePay", "Line", "街口", "繳款"]

#: mask_cards collects the distinct card set to the driver; a card
#: dimension is bounded (a portfolio is thousands of PANs), so anything
#: past this is a mis-keyed column, not a bigger portfolio.
MAX_DISTINCT_CARDS = 1_000_000


def _rand_factor_ppm(id_col: Column, salt: str) -> Column:
    """Deterministic uniform-ish noise factor in [0.95, 1.05) as an
    INTEGER in parts-per-million (950000..1049999): the H15 noise
    multiplier, reproducible cross-engine.  Integer form on purpose —
    a float factor times a float amount rounds differently in Spark
    (BigDecimal HALF_UP on the exact double) vs DuckDB (float path)
    exactly at the .xx5 boundaries; the sf1 certification sweep caught
    one-cent diffs from the old float formula."""
    h = md5_int60(F.concat(id_col.cast("string"), F.lit(":" + salt)))
    return (F.lit(950_000) + h % 100_000).cast("long")


def _rand_order(id_col: Column, salt: str) -> Column:
    """Deterministic shuffle key (md5 of id + salt)."""
    return F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt)))


def shift_dates(
    df: DataFrame,
    date_cols: list[str],
    *,
    anchor_col: str,
    target: str = "2023-12-25",
) -> DataFrame:
    """H14 (generate_mock.py:80-94): shift all dates so the max of
    ``anchor_col`` lands on ``target``, preserving relative spacing."""
    row = df.agg(F.max(F.to_date(F.col(anchor_col))).alias("mx")).first()
    if row is None or row["mx"] is None:
        return df
    import datetime as dt

    delta = (dt.date.fromisoformat(target) - row["mx"]).days
    return df.withColumns(
        {c: F.date_add(F.to_date(F.col(c)), delta) for c in date_cols}
    )


def inject_noise(
    df: DataFrame,
    amount_cols: list[str],
    *,
    id_col: str,
    seed: str = "noise",
    decimals: int = 2,
) -> DataFrame:
    """H15 (generate_mock.py:96-115): amount × deterministic factor in
    [0.95, 1.05), rounded to ``decimals``.  (The reference's
    round-to-int branch for integral columns is a display nicety; the
    engine keeps a fixed rounding so the噪 stream is reproducible.)

    The whole computation is EXACT int64 arithmetic: amount is scaled
    to ``10^decimals`` units (money inputs are integral there by the
    repo convention), multiplied by the ppm factor, and rounded
    half-up with an integer division — ``(units*ppm + 5e5) div 1e6``
    — so Spark and DuckDB produce the identical cent on every row at
    any scale.  Headroom: 2^36-unit amounts × 2^21 ppm ≈ 2^57 < 2^63.
    """
    scale = 10**decimals

    def noisy(c: str) -> Column:
        units = F.round(F.col(c) * scale).cast("long")
        ppm = _rand_factor_ppm(F.col(id_col), f"{seed}:{c}")
        num = units * ppm + F.lit(500_000)
        # exact JVM-side integer division (the double-division trick
        # silently truncates to q-1 once the operands pass 2^53 —
        # caught by the r8 hypothesis sweep on range_bucket, same form)
        out_units = F.call_function("div", num, F.lit(1_000_000))
        # the exactness argument above PRESUMES the input is integral
        # at ``decimals`` (true for every current cent-denominated
        # feed); a future sub-cent feed would silently re-quantize —
        # make it diverge loudly instead (one JVM-side compare/row)
        integral = F.col(c).isNull() | (
            units.cast("double") / scale == F.col(c)
        )
        check = F.assert_true(
            integral,
            F.concat(
                F.lit(
                    f"inject_noise: column {c!r} not integral at "
                    f"{decimals} decimals: "
                ),
                F.col(c).cast("string"),
            ),
        )
        return F.when(check.isNull(), out_units.cast("double") / scale)

    return df.withColumns({c: noisy(c) for c in amount_cols})


def build_card_mask(
    cards: list[str],
    custom_map: dict[str, str] | None = None,
    *,
    auto_start: int = 1000,
) -> dict[str, str]:
    """C7 map construction (generate_mock.py:117-143): custom last-4
    overrides, else auto counter — iteration in SORTED order so the map
    is deterministic (the reference iterates first-appearance order)."""
    custom_map = custom_map or {}
    fake_map: dict[str, str] = {}
    counter = 0
    for card in sorted(cards):
        suffix = str(card).strip()[-4:]
        if suffix in custom_map:
            target = custom_map[suffix]
        else:
            counter += 1
            target = str(auto_start * counter)
        fake_map[card] = f"****-****-****-{target}"
    return fake_map


def mask_cards(
    df: DataFrame,
    *,
    card_col: str = "Card_No",
    custom_map: dict[str, str] | None = None,
) -> tuple[DataFrame, dict[str, str]]:
    """C7 (generate_mock.py:145): pseudonymize via broadcast map join +
    coalesce; unmapped (null) cards pass through.

    The distinct card set is collected to the driver — correct for a
    card DIMENSION (a portfolio holds thousands of PANs, not billions),
    but a mis-keyed call (e.g. passing the transaction id column) would
    otherwise stream a fact-sized distinct into driver memory, so the
    cardinality is checked first and the call fails fast above
    ``MAX_DISTINCT_CARDS``."""
    distinct_cards = (
        df.select(card_col).where(F.col(card_col).isNotNull()).distinct()
    )
    n = distinct_cards.count()
    if n > MAX_DISTINCT_CARDS:
        raise ValueError(
            f"mask_cards: {n} distinct values in {card_col!r} exceeds "
            f"MAX_DISTINCT_CARDS={MAX_DISTINCT_CARDS}; this column does "
            "not look like a card dimension (mis-keyed call?)"
        )
    cards = [r[0] for r in distinct_cards.collect()]
    fake_map = build_card_mask(cards, custom_map)
    if not fake_map:
        return df, {}
    spark = df.sparkSession
    map_df = spark.createDataFrame(
        list(fake_map.items()), f"`{card_col}` string, __fake string"
    )
    out = (
        df.join(F.broadcast(map_df), card_col, "left")
        .withColumn(card_col, F.coalesce(F.col("__fake"), F.col(card_col)))
        .drop("__fake")
    )
    return out, fake_map


def stratified_sample(
    df: DataFrame,
    *,
    merchant_col: str = "Merchant",
    id_col: str,
    keywords: list[str] | None = None,
    per_keyword: int = 2,
    n: int = 30,
    seed: str = "sample",
) -> DataFrame:
    """H16 + G2 (generate_mock.py:46-67): per-keyword samples (≤
    ``per_keyword`` each, deterministic shuffle order) + a pseudo-random
    remainder up to ``n``, unioned and de-duplicated.

    Mirrors the reference's sizing exactly: the remainder is ``n``
    minus the PRE-dedup pool size."""
    keywords = keywords if keywords is not None else DEFAULT_KEYWORDS
    order = _rand_order(F.col(id_col), seed)

    def hit(kw: str) -> Column:
        return F.coalesce(
            F.lower(F.col(merchant_col).cast("string")).contains(kw.lower()),
            F.lit(False),
        )

    # One pass for every keyword's hit count (instead of a driver
    # round-trip per keyword); pre-dedup pool size = Σ min(k, hits),
    # mirroring the reference's sample(min(len, k)) sizing.
    counts_row = df.agg(
        *[
            F.sum(hit(kw).cast("int")).alias(f"__c{i}")
            for i, kw in enumerate(keywords)
        ]
    ).first()
    pool_sizes = sum(
        min(per_keyword, int(counts_row[f"__c{i}"] or 0))
        for i in range(len(keywords))
    )

    pools: list[DataFrame] = []
    for kw in keywords:
        picked = df.where(hit(kw)).orderBy(order, F.col(id_col)).limit(per_keyword)
        pools.append(picked)

    if pool_sizes < n:
        pools.append(df.orderBy(order, F.col(id_col)).limit(n - pool_sizes))
    pool = reduce(lambda a, b: a.unionByName(b), pools)
    return pool.dropDuplicates([id_col])
