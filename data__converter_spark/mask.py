"""Declarative column masking — the "데이터 눈가림" (Random) tool.

The reference drives masking from a per-column rule table
(``FieldRule``, app/(contents)/random/page.tsx:22-53) dispatched row by
row through ``applyRule`` (:183-263). Here each rule compiles to a
single Spark ``Column`` expression, so a whole table masks in one
vectorized projection — no per-row loop, no Python in the hot path.

Determinism (SURVEY §7.3.3, a documented divergence): the reference
uses ``Math.random``; we derive every "random" choice from
``xxhash64(value, seed, position)`` so outputs are reproducible given
``seed`` and property-testable. ``sha2`` masking (:121-126) matches the
reference byte-for-byte and is the cross-engine oracle anchor.

Rule kinds (random/page.tsx:183-263):
  none, blank, randomString, randomInt (digit-count + range modes),
  randomDate, fakeName, fakeEmail, fakePhone, hashSHA256.

Recovery tables (:364-396): each masked table gets an ``ANON_ROW_ID``
and a key table mapping id -> original values, so masking is reversible
by whoever holds the key table (join on ``ANON_ROW_ID``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIGITS = "0123456789"
LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
ALNUM = DIGITS + LETTERS
LOWER = "abcdefghijklmnopqrstuvwxyz"

# Our own name/domain tables (the reference ships Korean-locale lists at
# random/page.tsx:89-102; we keep the 8x8 / 4-domain shape, not the values).
SURNAMES = ["Kim", "Lee", "Park", "Choi", "Jung", "Kang", "Cho", "Yoon"]
GIVEN_NAMES = ["Minjun", "Seoyeon", "Doyun", "Jiwoo", "Hajun", "Suah", "Siwoo", "Haeun"]
EMAIL_DOMAINS = ["example.com", "mail.test", "sample.org", "demo.net"]

FILL_CHARSETS = {"digits": DIGITS, "letters": LETTERS, "alnum": ALNUM, "lower": LOWER}


@dataclass
class FieldRule:
    """Per-column masking rule (random/page.tsx:35-53)."""

    kind: str = "none"
    fixed_part: str = ""
    str_len: int | None = None
    fill_kind: str = "alnum"  # digits | letters | alnum
    int_min: int | None = None
    int_max: int | None = None
    date_start: str = "2000-01-01"
    date_end: str = "2030-12-31"
    extra: dict = field(default_factory=dict)


def _src_str(col: Column) -> Column:
    """Stringified source value, null -> '' (applyRule input contract)."""
    return F.coalesce(col.cast("string"), F.lit(""))


def _hash_pick(src: Column, seed: int, salt, modulus: int) -> Column:
    """Deterministic uniform pick in [0, modulus) from (value, seed, salt)."""
    return F.pmod(F.xxhash64(src, F.lit(seed), F.lit(salt)), F.lit(modulus))


def _fill(src: Column, n: Column, charset: str, seed: int) -> Column:
    """Deterministic pseudo-random string of length ``n`` over ``charset``.

    Vectorized: transform over sequence(1..n), one xxhash64 per position
    — stays inside whole-stage codegen, no UDF.
    """
    chars = F.lit(charset)
    size = len(charset)
    return F.when(n <= 0, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.substring(
                    chars,
                    F.pmod(F.xxhash64(src, F.lit(seed), i), F.lit(size)).cast("int")
                    + F.lit(1),
                    1,
                ),
            ),
            "",
        )
    )


def _target_len(src: Column, str_len: int | None, default: int) -> Column:
    """Reference length policy: strLen > source length > default."""
    if str_len is not None:
        return F.lit(str_len)
    return F.when(F.length(src) > 0, F.length(src)).otherwise(F.lit(default))


def _only_digits(s: str) -> str:
    return "".join(c for c in s if c.isdigit())


def compile_rule(col_name: str, rule: FieldRule, seed: int = 42) -> Column:
    """FieldRule -> Column expression (applyRule, random/page.tsx:183-263)."""
    src = _src_str(F.col(col_name))
    kind = rule.kind
    fixed = rule.fixed_part or ""

    if kind == "none":
        return src
    if kind == "blank":
        return F.lit("")
    if kind == "hashSHA256":
        # exact reference parity: SHA-256 hex of the stringified value
        # (random/page.tsx:121-126); cross-engine oracle anchor.
        return F.sha2(src, 256)
    if kind == "randomString":
        charset = FILL_CHARSETS.get(rule.fill_kind, ALNUM)
        target = _target_len(src, rule.str_len, 8)
        n = target - F.lit(len(fixed))
        return F.concat(F.lit(fixed), _fill(src, n, charset, seed))
    if kind == "randomInt":
        if rule.int_min is not None or rule.int_max is not None:
            lo = rule.int_min if rule.int_min is not None else 0
            hi = rule.int_max if rule.int_max is not None else 9999
            return (_hash_pick(src, seed, "int", hi - lo + 1) + F.lit(lo)).cast(
                "string"
            )
        fixed_digits = _only_digits(fixed)
        digits_src = F.regexp_replace(src, r"\D+", "")
        target = _target_len(digits_src, rule.str_len, 8)
        n = target - F.lit(len(fixed_digits))
        return F.concat(F.lit(fixed_digits), _fill(src, n, DIGITS, seed))
    if kind == "randomDate":
        if len(fixed) == 4 and fixed.isdigit():  # 'YYYY' -> within that year
            start, end = f"{fixed}-01-01", f"{fixed}-12-31"
        elif len(fixed) == 7 and fixed[:4].isdigit():  # 'YYYY-MM'
            start = f"{fixed}-01"
            end_month = F.last_day(F.lit(start).cast("date"))
            span = F.datediff(end_month, F.lit(start).cast("date")) + 1
            off = F.pmod(F.xxhash64(src, F.lit(seed), F.lit("date")), span).cast("int")
            return F.date_format(
                F.date_add(F.lit(start).cast("date"), off), "yyyy-MM-dd"
            )
        else:
            start, end = rule.date_start, rule.date_end
        span_days = F.datediff(F.lit(end).cast("date"), F.lit(start).cast("date")) + 1
        off = F.pmod(F.xxhash64(src, F.lit(seed), F.lit("date")), span_days).cast("int")
        return F.date_format(F.date_add(F.lit(start).cast("date"), off), "yyyy-MM-dd")
    if kind == "fakeName":
        given = F.array(*[F.lit(g) for g in GIVEN_NAMES])[
            _hash_pick(src, seed, "given", len(GIVEN_NAMES)).cast("int")
        ]
        if fixed:
            return F.concat(F.lit(fixed), F.lit(" "), given)
        surname = F.array(*[F.lit(s) for s in SURNAMES])[
            _hash_pick(src, seed, "sur", len(SURNAMES)).cast("int")
        ]
        return F.concat(surname, F.lit(" "), given)
    if kind == "fakeEmail":
        # local = fixed + lowercase fill to target (strLen > src-local len
        # > 10, floor 6); domain = deterministic pick of 4 (:95-102).
        src_local = F.substring_index(src, "@", 1)
        target = F.greatest(
            _target_len(src_local, rule.str_len, 10), F.lit(6)
        )
        n = target - F.lit(len(fixed))
        local = F.concat(F.lit(fixed), _fill(src, n, LOWER, seed))
        domain = F.array(*[F.lit(d) for d in EMAIL_DOMAINS])[
            _hash_pick(src, seed, "dom", len(EMAIL_DOMAINS)).cast("int")
        ]
        return F.concat(local, F.lit("@"), domain)
    if kind == "fakePhone":
        # '010-XXXX-XXXX'; digits of fixedPart consume the tail prefix
        # (:104-110).
        fixed_digits = _only_digits(fixed)[:8]
        n = F.lit(8 - len(fixed_digits))
        tail = F.concat(F.lit(fixed_digits), _fill(src, n, DIGITS, seed))
        return F.concat(
            F.lit("010-"), F.substring(tail, 1, 4), F.lit("-"), F.substring(tail, 5, 4)
        )
    raise ValueError(f"unknown mask rule kind: {kind}")


def anon_row_id(key_cols: list[str], seed: int | None = 42) -> Column:
    """Per-row anonymous id (uuidv4 at random/page.tsx:128-133,375-378).

    Seeded mode derives a stable surrogate from the key columns so tests
    and recovery joins are reproducible; ``seed=None`` gives true uuid4.
    """
    if seed is None:
        return F.expr("uuid()")
    return F.sha2(
        F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]),
        256,
    )


def mask_table(
    df: DataFrame,
    rules: dict[str, FieldRule],
    seed: int = 42,
    shuffle: bool = False,
    limit: int | None = None,
    id_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Mask ``df`` per ``rules``; return (masked_df, recovery_key_df).

    One vectorized projection for the mask, one for the key table
    (buildMaskedSheets, random/page.tsx:351-401). ``shuffle`` is the
    reference's optional row permutation (:135-140) as a sort by a
    seeded random key; ``limit`` the per-sheet cap (:362).

    The key table carries ``ANON_ROW_ID`` plus the *original* values of
    every masked column; join masked ⋈ key on ``ANON_ROW_ID`` to
    recover. Scale note: both outputs derive from the same scan —
    Spark reads the source twice unless the caller caches; at 100 TB
    write the key table first, then mask from it.
    """
    active = {c: r for c, r in rules.items() if r.kind != "none" and c in df.columns}
    rid = anon_row_id(id_cols or df.columns, seed=seed)
    base = df
    if limit is not None:
        base = base.limit(limit)
    if shuffle:
        base = base.orderBy(F.xxhash64(F.struct(*df.columns), F.lit(seed)))
    with_id = base.withColumn("ANON_ROW_ID", rid)

    masked = with_id.select(
        "ANON_ROW_ID",
        *[
            compile_rule(c, active[c], seed).alias(c) if c in active else F.col(c)
            for c in df.columns
        ],
    )
    key_table = with_id.select(
        "ANON_ROW_ID", *[F.col(c).cast("string").alias(c) for c in active]
    )
    return masked, key_table


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive: str | Column | None = None,
) -> DataFrame:
    """Per-equivalence-class k-anonymity (and l-diversity) audit.

    The flip side of the masking tool (random/page.tsx:183-263): before
    deciding WHICH columns need a ``FieldRule``, measure how
    re-identifiable the table already is. Rows sharing the same values
    of ``quasi_cols`` (the quasi-identifiers an attacker can link on)
    form an equivalence class; a class smaller than ``k`` fails
    k-anonymity. With ``sensitive`` set, the class's distinct count of
    that attribute is its l-diversity — a 100-row class whose salary is
    the single same value still leaks it.

    Output: one row per class with ``class_size`` (bigint), ``at_risk``
    (class_size < k) and, when ``sensitive`` is given, ``l_distinct``.

    Scale: one hash aggregate keyed on the quasi-identifiers — classes
    number at most the quasi-space cardinality, far below row count, so
    partial (map-side) aggregation absorbs the bulk before the
    exchange. ``count_distinct`` on the sensitive column keeps it a
    single shuffle (Spark plans the two-phase distinct within the same
    key exchange). No windows, no joins, no Python.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("class_size")]
    if sensitive is not None:
        s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
        aggs.append(F.count_distinct(s).cast("bigint").alias("l_distinct"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    return out.withColumn("at_risk", F.col("class_size") < F.lit(int(k)))
