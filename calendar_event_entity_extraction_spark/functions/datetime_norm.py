"""Date / time / duration normalization as pure Column expressions.

Reproduces the reference's conditional normalization semantics measured over
its 792 raw annotations (SURVEY.md §1.2, ``augmentation/main.py:76-96``):

* dates → ``DD/MM/YYYY`` with *dayfirst* tie-breaking, EXCEPT ISO
  ``YYYY-MM-DD`` which passes through verbatim;
* times → ``H:MM AM/PM`` with no leading zero, EXCEPT 24-h ``HH:MM``
  which passes through verbatim (leading zero kept);
* durations copied verbatim except ``"1 hr" → "1 hour"`` and
  ``"45mins" → "45 mins"`` (space inserted).

Everything is JVM-side (regexp + string builtins) so it stays inside
whole-stage codegen — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTHS_FULL = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTHS_3 = [m[:3] for m in MONTHS_FULL]
MONTH_ALT = "|".join(MONTHS_FULL)
MON3_ALT = "|".join(MONTHS_3)

# date surface forms (reference generator styles, faker_synth.py:50-77);
# day/month ranges are validated in the pattern because the reference's
# normalize_date nulls unparseable dates (augmentation/main.py:76-84)
_D = r"(3[01]|[12]\d|0?[1-9])"  # 1-31
_M = r"(1[0-2]|0?[1-9])"  # 1-12
ISO_RE = r"\b(\d{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]))\b"
SLASH_RE = rf"\b{_D}/{_M}/(\d{{4}})\b"
MDY_RE = rf"\b({MONTH_ALT}) {_D}, (\d{{4}})"
DMON_RE = rf"\b{_D}(?:st|nd|rd|th)? ({MON3_ALT})[a-z]* (\d{{4}})"
DASH_RE = rf"\b{_D}-{_M}-(\d{{4}})\b"

# time surface forms (faker_synth.py:80-97)
T_AMPM_RE = r"\b(\d{1,2}):([0-5]\d) ?([apAP][mM])\b"
T_24_RE = r"\b([01]?\d|2[0-3]):[0-5]\d\b(?! ?[apAP][mM])"
T_HAMPM_RE = r"\b(\d{1,2}) ?([apAP][mM])\b"

DUR_RE = (
    r"\b(?:for|lasting) "
    r"((?:\d+(?:\.\d+)? ?|a few )(?:minutes|mins|minute|min|hours|hour|hrs|hr)\b)"
)

# relative-date phrases (G3) resolved against a pinned reference "today" —
# the reference resolves against datetime.now() (faker_synth.py:100-123);
# an engine must take the reference instant as a job parameter instead
DEFAULT_REF_TODAY = "2025-06-15"
REL_RE = r"\b(day after tomorrow|tomorrow|today)\b"
_REL_OFFSETS = {"today": 0, "tomorrow": 1, "day after tomorrow": 2}


def _ne(c: Column) -> Column:
    """Spark regexp_extract yields '' on no-match; convert to null."""
    return F.nullif(c, F.lit(""))


def _dmy(d: Column, m: Column, y: Column) -> Column:
    # nulls propagate through concat, so an unmatched style yields null
    return F.concat(F.lpad(d, 2, "0"), F.lit("/"), F.lpad(m, 2, "0"), F.lit("/"), y)


def _month_num(mon3: Column) -> Column:
    return F.array_position(F.array(*[F.lit(m) for m in MONTHS_3]), mon3).cast("string")


def _split_dmy(match: Column, sep: str) -> Column:
    """One regex pass (group 0) + cheap split beats three regexp_extract
    group calls — each group call re-runs the whole pattern."""
    p = F.split(match, sep)
    return _dmy(F.element_at(p, 1), F.element_at(p, 2), F.element_at(p, 3))


def date_norm_col(text: Column, ref_today: str = DEFAULT_REF_TODAY) -> Column:
    """First date mention → normalized gold form (null if none).

    The style cascade is gated behind one cheap guard regex: rows with no
    digit / relative keyword (most transcript turns) skip all six styles.
    Lazy coalesce short-circuits matched rows.
    """
    iso = _ne(F.regexp_extract(text, ISO_RE, 1))  # verbatim passthrough
    slash = _split_dmy(_ne(F.regexp_extract(text, SLASH_RE, 0)), "/")
    mdy_m = F.split(_ne(F.regexp_extract(text, MDY_RE, 0)), " ")
    mdy = _dmy(
        F.regexp_replace(F.element_at(mdy_m, 2), ",", ""),
        _month_num(F.substring(F.element_at(mdy_m, 1), 1, 3)),
        F.element_at(mdy_m, 3),
    )
    dmon_m = F.split(_ne(F.regexp_extract(text, DMON_RE, 0)), " ")
    dmon = _dmy(
        F.regexp_replace(F.element_at(dmon_m, 1), "[a-z]+", ""),
        _month_num(F.substring(F.element_at(dmon_m, 2), 1, 3)),
        F.element_at(dmon_m, 3),
    )
    # dayfirst: "5-4-2024" → 05/04/2024
    dash = _split_dmy(_ne(F.regexp_extract(text, DASH_RE, 0)), "-")
    rel_phrase = _ne(F.regexp_extract(text, REL_RE, 1))
    rel_date = F.date_add(
        F.lit(ref_today).cast("date"),
        F.coalesce(
            *[
                F.when(rel_phrase == p, F.lit(off))
                for p, off in _REL_OFFSETS.items()
            ]
        ),
    )
    rel = F.when(rel_phrase.isNotNull(), F.date_format(rel_date, "dd/MM/yyyy"))
    return F.when(
        text.rlike(r"[0-9]|today|tomorrow"),
        F.coalesce(iso, slash, mdy, dmon, dash, rel),
    )


def time_norm_col(text: Column) -> Column:
    """First time mention → normalized gold form (null if none). Same
    guard + group-0-and-split strategy as date_norm_col."""
    # one scan of the long text; sub-part regexes run on the ≤9-char match
    m1 = _ne(F.regexp_extract(text, T_AMPM_RE, 0))
    t_ampm = F.concat(
        F.regexp_extract(m1, r"^\d{1,2}", 0).cast("int").cast("string"),
        F.lit(":"),
        F.regexp_extract(m1, r":(\d\d)", 1),
        F.lit(" "),
        F.upper(F.regexp_extract(m1, r"[apAP][mM]$", 0)),
    )
    t_24 = _ne(F.regexp_extract(text, T_24_RE, 0))  # verbatim passthrough
    m2 = _ne(F.regexp_extract(text, T_HAMPM_RE, 0))
    t_h = F.concat(
        F.regexp_replace(m2, "[^0-9]", "").cast("int").cast("string"),
        F.lit(":00 "),
        F.upper(F.regexp_replace(m2, "[^apmAPM]", "")),
    )
    noon = F.when(text.rlike(r"\bnoon\b"), F.lit("12:00 PM"))
    midnight = F.when(text.rlike(r"\bmidnight\b"), F.lit("12:00 AM"))
    return F.when(
        text.rlike(r"[0-9]|noon|midnight"),
        F.coalesce(t_ampm, t_24, t_h, noon, midnight),
    )


# G4: time range — when no explicit duration, it derives as end − start
RANGE_RE = (
    r"\bfrom (\d{1,2}):([0-5]\d) ?([apAP][mM]) "
    r"to (\d{1,2}):([0-5]\d) ?([apAP][mM])\b"
)


def _minutes_of_day(h: Column, m: Column, ap: Column) -> Column:
    h12 = h.cast("int") % 12
    add = F.when(F.lower(ap) == "pm", F.lit(12)).otherwise(F.lit(0))
    return (h12 + add) * 60 + m.cast("int")


def range_duration_col(text: Column) -> Column:
    """Derived duration from a 'from X to Y' range (reference G4,
    faker_synth.py:311-321): (end − start) mod 24h, rendered 'N minutes'."""

    def g(i: int) -> Column:
        return _ne(F.regexp_extract(text, RANGE_RE, i))

    start = _minutes_of_day(g(1), g(2), g(3))
    end = _minutes_of_day(g(4), g(5), g(6))
    delta = F.pmod(end - start, F.lit(1440))
    return F.when(
        g(1).isNotNull(), F.concat(delta.cast("string"), F.lit(" minutes"))
    )


def duration_norm_col(text: Column) -> Column:
    """Duration phrase after for/lasting, with the reference's two light
    normalizations applied (everything else verbatim); falls back to the
    range-derived duration when no explicit phrase exists."""
    raw = _ne(F.regexp_extract(text, DUR_RE, 1))
    spaced = F.regexp_replace(raw, r"(\d)(mins\b)", r"$1 $2")
    explicit = F.regexp_replace(spaced, r"\bhr\b", "hour")
    return F.coalesce(explicit, range_duration_col(text))
