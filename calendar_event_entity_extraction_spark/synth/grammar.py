"""Deterministic calendar-request grammar.

Single source of truth for the synthetic transcripts fixture. Every choice is
a pure modular-arithmetic function of a single integer key ``k`` — no
``random``, no ``datetime.now()`` — so the exact same rows are reproducible
in three independent implementations that the test-suite pins together:

1. :func:`event_spec` — the Python spec (used by the Spark generator).
2. ``synth/oracle.py`` — a DuckDB-SQL renderer of the *gold fields only*
   (the driver's correctness oracle computes gold directly from the key,
   while the Spark side must recover it from the rendered text via the real
   extractor — extractor correct ⇔ value-hashes match).
3. ``tests/test_synth_oracle.py`` — cross-checks (1) against (2).

Surface forms mirror the reference's generator grammar
(``augmentation/faker_synth.py:50-97`` date/time styles,
``:126-178`` duration/attendee/location/recurrence phrases) and the
annotation function measured over its 792 raw rows (see
``scripts/eval_reference_corpus.py``): mid-text ISO dates stay verbatim,
text-leading ones convert; 24-h times gain AM/PM below 13:00; durations are
verbatim except ``Nmins→N mins`` / ``Nmin→N minutes``; locations drop a
leading article; the recurrence keyword stays part of the action.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

MONTHS_FULL = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
MONTHS_ABBR = [m[:3] for m in MONTHS_FULL]

# G10 enhanced action vocabulary (create_enhanced_training_data.py:21-52) —
# the subset that is extractor-safe by construction: no embedded clause
# markers (" with ", " at ", " on "…), no duration words ("Happy hour"),
# no recurrence keywords ("Daily standup" — recurrence is a separate
# grammar mechanism), second words lowercase
ACTIONS = [
    "Team sync", "Project kickoff", "Budget review", "Design review",
    "Sprint planning", "Client call", "Strategy meeting", "Interview",
    "Demo session", "Standup", "Retrospective", "Quick meeting",
    "Client meeting", "Sales call", "Pitch", "Consultation",
    "Vendor meeting", "Board meeting", "Stakeholder meeting", "One-on-one",
    "Code review", "Deep dive", "Kickoff", "Walkthrough",
    "Town hall", "All hands", "Coffee chat", "Team lunch",
    "Networking event", "Webinar", "Seminar", "Knowledge sharing",
    "Study group", "Dental appointment", "Doctor visit", "Update meeting",
]

NAMES = [
    "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
    "Isla", "Jack", "Kara", "Liam", "Mia", "Noah", "Olivia", "Peter",
    "Quinn", "Rosa", "Sam", "Tara",
]

LOC_PHYS = [
    "conference room B", "the coworking space", "room 12",
    "the downtown office", "Cafe Lumen", "the main lobby",
    "building 7", "the rooftop terrace",
]

MEDIUMS = ["Zoom", "Google Meet", "Teams", "Skype", "Webex", "Slack huddle"]

MED_PREPS = ["on", "via", "over"]
PHYS_PREPS = ["at", "in"]

# (text form, gold form) — gold differs only per the reference's light
# normalization rules (SURVEY.md §1.2 duration row).
DUR_PAIRS = [
    ("45 minutes", "45 minutes"),
    ("1 hour", "1 hour"),
    ("1 hr", "1 hr"),
    ("30 mins", "30 mins"),
    ("45mins", "45 mins"),
    ("2 hours", "2 hours"),
    ("90 minutes", "90 minutes"),
    ("1.5hrs", "1.5hrs"),
]

REC_KWS = [
    "weekly", "monthly", "daily", "biweekly",
    "quarterly", "annual", "Weekly", "Monthly",
]

NOTES = [
    "bring the slides",
    "agenda attached",
    "budget figures needed",
    "client will join late",
]

DISTRACTORS = [
    "Sure, let me check my calendar.",
    "Sounds good, I will confirm later.",
    "Thanks for the update on the project.",
    "Can you resend the document link?",
    "The deployment finished without errors.",
    "Let me know if anything changes.",
]

TIME_INTROS = [" at ", " starting at ", " "]
DUR_VERBS = ["for", "lasting"]

EPOCH = _dt.date(2024, 1, 1)
TS_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

# bump when any formula changes — invalidates materialized fixture caches
GRAMMAR_VERSION = 8

# pinned "now" for relative-date resolution (G3) — the reference resolves
# against datetime.now() (faker_synth.py:294); we must not (FIXTURES.md §0).
# REF_NOW_HOUR pins the time-of-day so "in N hours" resolves deterministically
# (9 + 12 < 24 ⇒ every in-N-hours phrase lands on REF_TODAY itself).
REF_TODAY = _dt.date(2025, 6, 15)
REF_NOW_HOUR = 9

IN_HOURS_CHOICES = [2, 3, 4, 6, 12]  # faker_synth.py:110
_WEEKDAYS = ["monday", "tuesday", "wednesday", "thursday", "friday"]


def _next_weekday_offset(target_idx: int) -> int:
    """faker_synth.py:117-122: (target − today.weekday()) % 7, 0 ⇒ 7."""
    return (target_idx - REF_TODAY.weekday()) % 7 or 7


# (phrase, day offset from REF_TODAY) — G3/G11 relative-date grammar,
# reference faker_synth.py:100-123 + create_enhanced_training_data.py:179-210
REL_SPECS = (
    [("today", 0), ("tomorrow", 1), ("day after tomorrow", 2), ("next week", 7)]
    + [(f"next {w}", _next_weekday_offset(i)) for i, w in enumerate(_WEEKDAYS)]
    + [(f"in {h} hours", (REF_NOW_HOUR + h) // 24) for h in IN_HOURS_CHOICES]
)
REL_PHRASES = [p for p, _ in REL_SPECS]
REL_OFFSETS = [off for _, off in REL_SPECS]


def _ord_suffix(d: int) -> str:
    if 11 <= d % 100 <= 13:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(d % 10, "th")


@dataclass
class EventSpec:
    k: int
    n_turns: int
    req_turn: int
    has_echo: bool
    text: str
    # gold fields (the 8-key schema; attendees is an ordered list or None)
    action: str
    date: str
    time: str
    attendees: list | None
    location: str | None
    duration: str | None
    recurrence: str | None
    notes: str | None


def n_turns_of(k: int) -> int:
    return 2 + (k % 5)


def req_turn_of(k: int) -> int:
    return k % n_turns_of(k)


def has_second_event(k: int) -> bool:
    """~1/9 of conversations carry a SECOND, distinct calendar request at
    the turn after the first — exercises multi-event extraction and proves
    canonicalization merges only co-referent events. Mutually exclusive
    with the echo (k%50==0) so turn placement never collides."""
    return k % 9 == 5 and k % 50 != 0 and req_turn_of(k) + 1 < n_turns_of(k)


def second_key(k: int) -> int:
    """Derived grammar key for the second event. The action index is forced
    to differ from the first event's, so the two are never co-referent and
    the canonical event count is exactly (1 + has_second) per conversation."""
    b = k * 131 + 17
    if (b // 6) % len(ACTIONS) == (k // 6) % len(ACTIONS):
        b = k * 131 + 23
    return b


def event_spec(k: int) -> EventSpec:
    """The full deterministic spec for key ``k``: request text + gold."""
    n_turns = 2 + (k % 5)
    req_turn = k % n_turns

    # ---- date (8 styles; faker_synth.py:50-77 + enhanced generator's
    # year-less "10th May", create_enhanced_training_data.py style 3)
    d0 = EPOCH + _dt.timedelta(days=(k * 37) % 730)
    d, m, y = d0.day, d0.month, d0.year
    s_date = k % 8
    ddmmyyyy = f"{d:02d}/{m:02d}/{y}"
    if s_date == 0:
        date_text, gold_date = ddmmyyyy, ddmmyyyy
    elif s_date == 1:  # ISO passthrough (reference keeps verbatim, §1.2)
        date_text = f"{y}-{m:02d}-{d:02d}"
        gold_date = date_text
    elif s_date == 2:
        date_text, gold_date = f"{MONTHS_FULL[m - 1]} {d}, {y}", ddmmyyyy
    elif s_date == 3:
        date_text = f"{d}{_ord_suffix(d)} {MONTHS_FULL[m - 1]} {y}"
        gold_date = ddmmyyyy
    elif s_date == 4:
        date_text, gold_date = f"{d} {MONTHS_ABBR[m - 1]} {y}", ddmmyyyy
    elif s_date == 5:
        date_text, gold_date = f"{d}-{m}-{y}", ddmmyyyy
    elif s_date == 6:  # G3/G11: relative date, gold is the RESOLVED date
        off_idx = (k // 3) % len(REL_SPECS)
        date_text = REL_PHRASES[off_idx]
        rd = REF_TODAY + _dt.timedelta(days=REL_OFFSETS[off_idx])
        gold_date = f"{rd.day:02d}/{rd.month:02d}/{rd.year}"
    else:  # year-less "10th May": resolves to the NEXT occurrence of (d, m)
        date_text = f"{d}{_ord_suffix(d)} {MONTHS_FULL[m - 1]}"
        ry = (
            REF_TODAY.year
            if (m, d) >= (REF_TODAY.month, REF_TODAY.day)
            else REF_TODAY.year + 1
        )
        gold_date = f"{d:02d}/{m:02d}/{ry}"

    # ---- time (8 styles; faker_synth.py:80-97 + :311-321 ranges)
    s_time = k % 8
    h24 = (k * 7 + 3) % 24
    mm = 15 * ((k * 5) % 4)
    if s_time in (1, 4, 6):
        mm = 0
    if s_time == 4:
        h24 = 12
    elif s_time == 6:
        # "9ish": reference hours are 7..20 (faker_synth.py:305). Hours 19
        # and 20 render identically to 7 and 8 ("7ish"/"8ish") and are thus
        # genuinely ambiguous even to the reference's model — the grammar
        # generates the ten UNAMBIGUOUS ish-hours 9..18, so text↔gold stays
        # self-consistent (FIXTURES.md §4 invariant). NB the variety source
        # must not be k*7+3: for k ≡ 6 (mod 8) that expression is constant
        # mod 14 and every ish row would get the same hour.
        h24 = 9 + ((k // 8) % 10)
    h12 = ((h24 + 11) % 12) + 1
    ap = "AM" if h24 < 12 else "PM"
    range_delta = None
    if s_time == 0:
        time_text = f"{h12}:{mm:02d} {ap.lower()}"
        gold_time = f"{h12}:{mm:02d} {ap}"
    elif s_time == 1:
        time_text = f"{h12}{ap.lower()}"
        gold_time = f"{h12}:00 {ap}"
    elif s_time == 2:
        time_text = f"{h12}:{mm:02d} {ap}"
        gold_time = time_text
    elif s_time == 3:  # 24-h: >=13 verbatim; <12 " AM"; ==12 " PM" (corpus)
        time_text = f"{h24:02d}:{mm:02d}"
        gold_time = (
            time_text if h24 >= 13
            else f"{time_text} PM" if h24 == 12
            else f"{time_text} AM"
        )
    elif s_time == 4:
        time_text = "noon"
        gold_time = "12:00 PM"
    elif s_time == 6:  # "9ish" (faker_synth.py:95-96 style 5)
        time_text = f"{h12}ish"
        gold_time = f"{h12}:00 {ap}"
    elif s_time == 7:  # no-space "9:05AM" (faker_synth.py:97 style 6)
        time_text = f"{h12}:{mm:02d}{ap}"
        gold_time = f"{h12}:{mm:02d} {ap}"
    else:  # G4: time range (3 variants); gold time = start, normalized
        range_delta = 30 * ((k // 29) % 4 + 1)  # 30/60/90/120 minutes
        end_total = (h24 * 60 + mm + range_delta) % 1440
        eh24, emm = end_total // 60, end_total % 60
        eh12 = ((eh24 + 11) % 12) + 1
        eap = "am" if eh24 < 12 else "pm"
        start = f"{h12}:{mm:02d} {ap.lower()}"
        end = f"{eh12}:{emm:02d} {eap}"
        variant = (k // 17) % 3  # faker_synth.py:311-316
        if variant == 0:
            time_text = f"from {start} to {end}"
        elif variant == 1:
            time_text = f"{start}–{end}"  # en-dash, no spaces
        else:
            time_text = f"between {start} and {end}"
        gold_time = f"{h12}:{mm:02d} {ap}"
    if k % 10 == 2:  # P9 noise: timezone tag; gold time unchanged
        time_text = f"{time_text} (IST)"

    # ---- attendees (ordered, never []); null rate pinned to the measured
    # reference corpus rate (SURVEY §1.2: 24.7% null)
    n_att = 0 if (k * 31) % 1000 < 247 else 1 + (k // 4) % 3
    names = [NAMES[(k * 13 + i * 7) % 20] for i in range(n_att)]
    s_att = (k // 7) % 3
    att_clause = ""
    if n_att:
        if s_att == 0:
            if n_att == 1:
                lst = names[0]
            elif n_att == 2:
                lst = f"{names[0]} and {names[1]}"
            else:
                lst = f"{names[0]}, {names[1]} and {names[2]}"
            att_clause = f" with {lst}"
        elif s_att == 1:
            att_clause = " w/ " + " & ".join(names)
        elif n_att >= 2:  # bare post-time list (reference: ~41 raw rows)
            att_clause = " " + ", ".join(names)
        else:  # a single bare name is ambiguous without a pool — use "with"
            att_clause = f" with {names[0]}"
    gold_att = names or None

    # ---- location (null rate pinned to §1.2: 34.5% null)
    loc_clause, gold_loc = "", None
    if (k * 17) % 1000 >= 345:
        if (k // 5) % 2 == 0:
            med = MEDIUMS[(k // 10) % 6]
            prep = MED_PREPS[(k // 3) % 3]
            loc_clause, gold_loc = f" {prep} {med}", med
        else:
            loc = LOC_PHYS[(k // 10) % 8]
            prep = PHYS_PREPS[(k // 2) % 2]
            loc_clause = f" {prep} {loc}"
            # gold drops the leading article (reference corpus 100:8)
            gold_loc = loc[4:] if loc.startswith("the ") else loc

    # ---- duration (G4: derived from the time range when absent).
    # Explicit-duration rate 78.5% ⇒ overall null = 0.215 × 7/8 ≈ 18.8%,
    # the measured §1.2 rate (range styles backfill the derived duration).
    dur_clause, gold_dur = "", None
    if (k * 13) % 1000 >= 215:
        dt_text, dt_gold = DUR_PAIRS[(k // 13) % 8]
        verb = DUR_VERBS[(k // 6) % 2]
        dur_clause, gold_dur = f" {verb} {dt_text}", dt_gold
    elif range_delta is not None:
        gold_dur = f"{range_delta} minutes"

    # ---- recurrence (rare — §1.2: 96.7% null; keyword prefixed). The
    # keyword stays part of the gold action (corpus: always kept); the
    # recurrence field lowercases a sentence-initial "Weekly" (majority).
    rec_prefix, gold_rec = "", None
    if (k * 23) % 1000 < 33:
        kw = REC_KWS[(k // 25) % 8]
        rec_prefix = kw + " "
        gold_rec = "weekly" if kw == "Weekly" else kw

    # ---- notes (rare — §1.2: 98.2% null)
    note_clause, gold_note = ".", None
    if (k * 29) % 1000 < 18:
        gold_note = NOTES[(k // 40) % 4]
        note_clause = f". Note: {gold_note}."

    action = ACTIONS[(k // 6) % len(ACTIONS)]
    action_text = action
    if k % 10 == 4:
        # P9 noise: "meeting"→"mtg"; gold keeps "mtg" here because the next
        # token is a date (the corpus expands only before attendee clauses)
        action_text = action.replace("meeting", "mtg")
        action = action_text
    if rec_prefix:
        # the text renders rec_prefix separately; gold action includes it
        action = f"{rec_prefix}{action}"
    date_intro = " " if s_date == 6 else (" on " if (k // 9) % 2 == 0 else " ")
    time_intro = " " if s_time == 5 else TIME_INTROS[(k // 21) % 3]

    text = (
        f"{rec_prefix}{action_text}{date_intro}{date_text}{time_intro}{time_text}"
        f"{att_clause}{loc_clause}{dur_clause}{note_clause}"
    )
    if k % 10 == 6:  # P9 noise: emoji tail; gold unchanged
        text = f"{text} 🙂"

    # a confirmation echo of the same request later in the conversation —
    # exercises window-based co-referent canonicalization
    has_echo = (k % 50 == 0) and (req_turn + 1 < n_turns)

    return EventSpec(
        k=k, n_turns=n_turns, req_turn=req_turn, has_echo=has_echo, text=text,
        action=action, date=gold_date, time=gold_time, attendees=gold_att,
        location=gold_loc, duration=gold_dur, recurrence=gold_rec,
        notes=gold_note,
    )


def turns_for_key(k: int):
    """All transcript rows for conversation ``k``:
    (conv_id, turn_idx, role, text, tool, ts)."""
    spec = event_spec(k)
    conv_id = f"conv-{k}"
    second = event_spec(second_key(k)) if has_second_event(k) else None
    rows = []
    for j in range(spec.n_turns):
        if j == spec.req_turn or (spec.has_echo and j == spec.req_turn + 1):
            role, text, tool = "user", spec.text, None
        elif second is not None and j == spec.req_turn + 1:
            role, text, tool = "user", second.text, None
        else:
            role = ("assistant", "user", "tool")[(k + j) % 3]
            text = DISTRACTORS[(k + 7 * j) % 6]
            tool = "calendar_api" if role == "tool" else None
        ts = TS_EPOCH + _dt.timedelta(seconds=(k % 1_000_000) * 60 + j * 30)
        rows.append((conv_id, j, role, text, tool, ts))
    return rows


def gold_rows_for_key(k: int):
    """Gold (conv_id, turn_idx, 8 fields) rows — one per canonical event."""
    conv_id = f"conv-{k}"
    s = event_spec(k)
    out = [(conv_id, s.req_turn, s)]
    if has_second_event(k):
        out.append((conv_id, s.req_turn + 1, event_spec(second_key(k))))
    return out
