"""Prompt construction and inversion (reference P5/P6).

The reference formats instruction templates around ``event_text``
(``src/prompts.py:21-33``, 4 variants) with newline-collapse + strip, and
recovers the text from a prompt by literal replacement
(``src/evaluate_baseline.py:137``). Pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the eval-time prompt used identically across all reference eval scripts
EVAL_PREFIX = "Extract calendar information from: "
EVAL_SUFFIX = "\nCalendar JSON:"

PROMPT_TEMPLATES = {
    # src/prompts.py:1-19 — four instruction variants around the same text
    "minimal": ("Text: ", "\nJSON:"),
    "eval": (EVAL_PREFIX, EVAL_SUFFIX),
    "instruct": (
        "Extract the calendar event fields from the following request.\nRequest: ",
        "\nAnswer JSON:",
    ),
    "chat": ("<|user|>Extract calendar JSON: ", "<|assistant|>"),
}


def clean_text_col(text: Column) -> Column:
    """Newline-collapse + strip (prompt builders' preprocessing)."""
    return F.trim(F.regexp_replace(text, r"\s*\n\s*", " "))


def build_prompt_col(text: Column, variant: str = "eval") -> Column:
    prefix, suffix = PROMPT_TEMPLATES[variant]
    return F.concat(F.lit(prefix), clean_text_col(text), F.lit(suffix))


def invert_prompt_col(prompt: Column, variant: str = "eval") -> Column:
    """Recover event_text from a prompt (reference does literal
    str.replace; anchored regex strip is the vectorized equivalent)."""
    prefix, suffix = PROMPT_TEMPLATES[variant]
    import re as _re

    body = F.regexp_replace(prompt, "^" + _re.escape(prefix), "")
    return F.regexp_replace(body, _re.escape(suffix) + "$", "")
