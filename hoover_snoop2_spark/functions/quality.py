"""Text-quality scoring, token counting and document fingerprinting for
training-data pipelines.

These have no direct reference analog (snoop2 stops at extraction +
indexing); they are the standard quality gates a Common-Crawl-scale corpus
needs before model training (C4/Gopher-style heuristics).  Everything is
built from JVM-side column expressions — no Python in the hot path — so the
same definitions translate 1:1 into the DuckDB oracle SQL used by the
correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny English stopword set shared verbatim with the oracle SQL
QUALITY_STOPWORDS = ("the", "and", "of", "to", "in", "is", "that", "it")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters."""
    n = F.length(text)
    a = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(a / n)


def stopword_hits(text: Column) -> Column:
    """Occurrences of the shared stopword set as whole lowercase tokens."""
    lowered = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    padded = F.regexp_replace(lowered, r"\s+", " ")
    total = F.lit(0).cast("long")
    for w in QUALITY_STOPWORDS:
        pat = f" {w} "
        # non-overlapping occurrence count via length difference
        total = total + (
            (F.length(padded) - F.length(F.regexp_replace(padded, pat, " ")))
            / F.lit(len(pat) - 1)
        ).cast("long")
    return total


def quality_columns(text: Column) -> dict[str, Column]:
    """The scoring bundle: apply with ``df.withColumns(...)``."""
    toks = token_count(text)
    return {
        "n_tokens": toks,
        "punct_ratio": F.round(punct_ratio(text), 4),
        "alpha_ratio": F.round(alpha_ratio(text), 4),
        "stopword_hits": stopword_hits(text),
        "mean_token_len": F.round(
            F.when(toks == 0, F.lit(0.0)).otherwise(
                F.length(F.regexp_replace(F.trim(text), r"\s+", "")) / toks
            ),
            4,
        ),
    }


def quality_flag(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-ish keep/drop flag: enough tokens, sane token length, not
    punctuation soup.  Thresholds are deliberately simple + oracle-checkable.
    """
    cols = quality_columns(F.col(text_col))
    out = df.withColumns(cols)
    return out.withColumn(
        "quality_keep",
        (F.col("n_tokens") >= 5)
        & (F.col("mean_token_len") >= 2)
        & (F.col("mean_token_len") <= 15)
        & (F.col("punct_ratio") <= 0.3),
    )


def dup_line_ratio(text: Column) -> Column:
    """Gopher repetition gate: fraction of non-blank lines that duplicate
    an earlier line — pure array expressions, no shuffle."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(lines))) / n
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the casefolded,
    whitespace-normalized text (the exact-dedup key used downstream)."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(F.encode(normalized, "UTF-8"))


#: PII patterns shared by Spark (Java regex) and the DuckDB oracle (RE2) —
#: only constructs with identical semantics in both engines
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONG_NUMBER_RE = r"\b\d{9,}\b"


def mask_pii(col: F.Column) -> F.Column:
    """Training-data PII scrub: emails → <EMAIL>, IPv4 → <IP>, 9+-digit
    runs (phone/account/ssn-shaped) → <NUM>.  Pure JVM regexp_replace
    chain — order matters: IPs are consumed before the long-number rule
    so their octet runs don't half-match."""
    out = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_LONG_NUMBER_RE, "<NUM>")


#: C4's page-level blocklist (Raffel et al. 2020 §2.2 uses the "List of
#: Dirty, Naughty, Obscene or Otherwise Bad Words"; the list itself is a
#: deployment policy input — these two placeholders exercise the rule).
C4_BAD_WORDS = ("badword1", "badword2")


def c4_line_clean(lines: Column, bad_words=C4_BAD_WORDS) -> dict[str, Column]:
    """C4's line- and page-level cleaning rules (Raffel et al. 2020,
    §2.2 — the filter that built the C4 corpus from Common Crawl):

    - keep only lines ending in terminal punctuation (``. ! ? "``),
    - keep only lines with at least 3 words,
    - drop any line mentioning ``javascript``,
    - drop the whole page if it contains a blocklisted word, the phrase
      ``lorem ipsum``, or a curly brace (template/code leakage),
    - drop the page if fewer than 5 lines survive ("at least five
      sentences").

    Everything is a JVM higher-order function over the pre-split line
    array — zero Python, zero shuffle; at 100 TB this runs entirely
    inside whole-stage codegen next to the scan.  Returns named columns
    (not a struct) so callers choose their own output shape."""
    kept = F.filter(
        lines,
        lambda ln: ln.rlike('[.!?"]$')
        & (F.size(F.split(ln, " ")) >= 3)
        & ~ln.contains("javascript"),
    )
    page = F.array_join(lines, "\n")
    drop_badword = F.lit(False)
    for w in bad_words:
        drop_badword = drop_badword | page.contains(w)
    drop_lorem = page.contains("lorem ipsum")
    drop_brace = page.contains("{") | page.contains("}")
    n_kept = F.size(kept).cast("long")
    pass_min_lines = n_kept >= 5
    return {
        "n_kept": n_kept,
        "kept_text": F.array_join(kept, "\n"),
        "drop_badword": drop_badword,
        "drop_lorem": drop_lorem,
        "drop_brace": drop_brace,
        "pass_min_lines": pass_min_lines,
        "pass_overall": pass_min_lines
        & ~(drop_badword | drop_lorem | drop_brace),
    }
