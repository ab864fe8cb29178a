"""Pure-SQL Porter2 (Snowball English) stemmer for the DuckDB oracles.

This is a SECOND, independent implementation of the public Porter2
algorithm (snowballstem.org) — written as a chain of SQL CTEs so the
driver's DuckDB oracle can reproduce the stemmed index without calling
any Python from ``galago_git_spark``. Cross-tested against both the
Python implementation (functions/stem.py) and the reference-behavior
golden vectors in tests/test_stem.py.

Design notes (all stages single-pass, per-distinct-term):

- consonant-y marking uses non-overlapping global regex replacement:
  ``([aeiouy])y -> \\1Y`` consumes the vowel, so a run of y's alternates
  vowel/consonant exactly like the left-to-right scan in the spec;
- R1/R2 are byte offsets computed once on the marked word via the
  ``^[^aeiouy]*[aeiouy]+[^aeiouy]`` prefix regex (gopast v, gopast
  non-v), then compared against the *current* length at each step, the
  same fixed-position semantics as the algorithm;
- each algorithm step is one CTE; lateral column aliases carry the
  matched suffix so longest-match + side-condition logic stays readable.
"""

from __future__ import annotations

# short-syllable test at the end of a string expression {x}
_SHORT = (
    "(regexp_matches({x}, '[^aeiouy][aeiouy][^aeiouywxY]$') OR regexp_matches({x}, '^[aeiouy][^aeiouy]$'))"
)

_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXC2 = ("inning", "outing", "canning", "herring", "earring",
         "proceed", "exceed", "succeed")

_STEP2 = [  # (suffix, replacement or None-for-side-condition), longest first
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"), ("izer", "ize"),
    ("ator", "ate"), ("alli", "al"),
    ("ogi", None), ("bli", "ble"),
    ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"),
    ("alize", "al"), ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]

_STEP4 = ["ement", "ance", "ence", "able", "ible", "ment",
          "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
          "al", "er", "ic"]


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _suffix_case(col: str, suffixes: list[str]) -> str:
    """CASE picking the longest matching suffix (NULL if none)."""
    ordered = sorted(suffixes, key=len, reverse=True)
    whens = "\n    ".join(
        f"WHEN right({col}, {len(s)}) = {_sq(s)} THEN {_sq(s)}"
        for s in ordered
    )
    return f"CASE\n    {whens}\n    ELSE NULL END"


def porter2_ctes(src: str, out: str = "stemmed") -> str:
    """CTE chain string: ``src`` must expose a ``term`` column; ``out``
    exposes (term, stem). Meant to be interpolated into a WITH clause:
    ``WITH {TOKS}, ..., {porter2_ctes('vocab')}, ...``."""
    exc1_case = "CASE term " + " ".join(
        f"WHEN {_sq(k)} THEN {_sq(v)}" for k, v in _EXC1.items()
    ) + " END"
    exc1_in = ", ".join(_sq(k) for k in _EXC1)
    exc2_in = ", ".join(_sq(k) for k in _EXC2)

    repl2 = "CASE s2 " + " ".join(
        f"WHEN {_sq(s)} THEN {_sq(r)}" for s, r in _STEP2 if r is not None
    ) + " END"
    repl3 = "CASE s3 " + " ".join(
        f"WHEN {_sq(s)} THEN {_sq(r)}" for s, r in _STEP3 if r is not None
    ) + " END"

    short_w1b = _SHORT.format(x="d1b")
    short_w5 = _SHORT.format(x="left(w4, len(w4)-1)")

    return f"""p2_p0 AS (
  SELECT term,
         (len(term) < 3 OR term IN ({exc1_in})) AS done,
         CASE WHEN len(term) < 3 THEN term ELSE {exc1_case} END AS out,
         regexp_replace(
           regexp_replace(
             CASE WHEN left(term, 1) = '''' THEN substr(term, 2) ELSE term END,
             '^y', 'Y'),
           '([aeiouy])y', '\\1Y', 'g') AS w
  FROM {src}),
p2_pr AS (
  SELECT term, done, out, w,
         regexp_extract(w, '^[^aeiouy]*[aeiouy]+[^aeiouy]') AS m1,
         CASE WHEN left(w, 6) = 'commun' THEN 6
              WHEN left(w, 5) IN ('gener', 'arsen') THEN 5
              WHEN m1 = '' THEN len(w) ELSE len(m1) END AS r1,
         regexp_extract(substr(w, r1 + 1),
                        '^[^aeiouy]*[aeiouy]+[^aeiouy]') AS m2,
         CASE WHEN m2 = '' THEN len(w) ELSE r1 + len(m2) END AS r2
  FROM p2_p0),
p2_s0 AS (  -- step 0: longest of 's'  's  '
  SELECT term, done, out, r1, r2,
         CASE WHEN right(w, 3) = '''s''' THEN left(w, len(w)-3)
              WHEN right(w, 2) = '''s' THEN left(w, len(w)-2)
              WHEN right(w, 1) = '''' THEN left(w, len(w)-1)
              ELSE w END AS w
  FROM p2_pr),
p2_s1a AS (  -- step 1a + exception2
  SELECT term, r1, r2,
         CASE WHEN right(w, 4) = 'sses' THEN left(w, len(w)-2)
              WHEN right(w, 3) IN ('ied', 'ies') THEN
                CASE WHEN len(w) > 4 THEN left(w, len(w)-2)
                     ELSE left(w, len(w)-1) END
              WHEN right(w, 2) IN ('us', 'ss') THEN w
              WHEN right(w, 1) = 's' THEN
                CASE WHEN regexp_matches(substr(w, 1, len(w)-2), '[aeiouy]')
                     THEN left(w, len(w)-1) ELSE w END
              ELSE w END AS w1a,
         (NOT done AND w1a IN ({exc2_in})) AS exc2,
         (done OR exc2) AS done,
         CASE WHEN exc2 THEN w1a ELSE out END AS out,
         w1a AS w
  FROM p2_s0),
p2_s1b AS (  -- step 1b
  SELECT term, done, out, r1, r2,
         CASE WHEN right(w, 5) = 'eedly' THEN 'eedly'
              WHEN right(w, 5) = 'ingly' THEN 'ingly'
              WHEN right(w, 4) = 'edly' THEN 'edly'
              WHEN right(w, 3) = 'eed' THEN 'eed'
              WHEN right(w, 3) = 'ing' THEN 'ing'
              WHEN right(w, 2) = 'ed' THEN 'ed'
              ELSE NULL END AS s1b,
         CASE WHEN s1b IS NULL THEN w
              ELSE left(w, len(w) - len(s1b)) END AS d1b,
         CASE
           WHEN s1b IN ('eedly', 'eed') THEN
             CASE WHEN len(w) - len(s1b) >= r1 THEN d1b || 'ee' ELSE w END
           WHEN s1b IS NOT NULL THEN
             CASE WHEN regexp_matches(d1b, '[aeiouy]') THEN
               CASE WHEN right(d1b, 2) IN ('at', 'bl', 'iz') THEN d1b || 'e'
                    WHEN right(d1b, 2) IN ('bb','dd','ff','gg','mm','nn','pp','rr','tt')
                      THEN left(d1b, len(d1b)-1)
                    WHEN r1 >= len(d1b) AND {short_w1b} THEN d1b || 'e'
                    ELSE d1b END
             ELSE w END
           ELSE w END AS w
  FROM p2_s1a),
p2_s1c AS (  -- step 1c: y/Y -> i after interior non-vowel
  SELECT term, done, out, r1, r2,
         CASE WHEN len(w) >= 3 AND right(w, 1) IN ('y', 'Y')
                   AND NOT regexp_matches(substr(w, len(w)-1, 1), '[aeiouy]')
              THEN left(w, len(w)-1) || 'i' ELSE w END AS w
  FROM p2_s1b),
p2_s2 AS (  -- step 2 (suffix start in R1)
  SELECT term, done, out, r1, r2,
         {_suffix_case("w", [s for s, _ in _STEP2])} AS s2,
         CASE WHEN s2 IS NULL OR len(w) - len(s2) < r1 THEN w
              WHEN s2 = 'ogi' THEN
                CASE WHEN right(w, 4) = 'logi' THEN left(w, len(w)-1)
                     ELSE w END
              WHEN s2 = 'li' THEN
                CASE WHEN len(w) >= 3 AND substr(w, len(w)-2, 1) IN
                          ('c','d','e','g','h','k','m','n','r','t')
                     THEN left(w, len(w)-2) ELSE w END
              ELSE left(w, len(w) - len(s2)) || {repl2} END AS w2
  FROM p2_s1c),
p2_s3 AS (  -- step 3 (suffix start in R1; ative needs R2)
  SELECT term, done, out, r1, r2,
         {_suffix_case("w2", [s for s, _ in _STEP3])} AS s3,
         CASE WHEN s3 IS NULL OR len(w2) - len(s3) < r1 THEN w2
              WHEN s3 = 'ative' THEN
                CASE WHEN len(w2) - 5 >= r2 THEN left(w2, len(w2)-5)
                     ELSE w2 END
              ELSE left(w2, len(w2) - len(s3)) || {repl3} END AS w3
  FROM p2_s2),
p2_s4 AS (  -- step 4 (suffix start in R2; ion needs s/t before)
  SELECT term, done, out, r1, r2,
         {_suffix_case("w3", _STEP4)} AS s4,
         CASE WHEN s4 IS NULL OR len(w3) - len(s4) < r2 THEN w3
              WHEN s4 = 'ion' THEN
                CASE WHEN len(w3) >= 4 AND substr(w3, len(w3)-3, 1) IN ('s','t')
                     THEN left(w3, len(w3)-3) ELSE w3 END
              ELSE left(w3, len(w3) - len(s4)) END AS w4
  FROM p2_s3),
{out} AS (  -- step 5 + postlude (Y -> y); merge exception rows
  SELECT term,
         CASE WHEN done THEN coalesce(out, term)
              ELSE replace(
                CASE WHEN right(w4, 1) = 'e'
                          AND (len(w4) - 1 >= r2
                               OR (len(w4) - 1 >= r1 AND NOT {short_w5}))
                     THEN left(w4, len(w4)-1)
                     WHEN right(w4, 1) = 'l' AND len(w4) - 1 >= r2
                          AND len(w4) >= 2 AND substr(w4, len(w4)-1, 1) = 'l'
                     THEN left(w4, len(w4)-1)
                     ELSE w4 END,
                'Y', 'y') END AS stem
  FROM p2_s4)"""
