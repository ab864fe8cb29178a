"""Term-transform (stemming) plane.

The reference's default build writes a stemmed postings part alongside the
raw one and routes query terms to it (``core/.../tools/apps/
BuildIndex.java:409-455``; part resolution ``index/disk/
DiskIndex.java:200-222``; query-side routing ``util/TextPartAssigner.java``).
The stemmer contract is ``parse/stem/Stemmer.java``: a per-term string
transform with an LRU-ish cache, plus ``stemAsRequired`` which maps each
``~``-joined component of a window key (``Stemmer.java:94-117``).

This module provides:

- ``porter2``: a from-scratch implementation of the public Porter2
  (Snowball English) algorithm — the reference's ``Porter2Stemmer.java``
  delegates to ``org/tartarus/snowball/ext/englishStemmer``; this
  implementation is pinned test-for-test against that stemmer's output on
  a 12k-word vector set (tests/test_stem.py) generated from the published
  algorithm's reference behavior.
- a stemmer registry (``register_stemmer``) — the SURVEY §2.2
  ``term_transform`` hook: any ``str -> str`` callable can be registered
  and used by ``build_index(stemmer=...)`` and query compilation.
- ``stem_pandas``: the Arrow-vectorized column transform used by the
  build (per-batch memo cache, so the per-term cost is paid once per
  distinct term per batch — the analog of Stemmer.java's term cache).

Krovetz stays excluded per the north rule (code-aware, Krovetz-free).
"""

from __future__ import annotations

from collections.abc import Callable

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# exception1 (whole-word, checked before anything else)
_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# exception2 (whole-word, checked after step 1a; stops further steps)
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

_R1_PREFIXES = ("gener", "commun", "arsen")


def _is_vowel(ch: str) -> bool:
    # 'Y' (the consonant-marked y) is deliberately NOT a vowel
    return ch in _VOWELS


def _std_region(word: str, start: int) -> int:
    """Position after the first non-vowel following a vowel, scanning from
    ``start``; len(word) if none (the null region)."""
    n = len(word)
    i = start
    while i < n and not _is_vowel(word[i]):
        i += 1
    while i < n and _is_vowel(word[i]):
        i += 1
    return i + 1 if i < n else n


def _mark_regions(word: str) -> tuple[int, int]:
    r1 = None
    for p in _R1_PREFIXES:
        if word.startswith(p):
            r1 = len(p)
            break
    if r1 is None:
        r1 = _std_region(word, 0)
    r2 = _std_region(word, r1)
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """shortv, tested at the end of ``word``: vowel + non-vowel(not w/x/Y)
    preceded by a non-vowel; or a word-initial vowel + non-vowel."""
    n = len(word)
    if n >= 3:
        a, b, c = word[n - 3], word[n - 2], word[n - 1]
        if not _is_vowel(a) and _is_vowel(b) and not _is_vowel(c) and c not in "wxY":
            return True
    if n == 2 and _is_vowel(word[0]) and not _is_vowel(word[1]):
        return True
    return False


_STEP2 = [
    # (suffix, replacement) — longest-match order handled by sorting below
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"),
    ("tional", "tion"), ("biliti", "ble"), ("lessli", "less"),
    ("entli", "ent"), ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"), ("izer", "ize"),
    ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"),
    # 'ogi' and 'li' have side conditions, handled inline
    ("ogi", None), ("li", None),
]

_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
    ("ative", None),  # R2 side condition
]

_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion",  # side condition: preceded by s or t
    "al", "er", "ic",
]


def porter2(word: str) -> str:
    """Porter2 / Snowball English stemmer (public algorithm,
    snowballstem.org); behavior-pinned to the reference's
    ``englishStemmer`` output (tests/test_stem.py golden vectors)."""
    if len(word) < 3:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]

    # prelude: strip one leading apostrophe; mark consonant y as Y
    if word[0] == "'":
        word = word[1:]
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _mark_regions(word)

    # step 0: longest of 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        # delete if a vowel exists before the penultimate character
        if any(_is_vowel(c) for c in word[: -2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if any(_is_vowel(c) for c in stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # step 1c: y/Y -> i after a non-vowel that is not the first letter
    if (
        len(word) >= 3
        and word[-1] in "yY"
        and not _is_vowel(word[-2])
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must start in R1); longest-match, no shorter retry
    m = _longest_suffix(word, [s for s, _ in _STEP2])
    if m is not None:
        repl = dict(_STEP2)[m]
        if len(word) - len(m) >= r1:
            if m == "ogi":
                if word.endswith("logi"):
                    word = word[:-1]
            elif m == "li":
                if len(word) >= 3 and word[-3] in _LI_ENDING:
                    word = word[:-2]
            else:
                word = word[: -len(m)] + repl

    # step 3 (suffix must start in R1)
    m = _longest_suffix(word, [s for s, _ in _STEP3])
    if m is not None and len(word) - len(m) >= r1:
        if m == "ative":
            if len(word) - len(m) >= r2:
                word = word[: -len(m)]
        else:
            word = word[: -len(m)] + dict(_STEP3)[m]

    # step 4 (suffix must start in R2)
    m = _longest_suffix(word, _STEP4)
    if m is not None and len(word) - len(m) >= r2:
        if m == "ion":
            if len(word) >= 4 and word[-4] in "st":
                word = word[:-3]
        else:
            word = word[: -len(m)]

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def _longest_suffix(word: str, suffixes: list[str]) -> str | None:
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def identity(term: str) -> str:
    """NullStemmer.java analog — the default (north rule: raw code-aware
    tokens are the primary part)."""
    return term


# --------------------------------------------------------------------------
# registry — the SURVEY §2.2 term_transform hook
# --------------------------------------------------------------------------

def _arabic(term: str) -> str:
    # lazy import keeps the (large-table) Arabic module off the porter2
    # fast path; resolved once per executor process
    from galago_git_spark.functions.stem_arabic import arabic

    return arabic(term)


_STEMMERS: dict[str, Callable[[str], str]] = {
    "null": identity,
    "porter2": porter2,
    # SnowballArabicStemmer.java:6 analog (public Snowball 'arabic'
    # algorithm, pinned to the reference's output — stem_arabic.py)
    "arabic": _arabic,
    "snowball_arabic": _arabic,
}


def register_stemmer(name: str, fn: Callable[[str], str]) -> None:
    """Register a custom term transform under ``name`` so
    ``build_index(stemmer=name)`` and query routing can use it — the
    ``stemmerClass`` map hook (BuildIndex.java:139-161) without the
    reflection."""
    if not callable(fn):
        raise TypeError("stemmer must be a callable str -> str")
    _STEMMERS[name] = fn


def get_stemmer(name: str) -> Callable[[str], str]:
    if name not in _STEMMERS:
        raise ValueError(
            f"unknown stemmer {name!r}; known: {sorted(_STEMMERS)} "
            "(register_stemmer adds custom transforms)"
        )
    return _STEMMERS[name]


def stem_as_required(term: str, stemmer: Callable[[str], str]) -> str:
    """Stemmer.stemAsRequired (Stemmer.java:94-101): window keys
    (``a~b~c``) stem per component."""
    if "~" in term:
        return "~".join(stemmer(t) for t in term.split("~"))
    return stemmer(term)


def stem_pandas(col, stemmer_name: str):
    """Arrow-vectorized stem of a string Column — one Python call per
    distinct term per batch (dict memo, the Stemmer.java cache analog)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _stem(s):
        fn = get_stemmer(stemmer_name)
        cache: dict[str, str] = {}

        def one(t):
            if t is None:
                return None
            hit = cache.get(t)
            if hit is None:
                hit = cache[t] = fn(t)
            return hit

        return s.map(one)

    # real (non-string) hints: this module uses `from __future__ import
    # annotations`, so inline hints would reach pandas_udf as strings
    _stem.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_stem, "string")(col)
