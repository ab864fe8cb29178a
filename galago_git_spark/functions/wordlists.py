"""Word-list resources — the WordLists.java analog
(``core/.../util/WordLists.java:25-70``): load a named stop list from the
packaged resources (``resources/stopwords/<name>``) or a filesystem path,
skip ``#`` comment lines, cache per-process.

The packaged lists (``inquery``, ``smart``, ``rmstop``, ``stopStructure``)
are byte-identical to the reference's public resources so stopping agrees
term-for-term (see resources/stopwords/README.md).
"""

from __future__ import annotations

import os
from functools import lru_cache

_RESOURCE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "stopwords",
)


@lru_cache(maxsize=None)
def word_list(name: str = "inquery") -> frozenset[str]:
    """Named word list as a set (WordLists.getWordList): a filesystem path
    wins if it exists, else the packaged resource."""
    path = name if os.path.exists(name) else os.path.join(_RESOURCE_DIR, name)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no word list {name!r} (looked in {path})")
    out = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            t = line.strip()
            if t:
                out.add(t)
    return frozenset(out)


@lru_cache(maxsize=None)
def stop_structures(name: str = "stopStructure") -> tuple[str, ...]:
    """Stop-structure prefixes, each normalized to end with one space
    (StopStructureTraversal.java:30-38)."""
    return tuple(s.strip() + " " for s in word_list(name))
