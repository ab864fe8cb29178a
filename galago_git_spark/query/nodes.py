"""Query IR — the analog of Galago's ``Node`` + ``NodeParameters``
(``core/.../retrieval/query/Node.java:19-42``, ``NodeParameters.java:36-44``).

A ``Node`` is (operator name, typed scalar parameter map, children). The
default parameter (Galago's ``:default=``, e.g. the term of ``#counts:dog()``
or the width of ``#od:2``) is stored under key ``"default"``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

Scalar = Union[str, int, float, bool]


@dataclass
class Node:
    operator: str
    parameters: dict[str, Scalar] = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)

    # --- NodeParameters-style typed access ---
    def get_str(self, key: str, default: str | None = None) -> str | None:
        v = self.parameters.get(key, default)
        return None if v is None else str(v)

    def get_int(self, key: str, default: int | None = None) -> int | None:
        v = self.parameters.get(key, default)
        return None if v is None else int(v)

    def get_float(self, key: str, default: float | None = None) -> float | None:
        v = self.parameters.get(key, default)
        return None if v is None else float(v)

    def get_bool(self, key: str, default: bool | None = None) -> bool | None:
        v = self.parameters.get(key, default)
        if isinstance(v, str):
            return v.lower() == "true"
        return None if v is None else bool(v)

    @property
    def default_param(self) -> Scalar | None:
        return self.parameters.get("default")

    def indexed_weights(self) -> list[float]:
        """Positional weights ``0=,1=,...`` (ScoreCombinationIterator.java:50-59);
        missing positions default to 1.0."""
        return [
            float(self.parameters.get(str(i), 1.0))
            for i in range(len(self.children))
        ]

    def __str__(self) -> str:  # Galago Node.toString-style, used for CSE keys
        parts = []
        if "default" in self.parameters:
            parts.append(_fmt_scalar(self.parameters["default"]))
        for k in sorted(self.parameters):
            if k != "default":
                parts.append(f"{k}={_fmt_scalar(self.parameters[k])}")
        head = f"#{self.operator}"
        if parts:
            head += ":" + ":".join(parts)
        if not self.children:
            return head + "()"
        return head + "( " + " ".join(str(c) for c in self.children) + " )"


def _fmt_scalar(v: Scalar) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def term_node(term: str) -> Node:
    return Node("counts", {"default": term})


def is_term_leaf(n: Node) -> bool:
    return n.operator in ("counts", "extents", "text") and not n.children
