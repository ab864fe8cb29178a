"""Galago structured-query parser.

Grammar (``core/.../retrieval/query/StructuredQuery.java:13-21,75-99``,
lexer ``StructuredLexer.java:77-126``)::

    query    := item+                      (multiple top-level -> #root)
    item     := '#' op params? '(' item* ')' | quoted | bare
    params   := (':' key '=' value | ':' value)*   (bare ':v' -> default)
    quoted   := '"' term+ '"'              -> #od:1(terms)   (#quote)
    bare     := term | term '.' field      (field restriction -> #inside)

Values with '=' become key=value parameters; a bare ':v' sets the default
parameter (e.g. ``#od:2``). Escapes via ``@/.../`` delimiters are not
supported (not needed for the reference query set).
"""

from __future__ import annotations

import re

from galago_git_spark.query.nodes import Node, Scalar, term_node

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<quoted>"[^"]*") |
    (?P<escaped>@(?P<edelim>\S)(?P<ebody>.*?)(?P=edelim)) |
    (?P<op>\#[\w-]+(?::[^\s()#":]+)*) |
    (?P<term>[^\s()#"]+)
    """,
    re.VERBOSE,
)


def _parse_scalar(s: str) -> Scalar:
    if s.lower() in ("true", "false"):
        return s.lower() == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _parse_op(tok: str) -> Node:
    body = tok[1:]
    parts = body.split(":")
    op = parts[0]
    params: dict[str, Scalar] = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            params[k] = _parse_scalar(v)
        else:
            params["default"] = _parse_scalar(p)
    return Node(op, params)


def _field_list_node(names: list[str]) -> Node:
    """Field list -> single #field or #extentor over them
    (StructuredQuery.nodeWithOptionalExtentOr, StructuredQuery.java:149-160)."""
    fields = [Node("field", {"default": f}) for f in names]
    if len(fields) == 1:
        return fields[0]
    return Node("extentor", {}, fields)


def _term_or_field(tok: str) -> Node:
    """Bare term, or dotted field restrictions: ``x.f1`` / ``x.f1,f2``
    (extent-or over fields) / chained ``x.f1.f2`` (nested #inside)
    (StructuredQuery.parseRestricted, StructuredQuery.java:162-182)."""
    if "." in tok and not re.fullmatch(r"[\d.]+", tok):
        parts = tok.split(".")
        node = term_node(parts[0])
        for spec in parts[1:]:
            names = [f for f in spec.split(",") if f]
            if not names:
                raise ValueError(f"empty field restriction in {tok!r}")
            node = Node("inside", {}, [node, _field_list_node(names)])
        return node
    return term_node(tok)


def parse(query: str) -> Node:
    """Parse a query string into a Node tree (StructuredQuery.parse,
    ``StructuredQuery.java:214-233``). Multiple top-level items are
    wrapped in #root (given a real operator by TransformRootTraversal)."""
    stack: list[Node] = [Node("root")]
    for m in _TOKEN_RE.finditer(query):
        kind = m.lastgroup
        if m.group("escaped") is not None:
            kind = "escaped"  # lastgroup reports the inner (ebody) group
        tok = m.group()
        if kind == "op":
            node = _parse_op(tok)
            stack[-1].children.append(node)
        elif kind == "lparen":
            if not stack[-1].children:
                raise ValueError(f"'(' without operator in {query!r}")
            stack.append(stack[-1].children[-1])
        elif kind == "rparen":
            if len(stack) == 1:
                raise ValueError(f"unbalanced ')' in {query!r}")
            stack.pop()
        elif kind == "escaped":
            # @/a b c/ — SPECIALQUOTE: the body is ONE term, delimiter is
            # the char after '@' (StructuredLexer.java:152-165)
            stack[-1].children.append(term_node(m.group("ebody")))
        elif kind == "quoted":
            terms = tok.strip('"').split()
            if len(terms) == 1:
                stack[-1].children.append(term_node(terms[0]))
            else:
                stack[-1].children.append(
                    Node("ordered", {"default": 1}, [term_node(t) for t in terms])
                )
        else:
            if tok.endswith("."):
                # smoothing restriction `x.(f1,f2)` (StructuredQuery.
                # parseArgument, StructuredQuery.java:184-198): the '('
                # that follows opens the field list
                stack[-1].children.append(
                    Node("smoothinside", {}, [_term_or_field(tok[:-1])])
                )
            else:
                stack[-1].children.append(_term_or_field(tok))
    if len(stack) != 1:
        raise ValueError(f"unbalanced '(' in {query!r}")
    root = stack[0]
    root = _finish_smoothinside(root)
    if len(root.children) == 1:
        return root.children[0]
    return root


def _finish_smoothinside(node: Node) -> Node:
    """Normalize a parsed ``#smoothinside`` — its paren-list children are
    field-name tokens; fold them into one field/#extentor second child
    (StructuredQuery.nodeWithOptionalExtentOr)."""
    node.children = [_finish_smoothinside(c) for c in node.children]
    if node.operator != "smoothinside":
        return node
    if len(node.children) < 2:
        raise ValueError("smoothing restriction '.(...)' needs field names")
    names: list[str] = []
    for c in node.children[1:]:
        if c.operator != "counts" or c.children:
            raise ValueError("smoothing restriction fields must be bare names")
        names.extend(f for f in str(c.default_param).split(",") if f)
    return Node("smoothinside", {}, [node.children[0], _field_list_node(names)])
