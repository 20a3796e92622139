"""Query DSL: parser + AST.

Grammar reproduced from the reference's regex parser
(/root/reference/src/refimage/dsl.py:296-399) plus the functional form
its LLM prompt targets (/root/reference/src/refimage/llm.py:399-449):

- precedence lowest -> highest:  OR  ->  AND  ->  NOT(binary)
  (successive splits; no parentheses in the infix form)
- leaf: ``#tag`` extraction (``#(\\w+)``), ``^w`` clause weight
  (``\\^(\\d*\\.?\\d+)``), residual free text
- leaf with both text and tags => implicit AND(text, tagfilter)
  (/root/reference/src/refimage/dsl.py:349-364)
- functional form: TEXT("..."), AND(a,b,...), OR(a,b,...),
  EXCLUDE(base, excl), WEIGHT(expr, w)

Weight range: the reference validates [0,1] in the DSL but [0,2] in the
LLM grammar (dsl.py:62 vs llm.py:408) — we adopt [0,2] (SURVEY.md §7.4).

Determinism fix vs reference: its boolean nodes return ``list(set(...))``
(nondeterministic order, /root/reference/src/refimage/dsl.py:196,234,282);
our executor pins total order (score desc, doc_id asc) at every node.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class DSLParseError(ValueError):
    pass


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class TextQuery(Node):
    text: str
    weight: float = 1.0


@dataclass(frozen=True)
class TagFilter(Node):
    tags: tuple[str, ...]
    mode: str = "any"  # any | all


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default=())


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default=())


@dataclass(frozen=True)
class Not(Node):
    base: Node
    exclude: Node


_TAG_RE = re.compile(r"#(\w+)")
_WEIGHT_RE = re.compile(r"\^(\d*\.?\d+)")
_OR_RE = re.compile(r"\bOR\b", re.IGNORECASE)
_AND_RE = re.compile(r"\bAND\b", re.IGNORECASE)
_NOT_RE = re.compile(r"^(.+?)\bNOT\b(.+)$", re.IGNORECASE | re.DOTALL)

MAX_WEIGHT = 2.0


def _check_weight(w: float) -> float:
    if not (0.0 <= w <= MAX_WEIGHT):
        raise DSLParseError(f"weight {w} out of range [0,{MAX_WEIGHT}]")
    return w


def _parse_simple(q: str) -> Node:
    """Leaf: tags + weight + residual text (dsl.py:336-366 semantics)."""
    tags = tuple(t.strip().lower() for t in _TAG_RE.findall(q))
    wm = _WEIGHT_RE.search(q)
    weight = _check_weight(float(wm.group(1))) if wm else 1.0
    text = _TAG_RE.sub(" ", q)
    text = _WEIGHT_RE.sub(" ", text)
    text = " ".join(text.split()).strip()
    if text and tags:
        return And((TextQuery(text, weight), TagFilter(tags, "any")))
    if tags:
        return TagFilter(tags, "any")
    if text:
        return TextQuery(text, weight)
    raise DSLParseError("empty query")


def _parse_not(q: str) -> Node:
    m = _NOT_RE.match(q)
    if m:
        return Not(_parse_simple(m.group(1).strip()), _parse_simple(m.group(2).strip()))
    return _parse_simple(q.strip())


def _parse_and(q: str) -> Node:
    parts = [p.strip() for p in _AND_RE.split(q) if p.strip()]
    if len(parts) > 1:
        return And(tuple(_parse_not(p) for p in parts))
    return _parse_not(q.strip())


def parse(query: str) -> Node:
    """Parse either the infix DSL or the functional LLM-grammar form."""
    if query is None or not query.strip():
        raise DSLParseError("empty query")
    q = query.strip()
    if re.match(r"^(TEXT|AND|OR|EXCLUDE|WEIGHT)\s*\(", q):
        node, pos = _parse_func(q, 0)
        if q[pos:].strip():
            raise DSLParseError(f"trailing input at {pos}: {q[pos:]!r}")
        return node
    parts = [p.strip() for p in _OR_RE.split(q) if p.strip()]
    if len(parts) > 1:
        return Or(tuple(_parse_and(p) for p in parts))
    return _parse_and(q)


# ---- functional grammar (recursive-descent) --------------------------------

_FUNC_RE = re.compile(r"\s*(TEXT|AND|OR|EXCLUDE|WEIGHT)\s*\(")


def _parse_func(s: str, pos: int) -> tuple[Node, int]:
    m = _FUNC_RE.match(s, pos)
    if not m:
        raise DSLParseError(f"expected function at {pos}: {s[pos:pos+20]!r}")
    name, pos = m.group(1), m.end()
    if name == "TEXT":
        sm = re.match(r'\s*"((?:[^"\\]|\\.)*)"\s*\)', s[pos:])
        if not sm:
            raise DSLParseError(f'TEXT expects a quoted string at {pos}')
        return _parse_simple(sm.group(1)), pos + sm.end()
    args: list = []
    while True:
        if name == "WEIGHT" and len(args) == 1:
            nm = re.match(r"\s*(\d*\.?\d+)\s*", s[pos:])
            if not nm:
                raise DSLParseError(f"WEIGHT expects a number at {pos}")
            args.append(_check_weight(float(nm.group(1))))
            pos += nm.end()
        else:
            node, pos = _parse_func(s, pos)
            args.append(node)
        m2 = re.match(r"\s*([,)])", s[pos:])
        if not m2:
            raise DSLParseError(f"expected , or ) at {pos}")
        pos += m2.end()
        if m2.group(1) == ")":
            break
    if name == "AND":
        return And(tuple(args)), pos
    if name == "OR":
        return Or(tuple(args)), pos
    if name == "EXCLUDE":
        if len(args) != 2:
            raise DSLParseError("EXCLUDE takes exactly 2 args")
        return Not(args[0], args[1]), pos
    if name == "WEIGHT":
        if len(args) != 2 or not isinstance(args[1], float):
            raise DSLParseError("WEIGHT takes (expr, number)")
        return _apply_weight(args[0], args[1]), pos
    raise DSLParseError(f"unknown function {name}")


def _apply_weight(node: Node, w: float) -> Node:
    if isinstance(node, TextQuery):
        return TextQuery(node.text, _check_weight(node.weight * w))
    if isinstance(node, And):
        return And(tuple(_apply_weight(c, w) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(_apply_weight(c, w) for c in node.children))
    if isinstance(node, Not):
        return Not(_apply_weight(node.base, w), node.exclude)
    return node  # TagFilter: weight is a no-op (unscored)


def syntax() -> dict:
    """DSL syntax reference (rebuild of the reference's static
    /conversions/dsl-syntax endpoint, src/refimage/api.py:231-267 /
    DSLSyntaxResponse schemas.py:80-86): version, operator table, and
    worked examples — each example verified parseable by THIS parser
    (asserted in tests), so the documentation can never drift from the
    grammar."""
    return {
        "syntax_version": "1.0",
        "description": (
            "query grammar for BM25 retrieval over the web-page index: "
            "free text ranks, operators compose, #tags restrict"
        ),
        "operators": {
            "AND": "conjunction: every clause must match",
            "OR": "disjunction: at least one clause matches",
            "NOT": "exclusion: drop docs matching the right side",
            "^": "per-clause relevance weight in [0.0, 2.0]",
            "#": "tag filter over the doc's tag set (language, source)",
        },
        "examples": [
            {
                "query": "shuffle partition #en",
                "description": "ranked text restricted to English pages",
                "explanation": "implicit AND of TEXT('shuffle partition') and tag 'en'",
            },
            {
                "query": "index merge NOT tombstone",
                "description": "ranked text with an exclusion",
                "explanation": "docs scoring on 'index merge' minus any matching 'tombstone'",
            },
            {
                "query": "broadcast join^1.5 OR sort merge join^0.5",
                "description": "weighted disjunction",
                "explanation": "score = 1.5*bm25('broadcast join') + 0.5*bm25('sort merge join')",
            },
            {
                "query": 'EXCLUDE(TEXT("stream window"), TEXT("batch"))',
                "description": "functional form of NOT",
                "explanation": "same tree as 'stream window NOT batch'",
            },
        ],
    }
