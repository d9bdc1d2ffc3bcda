"""Expression mini-language for input mappers — a from-scratch compiler
covering the expr-lang subset the reference actually exercises
(`examples/expression/main.go:65-90`, engine wiring
`pkg/spider/workflow.go:379-391`):

  literals        42, 3.14, 'str', "str", true, false, nil
  identifiers     a, dotted access a.b.c, indexing a[0], calls f(x, y)
  unary           !x, -x
  binary          * / %  + -  == != < <= > >=  &&  ||  (usual precedence)
  grouping        ( ... )
  string concat   + on strings

Design difference from the reference (deliberate, SURVEY.md §2 #6): the
reference re-compiles every expression per record
(`pkg/spider/workflow.go:379`); here compile_expr() parses ONCE per
(edge, field) into a closure tree that is evaluated per record.

Divergence note: `/` is true division (Python semantics) — expr-lang
integer `/` truncates; none of the reference's shipped flows rely on
truncation, and our oracle fixtures define conformance.
"""

from __future__ import annotations

import re
from typing import Any, Callable

class ExprError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<dq>"(?:[^"\\]|\\.)*")
  | (?P<sq>'(?:[^'\\]|\\.)*')
  | (?P<op>\|\||&&|==|!=|<=|>=|[-+*/%!<>()\[\],.])
    """,
    re.VERBOSE,
)

_KEYWORDS = {"true": True, "false": False, "nil": None}


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise ExprError(f"bad character {src[pos]!r} at {pos} in {src!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: {"n": "\n", "t": "\t"}.get(m.group(1), m.group(1)), body)


Node = Callable[[dict], Any]


class _Parser:
    """Recursive-descent / precedence-climbing parser producing closures."""

    _BINOPS: list[dict[str, Callable[[Any, Any], Any]]] = [
        {"||": None},      # special-cased (short circuit)
        {"&&": None},
        {"==": lambda a, b: a == b, "!=": lambda a, b: a != b,
         "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
         ">": lambda a, b: a > b, ">=": lambda a, b: a >= b},
        {"+": lambda a, b: a + b, "-": lambda a, b: a - b},
        {"*": lambda a, b: a * b, "/": lambda a, b: a / b,
         "%": lambda a, b: a % b},
    ]

    def __init__(self, src: str):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def take(self, kind=None, value=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (value and v != value):
            raise ExprError(f"expected {value or kind}, got {v!r} in {self.src!r}")
        self.i += 1
        return v

    def parse(self) -> Node:
        node = self.expr(0)
        if self.peek()[0] != "eof":
            raise ExprError(f"trailing tokens at {self.peek()[1]!r} in {self.src!r}")
        return node

    def expr(self, level: int) -> Node:
        if level >= len(self._BINOPS):
            return self.unary()
        node = self.expr(level + 1)
        ops = self._BINOPS[level]
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.take("op")
            rhs = self.expr(level + 1)
            lhs = node
            if op == "||":
                node = lambda env, l=lhs, r=rhs: bool(l(env)) or bool(r(env))
            elif op == "&&":
                node = lambda env, l=lhs, r=rhs: bool(l(env)) and bool(r(env))
            else:
                fn = ops[op]
                node = lambda env, l=lhs, r=rhs, f=fn: f(l(env), r(env))
        return node

    def unary(self) -> Node:
        k, v = self.peek()
        if k == "op" and v == "!":
            self.take()
            inner = self.unary()
            return lambda env, n=inner: not n(env)
        if k == "op" and v == "-":
            self.take()
            inner = self.unary()
            return lambda env, n=inner: -n(env)
        return self.postfix()

    def postfix(self) -> Node:
        node = self.primary()
        while True:
            k, v = self.peek()
            if k == "op" and v == ".":
                self.take()
                name = self.take("name")
                node = lambda env, n=node, a=name: _access(n(env), a)
            elif k == "op" and v == "[":
                self.take()
                idx = self.expr(0)
                self.take("op", "]")
                node = lambda env, n=node, ix=idx: n(env)[ix(env)]
            elif k == "op" and v == "(":
                self.take()
                args = []
                if not (self.peek()[0] == "op" and self.peek()[1] == ")"):
                    args.append(self.expr(0))
                    while self.peek()[1] == ",":
                        self.take()
                        args.append(self.expr(0))
                self.take("op", ")")
                node = lambda env, n=node, aa=tuple(args): n(env)(*[a(env) for a in aa])
            else:
                return node

    def primary(self) -> Node:
        k, v = self.peek()
        if k == "int":
            self.take()
            return lambda env, c=int(v): c
        if k == "float":
            self.take()
            return lambda env, c=float(v): c
        if k in ("sq", "dq"):
            self.take()
            return lambda env, c=_unquote(v): c
        if k == "name":
            self.take()
            if v in _KEYWORDS:
                return lambda env, c=_KEYWORDS[v]: c
            return lambda env, name=v: _lookup(env, name)
        if k == "op" and v == "(":
            self.take()
            node = self.expr(0)
            self.take("op", ")")
            return node
        raise ExprError(f"unexpected token {v!r} in {self.src!r}")


def _lookup(env: dict, name: str) -> Any:
    try:
        return env[name]
    except KeyError:
        raise ExprError(f"unknown identifier {name!r}")


def _access(obj: Any, attr: str) -> Any:
    if isinstance(obj, dict):
        try:
            return obj[attr]
        except KeyError:
            raise ExprError(f"no field {attr!r} in {sorted(obj)!r}")
    return getattr(obj, attr)


def compile_expr(src: str) -> Node:
    """Compile once; returns fn(env) -> value."""
    return _Parser(src).parse()
