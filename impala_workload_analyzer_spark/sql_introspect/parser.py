"""Mini SQL frontend: tokenizer + recursive-descent parser + feature
visitor + parameterizer.

Re-implements the reference's Java surface (SURVEY.md §2.9) without the
Impala frontend jars (absent from the snapshot, ``.MISSING_LARGE_BLOBS``)
and without third-party parsers (no sqlglot in this environment):

- Q1/Q2 statement classification — AST root class name
  (``QueryAnalyzer.java:14-45,339-345``): SelectStmt / UnionStmt /
  InsertStmt / CreateTableStmt / ...
- Q3/Q4 feature counting — pre-order expression visitors per clause with
  the reference's exact merge semantics (``QueryStats.java:95-131``):
  ``num_output_columns`` is NOT merged (a union takes the LAST operand's
  value, ``QueryAnalyzer.java:66-71``; ``SELECT *`` pins it to -1,
  ``QueryAnalyzer.java:93-99``); ``max_depth_subqueries`` merges with max
  and +1 when this level has FROM- or WHERE-subqueries
  (``QueryAnalyzer.java:277-279``).
- Q5 parameterization — canonical template via AST rewrite + SQL
  regeneration (``Parameterizer.java:16-208``): bool -> FALSE, number -> 1,
  string -> '?', column refs -> ? (table qualifier dropped), table/view
  names and USING columns -> ?, aliases stripped (inline-view aliases
  become ?), ORDER BY / LIMIT / OFFSET parameterized, recursion into
  views, subqueries, and union operands. Insert statements are NOT
  parameterized (``QueryAnalyzer.java:22-31`` never calls the
  parameterizer) — they yield None.

Regenerated SQL aligns with the Apache Impala frontend's ``toSql()``
conventions wherever they are hand-checkable from the public sources
(r05 parity pass): uppercase keywords, explicit ASC/DESC, no redundant
parens from CompoundPredicate/InPredicate (an IN-subquery renders ONE
paren pair, supplied by Subquery.toSql), ``NOT LIKE`` as a NOT-wrapped
LikePredicate, INTERVAL units printed as written, window frames rendered
``ROWS|RANGE [BETWEEN] ... [AND ...]``. The r06 pass closed the last
two open cases against the public Apache frontend sources: nested CASE
renders in ``CaseExpr.toSql``'s single-space ``CASE [op] WHEN .. THEN ..
[ELSE ..] END`` form and chained BETWEEN as ``expr [NOT] BETWEEN lo AND
hi`` joined by the CompoundPredicate — both pinned in
``tests/test_sql_introspect.py``. The snapshot ships no Impala frontend
jars (``.MISSING_LARGE_BLOBS``), so BYTE-parity against the reference
binary itself stays unverifiable; no knowingly-open rendering deviation
remains. ``tests/test_sql_introspect.py`` pins the corpus-shape
templates.

Everything here is pure Python executed inside Arrow-batched
``mapInPandas`` (see ``queries.py``) — the AST never crosses into Spark.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# --- tokens -----------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|--[^\n]*\n?)
  | (?P<string>'(?:[^']|'')*')
  | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=>|<>|!=|<=|>=|\|\||[=<>+\-*/%(),.\[\]])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "having", "order",
    "limit", "offset", "union", "all", "as", "and", "or", "not", "in",
    "between", "like", "rlike", "regexp", "is", "null", "exists", "case",
    "when", "then", "else", "end", "cast", "join", "inner", "left", "right",
    "full", "outer", "cross", "on", "using", "with", "insert", "into",
    "overwrite", "values", "true", "false", "interval", "over", "partition",
    "asc", "desc",
}


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise SqlParseError(f"bad character {sql[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "name" and text.lower() in _KEYWORDS:
            out.append(("kw", text.lower()))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


class SqlParseError(Exception):
    pass


# --- AST --------------------------------------------------------------------


@dataclass
class Expr:
    def children(self) -> list["Expr"]:
        return []


@dataclass
class Literal(Expr):
    kind: str  # bool | number | string | null
    value: str


@dataclass
class SlotRef(Expr):
    table: str | None
    name: str


@dataclass
class Star(Expr):
    pass


@dataclass
class Binary(Expr):
    op: str  # = != <= >= < > <=>
    left: Expr
    right: Expr

    def children(self):
        return [self.left, self.right]


@dataclass
class Compound(Expr):
    op: str  # AND OR NOT
    operands: list[Expr]

    def children(self):
        return list(self.operands)


@dataclass
class Arith(Expr):
    op: str
    operands: list[Expr]

    def children(self):
        return list(self.operands)


@dataclass
class TimestampArith(Expr):
    op: str
    operands: list[Expr]
    unit: str = ""  # time unit keyword — not an expression child

    def children(self):
        return list(self.operands)


@dataclass
class Like(Expr):
    op: str  # LIKE RLIKE REGEXP
    left: Expr
    right: Expr

    def children(self):
        return [self.left, self.right]


@dataclass
class InPred(Expr):
    expr: Expr
    items: list[Expr]
    negated: bool

    def children(self):
        return [self.expr, *self.items]


@dataclass
class Between(Expr):
    expr: Expr
    low: Expr
    high: Expr
    negated: bool

    def children(self):
        # mirrors BetweenPredicate.addChildren(originalChildren_)
        # (QueryAnalyzer.java:161-170)
        return [self.expr, self.low, self.high]


@dataclass
class IsNull(Expr):
    expr: Expr
    negated: bool

    def children(self):
        return [self.expr]


@dataclass
class ExistsPred(Expr):
    sub: "SubqueryExpr"

    def children(self):
        return [self.sub]


@dataclass
class FuncCall(Expr):
    name: str
    args: list[Expr]
    distinct: bool = False

    def children(self):
        return list(self.args)


@dataclass
class FrameBound:
    """One boundary of an analytic window frame: UNBOUNDED
    PRECEDING/FOLLOWING, CURRENT ROW, or <expr> PRECEDING/FOLLOWING."""
    kind: str  # "PRECEDING" | "FOLLOWING" | "CURRENT ROW"
    expr: "Expr | None"  # None for UNBOUNDED / CURRENT ROW
    unbounded: bool = False


@dataclass
class Frame:
    """ROWS/RANGE window frame (AnalyticWindow in the Impala frontend)."""
    units: str  # "ROWS" | "RANGE"
    low: FrameBound
    high: "FrameBound | None"  # None for the single-bound form


@dataclass
class Analytic(Expr):
    """fn(...) OVER (...): children include the base call, mirroring
    AnalyticExpr's child list so the visitor counts both (window frame
    boundary exprs included, as in AnalyticExpr's child registration)."""
    call: FuncCall
    partition: list[Expr]
    order: list["OrderItem"]
    frame: "Frame | None" = None

    def children(self):
        bounds = []
        if self.frame is not None:
            for b in (self.frame.low, self.frame.high):
                if b is not None and b.expr is not None:
                    bounds.append(b.expr)
        return [self.call, *self.partition,
                *[o.expr for o in self.order], *bounds]


@dataclass
class Case(Expr):
    operand: Expr | None
    whens: list[tuple[Expr, Expr]]
    default: Expr | None

    def children(self):
        out = [] if self.operand is None else [self.operand]
        for w, t in self.whens:
            out.extend([w, t])
        if self.default is not None:
            out.append(self.default)
        return out


@dataclass
class Cast(Expr):
    expr: Expr
    type_name: str

    def children(self):
        return [self.expr]


@dataclass
class SubqueryExpr(Expr):
    stmt: "QueryStmt"


@dataclass
class OrderItem:
    expr: Expr
    asc: bool


@dataclass
class SelectItem:
    expr: Expr | None  # None => star
    alias: str | None
    star_table: str | None = None


@dataclass
class TableRef:
    name: str | None  # None for inline views
    alias: str | None
    view_stmt: "QueryStmt | None" = None
    col_labels: list[str] | None = None
    join_op: str | None = None  # None for the first ref / comma join
    on: Expr | None = None
    using: list[str] | None = None


@dataclass
class WithView:
    name: str
    col_labels: list[str] | None
    stmt: "QueryStmt"


@dataclass
class QueryStmt:
    pass


@dataclass
class SelectStmt(QueryStmt):
    items: list[SelectItem] = field(default_factory=list)
    distinct: bool = False
    table_refs: list[TableRef] = field(default_factory=list)
    where: Expr | None = None
    group_by: list[Expr] = field(default_factory=list)
    having: Expr | None = None
    order_by: list[OrderItem] = field(default_factory=list)
    limit: Expr | None = None
    offset: Expr | None = None
    with_views: list[WithView] = field(default_factory=list)


@dataclass
class UnionStmt(QueryStmt):
    operands: list[tuple[QueryStmt, bool]] = field(default_factory=list)  # (stmt, is_all)
    order_by: list[OrderItem] = field(default_factory=list)
    limit: Expr | None = None
    offset: Expr | None = None
    with_views: list[WithView] = field(default_factory=list)


@dataclass
class InsertStmt:
    overwrite: bool
    target: str
    query: QueryStmt


@dataclass
class OtherStmt:
    type_name: str


# --- parser -----------------------------------------------------------------


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.pos = 0

    def peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def accept_kw(self, *kws: str) -> str | None:
        kind, text = self.peek()
        if kind == "kw" and text in kws:
            self.next()
            return text
        return None

    def expect_kw(self, kw: str) -> None:
        if not self.accept_kw(kw):
            raise SqlParseError(f"expected {kw.upper()}, got {self.peek()}")

    def accept_name(self, *words: str) -> str | None:
        """Match a non-reserved word (ROWS/RANGE/PRECEDING/... stay plain
        name tokens so they remain usable as identifiers elsewhere)."""
        kind, text = self.peek()
        if kind == "name" and text.lower() in words:
            self.next()
            return text.lower()
        return None

    def accept_op(self, *ops: str) -> str | None:
        kind, text = self.peek()
        if kind == "op" and text in ops:
            self.next()
            return text
        return None

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            raise SqlParseError(f"expected {op!r}, got {self.peek()}")

    def expect_name(self) -> str:
        kind, text = self.next()
        if kind not in ("name",):
            raise SqlParseError(f"expected identifier, got {(kind, text)}")
        return text

    # statements

    def parse_statement(self):
        kind, text = self.peek()
        if kind == "kw" and text == "insert":
            return self.parse_insert()
        if kind == "kw" and text in ("select", "with") or (kind == "op" and text == "("):
            return self.parse_query()
        if kind == "name" or kind == "kw":
            word = text.upper()
            type_map = {
                "CREATE": "CreateTableStmt", "DROP": "DropStmt",
                "ALTER": "AlterTableStmt", "SHOW": "ShowStmt",
                "DESCRIBE": "DescribeStmt", "USE": "UseStmt",
                "COMPUTE": "ComputeStatsStmt", "REFRESH": "ResetMetadataStmt",
                "INVALIDATE": "ResetMetadataStmt",
            }
            return OtherStmt(type_map.get(word, word.title() + "Stmt"))
        raise SqlParseError(f"cannot classify statement starting with {(kind, text)}")

    def parse_insert(self) -> InsertStmt:
        self.expect_kw("insert")
        overwrite = bool(self.accept_kw("overwrite"))
        if not overwrite:
            self.expect_kw("into")
        if self.peek() == ("name", "table") or self.peek() == ("name", "TABLE"):
            self.next()  # tolerate INSERT ... TABLE t
        target = self.expect_name()
        while self.accept_op("."):
            target = self.expect_name()
        if self.peek() == ("op", "("):  # column list
            self.next()
            while not self.accept_op(")"):
                self.next()
        query = self.parse_query()
        return InsertStmt(overwrite, target, query)

    def parse_query(self) -> QueryStmt:
        views: list[WithView] = []
        if self.accept_kw("with"):
            while True:
                name = self.expect_name()
                labels = self._col_label_list()
                self.expect_kw("as")
                self.expect_op("(")
                stmt = self.parse_query()
                self.expect_op(")")
                views.append(WithView(name, labels, stmt))
                if not self.accept_op(","):
                    break
        operands: list[tuple[QueryStmt, bool]] = [(self.parse_select_core(), True)]
        while self.accept_kw("union"):
            is_all = bool(self.accept_kw("all"))
            self.accept_kw("distinct")
            operands.append((self.parse_select_core(), is_all))
        order, limit, offset = self._order_limit()
        if len(operands) == 1:
            sel = operands[0][0]
            assert isinstance(sel, SelectStmt)
            sel.order_by, sel.limit, sel.offset = order, limit, offset
            sel.with_views = views
            return sel
        return UnionStmt(operands, order, limit, offset, views)

    def _col_label_list(self) -> list[str] | None:
        if self.peek() == ("op", "("):
            self.next()
            labels = [self.expect_name()]
            while self.accept_op(","):
                labels.append(self.expect_name())
            self.expect_op(")")
            return labels
        return None

    def _order_limit(self):
        order: list[OrderItem] = []
        limit = offset = None
        if self.accept_kw("order"):
            self.expect_kw("by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.accept_kw("desc"):
                    asc = False
                else:
                    self.accept_kw("asc")
                order.append(OrderItem(e, asc))
                if not self.accept_op(","):
                    break
        if self.accept_kw("limit"):
            limit = self.parse_expr()
            if self.accept_kw("offset"):
                offset = self.parse_expr()
        return order, limit, offset

    def parse_select_core(self) -> SelectStmt:
        if self.peek() == ("op", "("):
            # parenthesized sub-select as a union operand
            self.next()
            stmt = self.parse_query()
            self.expect_op(")")
            assert isinstance(stmt, SelectStmt)
            return stmt
        self.expect_kw("select")
        stmt = SelectStmt(distinct=bool(self.accept_kw("distinct")))
        while True:
            stmt.items.append(self._select_item())
            if not self.accept_op(","):
                break
        if self.accept_kw("from"):
            stmt.table_refs.append(self._table_ref(None))
            while True:
                if self.accept_op(","):
                    stmt.table_refs.append(self._table_ref(None))
                    continue
                join_op = self._join_op()
                if join_op is None:
                    break
                ref = self._table_ref(join_op)
                if join_op != "CROSS JOIN":
                    if self.accept_kw("on"):
                        ref.on = self.parse_expr()
                    elif self.accept_kw("using"):
                        ref.using = self._col_label_list()
                stmt.table_refs.append(ref)
        if self.accept_kw("where"):
            stmt.where = self.parse_expr()
        if self.accept_kw("group"):
            self.expect_kw("by")
            stmt.group_by.append(self.parse_expr())
            while self.accept_op(","):
                stmt.group_by.append(self.parse_expr())
        if self.accept_kw("having"):
            stmt.having = self.parse_expr()
        return stmt

    def _select_item(self) -> SelectItem:
        kind, text = self.peek()
        if kind == "op" and text == "*":
            self.next()
            return SelectItem(None, None)
        if kind == "name" and self.peek(1) == ("op", ".") and self.peek(2) == ("op", "*"):
            table = self.expect_name()
            self.next(), self.next()
            return SelectItem(None, None, star_table=table)
        e = self.parse_expr()
        alias = None
        if self.accept_kw("as"):
            alias = self.expect_name()
        elif self.peek()[0] == "name":
            alias = self.expect_name()
        return SelectItem(e, alias)

    def _join_op(self) -> str | None:
        for kws, name in (
            (("inner", "join"), "INNER JOIN"), (("left", "outer", "join"), "LEFT OUTER JOIN"),
            (("left", "join"), "LEFT OUTER JOIN"), (("right", "outer", "join"), "RIGHT OUTER JOIN"),
            (("right", "join"), "RIGHT OUTER JOIN"), (("full", "outer", "join"), "FULL OUTER JOIN"),
            (("full", "join"), "FULL OUTER JOIN"), (("cross", "join"), "CROSS JOIN"),
            (("join",), "INNER JOIN"),
        ):
            if all(self.peek(i) == ("kw", kw) for i, kw in enumerate(kws)):
                for _ in kws:
                    self.next()
                return name
        return None

    def _table_ref(self, join_op: str | None) -> TableRef:
        if self.peek() == ("op", "("):
            self.next()
            stmt = self.parse_query()
            self.expect_op(")")
            alias = None
            labels = None
            if self.accept_kw("as"):
                alias = self.expect_name()
                labels = self._col_label_list()
            elif self.peek()[0] == "name":
                alias = self.expect_name()
                labels = self._col_label_list()
            return TableRef(None, alias, view_stmt=stmt, col_labels=labels,
                            join_op=join_op)
        name = self.expect_name()
        while self.accept_op("."):
            name = name + "." + self.expect_name()
        alias = None
        if self.accept_kw("as"):
            alias = self.expect_name()
        elif self.peek()[0] == "name":
            alias = self.expect_name()
        return TableRef(name, alias, join_op=join_op)

    # expressions (precedence climbing)

    def parse_expr(self) -> Expr:
        return self._or()

    def _or(self) -> Expr:
        left = self._and()
        while self.accept_kw("or"):
            left = Compound("OR", [left, self._and()])
        return left

    def _and(self) -> Expr:
        left = self._not()
        while self.accept_kw("and"):
            left = Compound("AND", [left, self._not()])
        return left

    def _not(self) -> Expr:
        if self.accept_kw("not"):
            return Compound("NOT", [self._not()])
        return self._predicate()

    def _predicate(self) -> Expr:
        left = self._additive()
        while True:
            op = self.accept_op("=", "!=", "<>", "<=", ">=", "<", ">", "<=>")
            if op:
                op = "!=" if op == "<>" else op
                left = Binary(op, left, self._additive())
                continue
            negated = False
            save = self.pos
            if self.accept_kw("not"):
                negated = True
            if self.accept_kw("in"):
                self.expect_op("(")
                if self.peek()[0] == "kw" and self.peek()[1] in ("select", "with"):
                    sub = SubqueryExpr(self.parse_query())
                    items = [sub]
                else:
                    items = [self.parse_expr()]
                    while self.accept_op(","):
                        items.append(self.parse_expr())
                self.expect_op(")")
                left = InPred(left, items, negated)
                continue
            if self.accept_kw("between"):
                low = self._additive()
                self.expect_kw("and")
                left = Between(left, low, self._additive(), negated)
                continue
            lk = self.accept_kw("like", "rlike", "regexp")
            if lk:
                left = Like(lk.upper(), left, self._additive())
                if negated:  # a NOT LIKE b == NOT (a LIKE b), as in the
                    left = Compound("NOT", [left])  # Impala grammar
                continue
            if negated:
                self.pos = save
                break
            if self.accept_kw("is"):
                neg = bool(self.accept_kw("not"))
                self.expect_kw("null")
                left = IsNull(left, neg)
                continue
            break
        return left

    def _additive(self) -> Expr:
        left = self._multiplicative()
        while True:
            op = self.accept_op("+", "-", "||")
            if not op:
                return left
            if self.accept_kw("interval"):
                amount = self._multiplicative()
                unit = self.expect_name()
                # unit keeps its written case: TimestampArithmeticExpr.toSql
                # prints timeUnitIdent_ as parsed
                left = TimestampArith(op, [left, amount], unit=unit)
            else:
                right = self._multiplicative()
                left = Arith(op, [left, right])

    def _multiplicative(self) -> Expr:
        left = self._unary()
        while True:
            op = self.accept_op("*", "/", "%")
            if not op:
                return left
            left = Arith(op, [left, self._unary()])

    def _unary(self) -> Expr:
        if self.accept_op("-"):
            return Arith("-", [self._unary()])
        return self._primary()

    def _primary(self) -> Expr:
        kind, text = self.peek()
        if kind == "op" and text == "(":
            self.next()
            if self.peek()[0] == "kw" and self.peek()[1] in ("select", "with"):
                stmt = self.parse_query()
                self.expect_op(")")
                return SubqueryExpr(stmt)
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if kind == "kw" and text == "exists":
            self.next()
            self.expect_op("(")
            stmt = self.parse_query()
            self.expect_op(")")
            return ExistsPred(SubqueryExpr(stmt))
        if kind == "kw" and text == "case":
            return self._case()
        if kind == "kw" and text == "cast":
            self.next()
            self.expect_op("(")
            e = self.parse_expr()
            self.expect_kw("as")
            tname = self.expect_name()
            if self.peek() == ("op", "("):  # e.g. DECIMAL(10, 2)
                self.next()
                while not self.accept_op(")"):
                    self.next()
            self.expect_op(")")
            return Cast(e, tname.upper())
        if kind == "kw" and text in ("true", "false"):
            self.next()
            return Literal("bool", text.upper())
        if kind == "kw" and text == "null":
            self.next()
            return Literal("null", "NULL")
        if kind == "string":
            self.next()
            return Literal("string", text)
        if kind == "number":
            self.next()
            return Literal("number", text)
        if kind == "name":
            if self.peek(1) == ("op", "("):
                return self._func_call()
            name = self.expect_name()
            table = None
            while self.accept_op("."):
                table = name if table is None else f"{table}.{name}"
                name = self.expect_name()
            return SlotRef(table, name)
        raise SqlParseError(f"unexpected token {(kind, text)} in expression")

    def _case(self) -> Case:
        self.expect_kw("case")
        operand = None
        if not (self.peek()[0] == "kw" and self.peek()[1] == "when"):
            operand = self.parse_expr()
        whens = []
        while self.accept_kw("when"):
            w = self.parse_expr()
            self.expect_kw("then")
            whens.append((w, self.parse_expr()))
        default = None
        if self.accept_kw("else"):
            default = self.parse_expr()
        self.expect_kw("end")
        return Case(operand, whens, default)

    def _func_call(self) -> Expr:
        name = self.expect_name()
        self.expect_op("(")
        distinct = bool(self.accept_kw("distinct"))
        args: list[Expr] = []
        if self.peek() == ("op", "*"):
            self.next()
            args.append(Star())
        elif self.peek() != ("op", ")"):
            args.append(self.parse_expr())
            while self.accept_op(","):
                args.append(self.parse_expr())
        self.expect_op(")")
        call = FuncCall(name.lower(), args, distinct)
        if self.accept_kw("over"):
            self.expect_op("(")
            partition: list[Expr] = []
            order: list[OrderItem] = []
            if self.accept_kw("partition"):
                self.expect_kw("by")
                partition.append(self.parse_expr())
                while self.accept_op(","):
                    partition.append(self.parse_expr())
            if self.accept_kw("order"):
                self.expect_kw("by")
                while True:
                    e = self.parse_expr()
                    asc = not self.accept_kw("desc")
                    if asc:
                        self.accept_kw("asc")
                    order.append(OrderItem(e, asc))
                    if not self.accept_op(","):
                        break
            frame = None
            units = self.accept_name("rows", "range")
            if units:
                def bound() -> FrameBound:
                    if self.accept_name("unbounded"):
                        which = self.accept_name("preceding", "following")
                        if not which:
                            raise SqlParseError("expected PRECEDING/FOLLOWING")
                        return FrameBound(which.upper(), None, True)
                    if self.accept_name("current"):
                        if not self.accept_name("row"):
                            raise SqlParseError("expected ROW")
                        return FrameBound("CURRENT ROW", None)
                    e = self.parse_expr()
                    which = self.accept_name("preceding", "following")
                    if not which:
                        raise SqlParseError("expected PRECEDING/FOLLOWING")
                    return FrameBound(which.upper(), e)
                if self.accept_kw("between"):
                    lo = bound()
                    self.expect_kw("and")
                    frame = Frame(units.upper(), lo, bound())
                else:
                    frame = Frame(units.upper(), bound(), None)
            self.expect_op(")")
            return Analytic(call, partition, order, frame)
        return call


def parse_sql(sql: str):
    """Q1 — lex + parse one statement (QueryAnalyzer.java:335-337)."""
    p = _Parser(sql)
    stmt = p.parse_statement()
    return stmt


def classify_statement(sql: str) -> str:
    """Q2 — AST root class name (QueryAnalyzer.java:14-45)."""
    try:
        stmt = parse_sql(sql)
    except SqlParseError:
        return "UnparsedStmt"
    return type(stmt).__name__ if not isinstance(stmt, OtherStmt) else stmt.type_name


# --- feature counting (Q3/Q4) ----------------------------------------------

_COMPOUND_OPS = ("AND", "OR", "NOT")
_BINARY_OPS = ("=", "!=", "<=", ">=", "<", ">", "<=>")
_LIKE_OPS = ("LIKE", "RLIKE", "REGEXP")


def _new_stats() -> dict:
    s = {
        "num_output_columns": 0, "num_from_subqueries": 0,
        "num_where_subqueries": 0, "num_with_subqueries": 0,
        "max_depth_subqueries": 0, "num_group_by_columns": 0,
        "num_order_by_columns": 0, "num_limits": 0,
        "num_where_in_predicates": 0, "num_where_between_predicates": 0,
        "num_where_exists_predicates": 0, "num_where_is_null_predicates": 0,
        "num_where_function_call_exprs": 0, "num_where_case_exprs": 0,
        "num_where_arithmetic_exprs": 0, "num_where_cast_exprs": 0,
        "num_where_timestamp_arithmetic_exprs": 0,
        "num_select_case_exprs": 0, "num_select_arithmetic_exprs": 0,
        "num_select_cast_exprs": 0, "num_select_function_call_exprs": 0,
        "num_select_analytic_exprs": 0, "num_select_is_null_predicates": 0,
        "num_having_function_call_exprs": 0, "num_using_columns": 0,
        "num_on_function_call_exprs": 0, "num_on_between_predicates": 0,
        "num_where_compound_predicates": {op: 0 for op in _COMPOUND_OPS},
        "num_select_compound_predicates": {op: 0 for op in _COMPOUND_OPS},
        "num_having_compound_predicates": {op: 0 for op in _COMPOUND_OPS},
        "num_on_compound_predicates": {op: 0 for op in _COMPOUND_OPS},
        "num_where_binary_predicates": {op: 0 for op in _BINARY_OPS},
        "num_select_binary_predicates": {op: 0 for op in _BINARY_OPS},
        "num_having_binary_predicates": {op: 0 for op in _BINARY_OPS},
        "num_on_binary_predicates": {op: 0 for op in _BINARY_OPS},
        "num_where_like_predicates": {op: 0 for op in _LIKE_OPS},
    }
    return s


def _merge(a: dict, b: dict) -> None:
    """QueryStats.merge (QueryStats.java:95-131): everything summed EXCEPT
    num_output_columns (not merged) and max_depth_subqueries (max)."""
    for key, val in b.items():
        if key == "num_output_columns":
            continue
        if key == "max_depth_subqueries":
            a[key] = max(a[key], val)
        elif isinstance(val, dict):
            for op, n in val.items():
                a[key][op] = a[key].get(op, 0) + n
        else:
            a[key] += val


def _walk(expr: Expr, visit) -> None:
    visit(expr)
    for child in expr.children():
        _walk(child, visit)


def _query_stats(stmt: QueryStmt) -> dict:
    if isinstance(stmt, SelectStmt):
        return _select_stats(stmt)
    return _union_stats(stmt)


def _union_stats(stmt: UnionStmt) -> dict:
    """QueryAnalyzer.getUnionQueryStats (QueryAnalyzer.java:43-73)."""
    s = _new_stats()
    for view in stmt.with_views:
        s["num_with_subqueries"] += 1
        _merge(s, _query_stats(view.stmt))
    s["num_order_by_columns"] += len(stmt.order_by)
    if stmt.limit is not None:
        s["num_limits"] += 1
    for operand, _ in stmt.operands:
        op_stats = _query_stats(operand)
        # assignment, not merge: LAST operand wins (QueryAnalyzer.java:66-71)
        s["num_output_columns"] = op_stats["num_output_columns"]
        _merge(s, op_stats)
    return s


def _select_stats(stmt: SelectStmt) -> dict:  # noqa: PLR0915
    """QueryAnalyzer.getSelectQueryStats (QueryAnalyzer.java:76-282)."""
    s = _new_stats()
    for view in stmt.with_views:
        s["num_with_subqueries"] += 1
        _merge(s, _query_stats(view.stmt))

    for item in stmt.items:
        if item.expr is None:  # star
            s["num_output_columns"] = -1
            continue
        if s["num_output_columns"] != -1:
            s["num_output_columns"] += 1

        def visit_select(e: Expr) -> None:
            if isinstance(e, Case):
                s["num_select_case_exprs"] += 1
            elif isinstance(e, (Arith, TimestampArith)):
                s["num_select_arithmetic_exprs"] += 1
            elif isinstance(e, Cast):
                s["num_select_cast_exprs"] += 1
            elif isinstance(e, FuncCall):
                s["num_select_function_call_exprs"] += 1
            elif isinstance(e, Analytic):
                s["num_select_analytic_exprs"] += 1
            elif isinstance(e, Compound):
                s["num_select_compound_predicates"][e.op] += 1
            elif isinstance(e, Binary):
                s["num_select_binary_predicates"][e.op] += 1
            elif isinstance(e, IsNull):
                s["num_select_is_null_predicates"] += 1

        _walk(item.expr, visit_select)

    if stmt.where is not None:

        def visit_where(e: Expr) -> None:
            if isinstance(e, Compound):
                s["num_where_compound_predicates"][e.op] += 1
            elif isinstance(e, Binary):
                s["num_where_binary_predicates"][e.op] += 1
            elif isinstance(e, Like):
                s["num_where_like_predicates"][e.op] += 1
            elif isinstance(e, InPred):
                s["num_where_in_predicates"] += 1
            elif isinstance(e, Between):
                s["num_where_between_predicates"] += 1
            elif isinstance(e, ExistsPred):
                s["num_where_exists_predicates"] += 1
            elif isinstance(e, IsNull):
                s["num_where_is_null_predicates"] += 1
            elif isinstance(e, FuncCall):
                s["num_where_function_call_exprs"] += 1
            elif isinstance(e, Case):
                s["num_where_case_exprs"] += 1
            elif isinstance(e, SubqueryExpr):
                s["num_where_subqueries"] += 1
                _merge(s, _query_stats(e.stmt))
            elif isinstance(e, TimestampArith):
                s["num_where_timestamp_arithmetic_exprs"] += 1
            elif isinstance(e, Arith):
                s["num_where_arithmetic_exprs"] += 1
            elif isinstance(e, Cast):
                s["num_where_cast_exprs"] += 1

        _walk(stmt.where, visit_where)

    if stmt.having is not None:

        def visit_having(e: Expr) -> None:
            if isinstance(e, Compound):
                s["num_having_compound_predicates"][e.op] += 1
            elif isinstance(e, Binary):
                s["num_having_binary_predicates"][e.op] += 1
            elif isinstance(e, FuncCall):
                s["num_having_function_call_exprs"] += 1

        _walk(stmt.having, visit_having)

    s["num_group_by_columns"] += len(stmt.group_by)
    s["num_order_by_columns"] += len(stmt.order_by)
    if stmt.limit is not None:
        s["num_limits"] += 1

    for ref in stmt.table_refs:
        if ref.view_stmt is not None:
            s["num_from_subqueries"] += 1
            _merge(s, _query_stats(ref.view_stmt))
        if ref.on is not None:

            def visit_on(e: Expr) -> None:
                if isinstance(e, Compound):
                    s["num_on_compound_predicates"][e.op] += 1
                elif isinstance(e, Binary):
                    s["num_on_binary_predicates"][e.op] += 1
                elif isinstance(e, FuncCall):
                    s["num_on_function_call_exprs"] += 1
                elif isinstance(e, Between):
                    s["num_on_between_predicates"] += 1

            _walk(ref.on, visit_on)
        if ref.using is not None:
            s["num_using_columns"] += len(ref.using)

    if s["num_from_subqueries"] > 0 or s["num_where_subqueries"] > 0:
        s["max_depth_subqueries"] += 1  # QueryAnalyzer.java:277-279
    return s


def extract_sql_features(sql: str) -> dict | None:
    """Q3/Q4/Q6 — the ``sql`` subdocument (QueryAnalyzer.java:287-331):
    feature counters + parameterized template. None for unparseable input;
    for inserts, stats describe the nested query (``sql.query`` subdoc,
    QueryAnalyzer.java:22-31) and the template is None."""
    try:
        stmt = parse_sql(sql)
    except SqlParseError:
        return None
    if isinstance(stmt, OtherStmt):
        return {"type": stmt.type_name, "stats": None,
                "parameterized_stmt": None, "overwrite": None}
    if isinstance(stmt, InsertStmt):
        return {"type": "InsertStmt", "stats": _query_stats(stmt.query),
                "parameterized_stmt": None, "overwrite": stmt.overwrite}
    return {"type": type(stmt).__name__, "stats": _query_stats(stmt),
            "parameterized_stmt": parameterize_stmt(stmt), "overwrite": None}


# --- parameterizer (Q5) -----------------------------------------------------


def _param_expr(e: Expr) -> None:
    """Parameterizer.parameterizeExpr (Parameterizer.java:137-193):
    literals -> FALSE / 1 / '?', slot refs -> ? (qualifier dropped),
    subqueries recursed; structure preserved."""

    def visit(x: Expr) -> None:
        if isinstance(x, Literal):
            if x.kind == "bool":
                x.value = "FALSE"
            elif x.kind == "number":
                x.value = "1"
            elif x.kind == "string":
                x.value = "'?'"
        elif isinstance(x, SlotRef):
            x.table = None
            x.name = "?"
        elif isinstance(x, SubqueryExpr):
            _param_query(x.stmt)

    _walk(e, visit)


def _param_query(stmt: QueryStmt) -> None:
    """Parameterizer.parameterizeQuery (Parameterizer.java:16-52)."""
    if isinstance(stmt, SelectStmt):
        _param_select(stmt)
    else:
        for operand, _ in stmt.operands:
            _param_query(operand)
    for view in stmt.with_views:
        view.name = "?"
        _param_query(view.stmt)
    for item in stmt.order_by:
        _param_expr(item.expr)
    if stmt.limit is not None:
        _param_expr(stmt.limit)
    if stmt.offset is not None:
        _param_expr(stmt.offset)


def _param_select(stmt: SelectStmt) -> None:
    for item in stmt.items:
        if item.expr is None:
            continue  # star kept (Parameterizer.java:98-100)
        item.alias = None
        _param_expr(item.expr)
    for ref in stmt.table_refs:
        if ref.view_stmt is not None:
            ref.alias = "?"
            _param_query(ref.view_stmt)
            if ref.col_labels is not None:
                ref.col_labels = ["?"] * len(ref.col_labels)
        else:
            ref.name = "?"
            ref.alias = None
        if ref.using is not None:
            ref.using = ["?"] * len(ref.using)
        if ref.on is not None:
            _param_expr(ref.on)
    if stmt.where is not None:
        _param_expr(stmt.where)
    for e in stmt.group_by:
        _param_expr(e)
    if stmt.having is not None:
        _param_expr(stmt.having)


def parameterize_stmt(stmt: QueryStmt) -> str:
    _param_query(stmt)
    return to_sql(stmt)


def parameterize_sql(sql: str) -> str | None:
    """Q5 — workload fingerprint: canonical parameterized template.
    None for non-query statements (QueryAnalyzer.java:327-328 attaches a
    template only on the analyzeQueryStmt path)."""
    try:
        stmt = parse_sql(sql)
    except SqlParseError:
        return None
    if not isinstance(stmt, (SelectStmt, UnionStmt)):
        return None
    return parameterize_stmt(stmt)


# --- SQL regeneration -------------------------------------------------------


def _sql_expr(e: Expr) -> str:  # noqa: PLR0911
    if isinstance(e, Literal):
        return e.value
    if isinstance(e, SlotRef):
        return e.name if e.table is None else f"{e.table}.{e.name}"
    if isinstance(e, Star):
        return "*"
    if isinstance(e, Binary):
        return f"{_sql_expr(e.left)} {e.op} {_sql_expr(e.right)}"
    if isinstance(e, Compound):
        if e.op == "NOT":
            return f"NOT {_sql_expr(e.operands[0])}"
        return f" {e.op} ".join(_sql_expr(x) for x in e.operands)
    if isinstance(e, (Arith, TimestampArith)):
        if len(e.operands) == 1:
            return f"{e.op}{_sql_expr(e.operands[0])}"
        if isinstance(e, TimestampArith):
            left, amount = e.operands
            return f"{_sql_expr(left)} {e.op} INTERVAL {_sql_expr(amount)} {e.unit}"
        return f" {e.op} ".join(_sql_expr(x) for x in e.operands)
    if isinstance(e, Like):
        return f"{_sql_expr(e.left)} {e.op} {_sql_expr(e.right)}"
    if isinstance(e, InPred):
        neg = "NOT " if e.negated else ""
        if len(e.items) == 1 and isinstance(e.items[0], SubqueryExpr):
            # subquery form: Subquery.toSql() supplies the parens
            # (InPredicate.toSql in the Impala frontend adds none)
            return f"{_sql_expr(e.expr)} {neg}IN {_sql_expr(e.items[0])}"
        return (f"{_sql_expr(e.expr)} {neg}IN "
                f"({', '.join(_sql_expr(x) for x in e.items)})")
    if isinstance(e, Between):
        neg = "NOT " if e.negated else ""
        return (f"{_sql_expr(e.expr)} {neg}BETWEEN {_sql_expr(e.low)} "
                f"AND {_sql_expr(e.high)}")
    if isinstance(e, IsNull):
        return f"{_sql_expr(e.expr)} IS {'NOT ' if e.negated else ''}NULL"
    if isinstance(e, ExistsPred):
        return f"EXISTS {_sql_expr(e.sub)}"
    if isinstance(e, FuncCall):
        inner = ", ".join(_sql_expr(a) for a in e.args)
        if e.distinct:
            inner = "DISTINCT " + inner
        return f"{e.name}({inner})"
    if isinstance(e, Analytic):
        parts = []
        if e.partition:
            parts.append("PARTITION BY " + ", ".join(_sql_expr(x) for x in e.partition))
        if e.order:
            parts.append("ORDER BY " + ", ".join(
                f"{_sql_expr(o.expr)} {'ASC' if o.asc else 'DESC'}" for o in e.order))
        if e.frame is not None:
            def bsql(b: FrameBound) -> str:
                if b.kind == "CURRENT ROW":
                    return "CURRENT ROW"
                lead = "UNBOUNDED" if b.unbounded else _sql_expr(b.expr)
                return f"{lead} {b.kind}"
            if e.frame.high is None:
                parts.append(f"{e.frame.units} {bsql(e.frame.low)}")
            else:
                parts.append(f"{e.frame.units} BETWEEN {bsql(e.frame.low)}"
                             f" AND {bsql(e.frame.high)}")
        return f"{_sql_expr(e.call)} OVER ({' '.join(parts)})"
    if isinstance(e, Case):
        parts = ["CASE"]
        if e.operand is not None:
            parts.append(_sql_expr(e.operand))
        for w, t in e.whens:
            parts.append(f"WHEN {_sql_expr(w)} THEN {_sql_expr(t)}")
        if e.default is not None:
            parts.append(f"ELSE {_sql_expr(e.default)}")
        parts.append("END")
        return " ".join(parts)
    if isinstance(e, Cast):
        return f"CAST({_sql_expr(e.expr)} AS {e.type_name})"
    if isinstance(e, SubqueryExpr):
        return f"({to_sql(e.stmt)})"
    raise TypeError(f"cannot print {e!r}")


def to_sql(stmt: QueryStmt) -> str:
    """Canonical SQL regeneration (our analog of stmt.toSql()):
    uppercase keywords, explicit ASC/DESC, single spaces."""
    if isinstance(stmt, UnionStmt):
        parts = []
        if stmt.with_views:
            parts.append("WITH " + ", ".join(
                f"{v.name} AS ({to_sql(v.stmt)})" for v in stmt.with_views))
        ops = []
        for i, (operand, is_all) in enumerate(stmt.operands):
            sep = "" if i == 0 else ("UNION ALL " if is_all else "UNION ")
            ops.append(sep + _select_core_sql(operand))
        parts.append(" ".join(ops))
        parts.append(_order_limit_sql(stmt.order_by, stmt.limit, stmt.offset))
        return " ".join(p for p in parts if p)
    out = []
    if stmt.with_views:
        out.append("WITH " + ", ".join(
            f"{v.name} AS ({to_sql(v.stmt)})" for v in stmt.with_views))
    out.append(_select_core_sql(stmt))
    out.append(_order_limit_sql(stmt.order_by, stmt.limit, stmt.offset))
    return " ".join(p for p in out if p)


def _select_core_sql(stmt: QueryStmt) -> str:
    if isinstance(stmt, UnionStmt):
        return f"({to_sql(stmt)})"
    items = []
    for item in stmt.items:
        if item.expr is None:
            items.append("*" if item.star_table is None else f"{item.star_table}.*")
        else:
            text = _sql_expr(item.expr)
            if item.alias:
                text += f" AS {item.alias}"
            items.append(text)
    parts = ["SELECT"]
    if stmt.distinct:
        parts.append("DISTINCT")
    parts.append(", ".join(items))
    if stmt.table_refs:
        refs = []
        for i, ref in enumerate(stmt.table_refs):
            base = f"({to_sql(ref.view_stmt)})" if ref.view_stmt is not None else ref.name
            if ref.alias:
                base += f" {ref.alias}"
                if ref.col_labels:
                    base += f" ({', '.join(ref.col_labels)})"
            text = base
            if i > 0:
                text = f"{ref.join_op} {base}" if ref.join_op else f", {base}"
                if ref.on is not None:
                    text += f" ON {_sql_expr(ref.on)}"
                elif ref.using is not None:
                    text += f" USING ({', '.join(ref.using)})"
            refs.append(text)
        from_sql = ""
        for r in refs:
            from_sql += r if not from_sql else (r if r.startswith(", ") else " " + r)
        parts.append("FROM " + from_sql)
    if stmt.where is not None:
        parts.append("WHERE " + _sql_expr(stmt.where))
    if stmt.group_by:
        parts.append("GROUP BY " + ", ".join(_sql_expr(e) for e in stmt.group_by))
    if stmt.having is not None:
        parts.append("HAVING " + _sql_expr(stmt.having))
    return " ".join(parts)


def _order_limit_sql(order, limit, offset) -> str:
    parts = []
    if order:
        parts.append("ORDER BY " + ", ".join(
            f"{_sql_expr(o.expr)} {'ASC' if o.asc else 'DESC'}" for o in order))
    if limit is not None:
        parts.append("LIMIT " + _sql_expr(limit))
    if offset is not None:
        parts.append("OFFSET " + _sql_expr(offset))
    return " ".join(parts)
