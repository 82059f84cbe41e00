"""Solr streaming expressions compiled to Spark DataFrame plans.

The reference delegates its whole query surface to a stored Solr core
(/root/reference/app/process/solr.go:48-49,100-124). A Solr user at
scale leans on the ``/stream`` handler — streaming expressions such as
``rollup(search(...))`` or ``hashJoin(search(...), hashed=search(...))``
— for export-grade relational work over the index. This module gives
the engine that surface: ``parse()`` turns the expression string into
an AST and ``compile_stream()`` lowers it to a *declarative* DataFrame
plan, so Catalyst (not a hand-rolled tuple-at-a-time executor) picks
the physical strategy.

Spark-first lowering (the 100 TB story):

- ``search``     -> pruned parquet scan: the ``q`` filter and ``fl``
                    projection become a ``where``/``select`` that push
                    down to the source (PushedFilters / ReadSchema).
- ``rollup``     -> ``groupBy().agg()`` — Spark plans a partial
                    (map-side) aggregate before the shuffle, which IS
                    the reason Solr's rollup wants its input sorted;
                    here the combine is free and no input sort is
                    needed at all.
- ``innerJoin`` / ``leftOuterJoin`` -> equi-join; AQE picks
                    sort-merge vs broadcast from runtime sizes.
- ``hashJoin``   -> explicit ``F.broadcast`` on the ``hashed`` side —
                    the user asserted it fits in memory, exactly what
                    Solr's hashJoin means.
- ``intersect`` / ``complement`` -> left-semi / left-anti join (no
                    row materialization of the right side's payload).
- ``merge``      -> union + order (Spark needs no pre-sorted inputs).
- ``unique``     -> row_number() == 1 window over the ``over`` key.
- ``top`` / ``sort`` -> TakeOrderedAndProject / global sort.
- ``having``     -> post-aggregate filter.
- ``select``     -> projection with add/sub/mult/div evaluators, all
                    JVM-side column expressions (whole-stage codegen).
- ``parallel``   -> pass-through: Solr uses parallel(workers=N) to
                    shard an expression across worker nodes; a Spark
                    plan is already executed by every core of every
                    executor, so the wrapper costs nothing.

The ``q`` mini-syntax supported inside ``search`` is the slice of
Lucene syntax these handlers actually receive as filters: ``*:*``,
``field:value`` and ``field:[lo TO hi]``, AND-composed. Full-text
ranked retrieval stays with the BM25/WAND operators — Solr's /export
and /stream likewise run doc-values filters, not rescoring.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

@dataclass
class Node:
    """One streaming-expression function call."""

    name: str
    args: list = field(default_factory=list)      # str | Node
    kwargs: dict = field(default_factory=dict)    # str -> str | Node
    out_alias: str | None = None                  # trailing `as x`


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")


class StreamExprError(ValueError):
    pass


def parse(expr: str) -> Node:
    """Parse a streaming expression string into a Node tree."""
    node, i = _parse_call(expr, 0)
    if expr[i:].strip():
        raise StreamExprError(f"trailing input after expression: {expr[i:]!r}")
    return node


def _ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _parse_call(s: str, i: int) -> tuple[Node, int]:
    i = _ws(s, i)
    m = _IDENT.match(s, i)
    if not m:
        raise StreamExprError(f"expected function name at {i}: {s[i:i+20]!r}")
    name, i = m.group(0), m.end()
    i = _ws(s, i)
    if i >= len(s) or s[i] != "(":
        raise StreamExprError(f"expected '(' after {name!r} at {i}")
    i += 1
    node = Node(name)
    i = _ws(s, i)
    if i < len(s) and s[i] == ")":
        return node, i + 1
    while True:
        i = _parse_arg(s, i, node)
        i = _ws(s, i)
        if i >= len(s):
            raise StreamExprError(f"unterminated call {name!r}")
        if s[i] == ",":
            i += 1
            continue
        if s[i] == ")":
            return node, i + 1
        raise StreamExprError(f"expected ',' or ')' at {i}: {s[i:i+20]!r}")


def _parse_arg(s: str, i: int, node: Node) -> int:
    i = _ws(s, i)
    m = _IDENT.match(s, i)
    if m:
        j = _ws(s, m.end())
        if j < len(s) and s[j] == "=" and (j + 1 >= len(s) or s[j + 1] != "="):
            key = m.group(0)
            k = _ws(s, j + 1)
            mv = _IDENT.match(s, k)
            if mv and _ws(s, mv.end()) < len(s) and s[_ws(s, mv.end())] == "(":
                val, i = _parse_call(s, k)  # key=<nested stream>
            else:
                val, i = _parse_value(s, k)
            node.kwargs[key] = val
            return i
        if j < len(s) and s[j] == "(":
            sub, i = _parse_call(s, i)
            i = _maybe_alias(s, i, sub)
            node.args.append(sub)
            return i
    val, i = _parse_value(s, i)
    node.args.append(val)
    return i


def _maybe_alias(s: str, i: int, sub: Node) -> int:
    j = _ws(s, i)
    m = re.match(r"as\s+([A-Za-z_][A-Za-z0-9_]*)", s[j:])
    if m:
        sub.out_alias = m.group(1)
        return j + m.end()
    return i


def _parse_value(s: str, i: int):
    i = _ws(s, i)
    if i < len(s) and s[i] in "\"'":
        quote = s[i]
        j = s.find(quote, i + 1)
        if j < 0:
            raise StreamExprError(f"unterminated string at {i}")
        return s[i + 1 : j], j + 1
    # bare token up to a top-level ',' or ')'
    j = i
    while j < len(s) and s[j] not in ",)":
        j += 1
    tok = s[i:j].strip()
    if not tok:
        raise StreamExprError(f"empty argument at {i}")
    return tok, j


# ---------------------------------------------------------------------------
# q= filter mini-syntax (the /export-style docValues filter slice)
# ---------------------------------------------------------------------------

_RANGE = re.compile(r"^\[\s*(\S+)\s+TO\s+(\S+)\s*\]$")


def _typed_lit(df: DataFrame, fld: str, raw: str) -> Column:
    if fld not in df.columns:
        raise StreamExprError(f"unknown field {fld!r}; have {df.columns}")
    dt = df.schema[fld].dataType
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return F.lit(int(raw))
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return F.lit(float(raw))
    return F.lit(raw)


def q_filter(df: DataFrame, q: str) -> DataFrame:
    """Apply the search() ``q`` filter. AND-composed clauses of
    ``*:*`` | ``field:value`` | ``field:[lo TO hi]`` (``*`` = open
    end). Every clause is a plain column predicate -> parquet
    pushdown."""
    q = q.strip()
    if q in ("", "*:*"):
        return df
    for clause in re.split(r"\s+AND\s+", q):
        fld, _, val = clause.partition(":")
        fld, val = fld.strip(), val.strip()
        if not _IDENT.fullmatch(fld):
            raise StreamExprError(f"bad q clause {clause!r}")
        rng = _RANGE.match(val)
        if rng:
            lo, hi = rng.group(1), rng.group(2)
            cond = F.lit(True)
            if lo != "*":
                cond = cond & (F.col(fld) >= _typed_lit(df, fld, lo))
            if hi != "*":
                cond = cond & (F.col(fld) <= _typed_lit(df, fld, hi))
            df = df.where(cond)
        else:
            df = df.where(F.col(fld) == _typed_lit(df, fld, val))
    return df


# ---------------------------------------------------------------------------
# Evaluators (select / having / frange share these)
# ---------------------------------------------------------------------------

_NUM = re.compile(r"^-?\d+(\.\d+)?$")

_ARITH = {"add": "__add__", "sub": "__sub__", "mult": "__mul__", "div": "__truediv__"}
_CMP = {"eq": "__eq__", "gt": "__gt__", "lt": "__lt__", "gteq": "__ge__", "lteq": "__le__"}


def eval_column(arg, df: DataFrame) -> Column:
    """Lower a select/having operand (field name, numeric literal, or
    add/sub/mult/div call tree) to a Column expression — stays inside
    whole-stage codegen, no Python in the row path."""
    if isinstance(arg, str):
        if _NUM.match(arg):
            return F.lit(float(arg) if "." in arg else int(arg))
        if arg not in df.columns:
            raise StreamExprError(f"unknown field {arg!r}; have {df.columns}")
        return F.col(arg)
    if isinstance(arg, Node) and arg.name in _ARITH:
        if len(arg.args) != 2:
            raise StreamExprError(f"{arg.name} wants 2 args")
        a, b = (eval_column(x, df) for x in arg.args)
        return getattr(a, _ARITH[arg.name])(b)
    raise StreamExprError(f"unsupported evaluator {arg!r}")


def eval_predicate(arg, df: DataFrame) -> Column:
    """Lower a having() boolean tree (eq/gt/lt/gteq/lteq/and/or/not)."""
    if not isinstance(arg, Node):
        raise StreamExprError(f"having wants a boolean call, got {arg!r}")
    if arg.name in _CMP:
        if len(arg.args) != 2:
            raise StreamExprError(f"{arg.name} wants 2 args")
        a, b = (eval_column(x, df) for x in arg.args)
        return getattr(a, _CMP[arg.name])(b)
    if arg.name == "and":
        out = F.lit(True)
        for sub in arg.args:
            out = out & eval_predicate(sub, df)
        return out
    if arg.name == "or":
        out = F.lit(False)
        for sub in arg.args:
            out = out | eval_predicate(sub, df)
        return out
    if arg.name == "not":
        (sub,) = arg.args
        return ~eval_predicate(sub, df)
    raise StreamExprError(f"unsupported predicate {arg.name!r}")


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------

def _sort_cols(spec: str) -> list[Column]:
    cols = []
    for part in spec.split(","):
        toks = part.split()
        if not toks or len(toks) > 2:
            raise StreamExprError(f"bad sort spec {part!r}")
        c = F.col(toks[0])
        if len(toks) == 2:
            d = toks[1].lower()
            if d == "desc":
                c = c.desc()
            elif d != "asc":
                raise StreamExprError(f"bad sort direction {toks[1]!r}")
        cols.append(c)
    return cols


def _on_pairs(spec: str) -> list[tuple[str, str]]:
    pairs = []
    for part in spec.split(","):
        left, eq, right = part.partition("=")
        left = left.strip()
        right = right.strip() if eq else left
        pairs.append((left, right))
    return pairs


_AGG = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
}

_GAP = re.compile(r"^\+(\d+)(SECONDS?|MINUTES?|HOURS?|DAYS?)$")
_GAP_UNIT_S = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _gap_seconds(gap: str) -> int:
    """Solr date-math gap (``+1HOUR``, ``+30MINUTES``) -> seconds. The
    calendar-free slice (no +1MONTH: month lengths vary, and an
    epoch-arithmetic bucket spine — the engine-portable formulation —
    cannot represent them)."""
    m = _GAP.match(gap.strip().upper())
    if not m:
        raise StreamExprError(f"bad gap {gap!r} (want +N SECONDS|MINUTES|HOURS|DAYS)")
    return int(m.group(1)) * _GAP_UNIT_S[m.group(2).rstrip("S")]


def _iso_epoch(ts: str) -> int:
    """ISO-8601 UTC instant (``2020-01-01T00:00:00Z``) -> epoch
    seconds. Computed driver-side with a fixed UTC offset so the
    bucket spine is independent of any session timezone."""
    from datetime import datetime, timezone

    t = ts.strip()
    if t.endswith("Z"):
        t = t[:-1] + "+00:00"
    try:
        d = datetime.fromisoformat(t)
    except ValueError as e:
        raise StreamExprError(f"bad ISO instant {ts!r}") from e
    if d.tzinfo is None:
        d = d.replace(tzinfo=timezone.utc)
    return int(d.timestamp())


def _metric(node: Node) -> Column:
    """rollup metric: count(*) -> count_all; f(x) -> f_x. Sanitized
    snake-case output names keep the tuple join-able downstream (Solr
    emits the literal 'sum(x)' — parenthesised names; documented
    deviation)."""
    if node.name == "count":
        if node.args != ["*"]:
            raise StreamExprError("count wants (*)")
        return F.count(F.lit(1)).alias(node.out_alias or "count_all")
    if node.name in _AGG and len(node.args) == 1 and isinstance(node.args[0], str):
        fld = node.args[0]
        return _AGG[node.name](F.col(fld)).alias(node.out_alias or f"{node.name}_{fld}")
    raise StreamExprError(f"unsupported rollup metric {node.name!r}")


def compile_stream(expr: str | Node, tables: dict[str, DataFrame]) -> DataFrame:
    """Compile a streaming expression (string or parsed Node) against
    ``tables`` (collection name -> DataFrame) into a DataFrame plan."""
    node = parse(expr) if isinstance(expr, str) else expr
    return _compile(node, tables)


def _stream_arg(node: Node, tables, idx: int = 0) -> DataFrame:
    if len(node.args) <= idx or not isinstance(node.args[idx], Node):
        raise StreamExprError(f"{node.name} wants a stream argument #{idx}")
    return _compile(node.args[idx], tables)


def _compile(node: Node, tables: dict[str, DataFrame]) -> DataFrame:
    n = node.name
    if n == "search":
        if not node.args or not isinstance(node.args[0], str):
            raise StreamExprError("search wants a collection name")
        coll = node.args[0]
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}; have {sorted(tables)}")
        df = q_filter(tables[coll], node.kwargs.get("q", "*:*"))
        fl = node.kwargs.get("fl")
        if fl:
            df = df.select([c.strip() for c in fl.split(",")])
        sort = node.kwargs.get("sort")
        if sort:
            df = df.orderBy(*_sort_cols(sort))
        rows = node.kwargs.get("rows")
        if rows:
            df = df.limit(int(rows))
        return df
    if n == "select":
        df = _stream_arg(node, tables)
        cols = []
        for arg in node.args[1:]:
            if isinstance(arg, str):
                m = re.match(r"^(\S+)\s+as\s+(\S+)$", arg)
                if m:
                    cols.append(eval_column(m.group(1), df).alias(m.group(2)))
                else:
                    cols.append(eval_column(arg, df).alias(arg))
            else:
                if not arg.out_alias:
                    raise StreamExprError(f"evaluator {arg.name} needs 'as alias'")
                cols.append(eval_column(arg, df).alias(arg.out_alias))
        return df.select(*cols)
    if n == "rollup":
        df = _stream_arg(node, tables)
        over = node.kwargs.get("over")
        if not over:
            raise StreamExprError("rollup wants over=")
        keys = [k.strip() for k in over.split(",")]
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Node)]
        if not metrics:
            raise StreamExprError("rollup wants at least one metric")
        return df.groupBy(*keys).agg(*metrics)
    if n == "having":
        df = _stream_arg(node, tables)
        return df.where(eval_predicate(node.args[1], df))
    if n in ("innerJoin", "leftOuterJoin", "hashJoin", "intersect", "complement"):
        left = _stream_arg(node, tables, 0)
        if n == "hashJoin":
            right_node = node.kwargs.get("hashed")
            if not isinstance(right_node, Node):
                raise StreamExprError("hashJoin wants hashed=<stream>")
            right = F.broadcast(_compile(right_node, tables))
        else:
            right = _stream_arg(node, tables, 1)
        on = node.kwargs.get("on")
        if not on:
            raise StreamExprError(f"{n} wants on=")
        pairs = _on_pairs(on)
        cond = None
        for lf, rf in pairs:
            c = left[lf] == right[rf]
            cond = c if cond is None else cond & c
        how = {
            "innerJoin": "inner",
            "hashJoin": "inner",
            "leftOuterJoin": "left",
            "intersect": "left_semi",
            "complement": "left_anti",
        }[n]
        joined = left.join(right, cond, how)
        if how in ("inner", "left"):
            # drop the right-side key column when it duplicates the left name
            for lf, rf in pairs:
                if lf == rf:
                    joined = joined.drop(right[rf])
        return joined
    if n == "merge":
        streams = [_compile(a, tables) for a in node.args if isinstance(a, Node)]
        if len(streams) < 2:
            raise StreamExprError("merge wants >= 2 streams")
        out = streams[0]
        for s in streams[1:]:
            out = out.unionByName(s)
        on = node.kwargs.get("on")
        if on:
            out = out.orderBy(*_sort_cols(on))
        return out
    if n == "unique":
        df = _stream_arg(node, tables)
        over = node.kwargs.get("over")
        sort = node.kwargs.get("sort")
        if not over or not sort:
            raise StreamExprError("unique wants over= and sort= (deterministic pick)")
        from pyspark.sql.window import Window

        keys = [k.strip() for k in over.split(",")]
        w = Window.partitionBy(*keys).orderBy(*_sort_cols(sort))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    if n == "top":
        df = _stream_arg(node, tables)
        sort = node.kwargs.get("sort")
        k = node.kwargs.get("n")
        if not sort or not k:
            raise StreamExprError("top wants n= and sort=")
        return df.orderBy(*_sort_cols(sort)).limit(int(k))
    if n == "sort":
        df = _stream_arg(node, tables)
        by = node.kwargs.get("by")
        if not by:
            raise StreamExprError("sort wants by=")
        return df.orderBy(*_sort_cols(by))
    if n == "parallel":
        # Solr shards the wrapped expression across N worker nodes;
        # a Spark plan already runs data-parallel on every executor
        # core, so the wrapper is a no-op pass-through.
        return _stream_arg(node, tables)
    if n == "facet":
        # facet(collection, q=..., buckets="a,b", bucketSorts="...",
        # bucketSizeLimit=N, metric...) — Solr pushes this into the
        # JSON facet engine; here it IS the aggregate: groupBy + agg
        # (map-side partial combine) + TakeOrderedAndProject for the
        # bucketSizeLimit head. bucketSorts references the sanitized
        # metric names (count_all, sum_x — same documented deviation
        # as rollup's _metric).
        if not node.args or not isinstance(node.args[0], str):
            raise StreamExprError("facet wants a collection name")
        coll = node.args[0]
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}; have {sorted(tables)}")
        buckets = node.kwargs.get("buckets")
        if not buckets:
            raise StreamExprError("facet wants buckets=")
        df = q_filter(tables[coll], node.kwargs.get("q", "*:*"))
        keys = [b.strip() for b in buckets.split(",")]
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Node)]
        if not metrics:
            raise StreamExprError("facet wants at least one metric")
        out = df.groupBy(*keys).agg(*metrics)
        sorts = node.kwargs.get("bucketSorts")
        if sorts:
            out = out.orderBy(*_sort_cols(sorts))
        lim = node.kwargs.get("bucketSizeLimit")
        if lim:
            out = out.limit(int(lim))
        return out
    if n == "stats":
        # stats(collection, q=..., metric...) — one global aggregate
        # row; Spark's partial agg makes it a single all-to-one-row
        # reduction, no groupBy shuffle of row data.
        if not node.args or not isinstance(node.args[0], str):
            raise StreamExprError("stats wants a collection name")
        coll = node.args[0]
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}; have {sorted(tables)}")
        df = q_filter(tables[coll], node.kwargs.get("q", "*:*"))
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Node)]
        if not metrics:
            raise StreamExprError("stats wants at least one metric")
        return df.agg(*metrics)
    if n == "cartesianProduct":
        # cartesianProduct(<stream>, fieldA) — emit one tuple per
        # element of a multivalued field: exactly Spark's
        # posexplode/explode Generate (map-side, no shuffle). The
        # exploded column keeps its name; productSort= orders the
        # result (Solr streams sorted; Spark sorts on demand).
        df = _stream_arg(node, tables)
        fld = next((a for a in node.args[1:] if isinstance(a, str)), None)
        if not fld:
            raise StreamExprError("cartesianProduct wants a field to explode")
        others = [c for c in df.columns if c != fld]
        out = df.select(*others, F.explode(F.col(fld)).alias(fld))
        sort = node.kwargs.get("productSort")
        if sort:
            out = out.orderBy(*_sort_cols(sort))
        return out
    if n == "timeseries":
        # timeseries(collection, q=..., field=ts, start="ISO", end="ISO",
        # gap="+1HOUR", metric...) — Solr's date-bucketed facet stream.
        # Lowered to: pushed range filter -> epoch-floor bucket column ->
        # groupBy/agg (map-side partial combine) -> LEFT join against a
        # spark.range bucket spine so EMPTY buckets appear with count 0
        # (Solr emits every gap step between start and end). The spine
        # is |buckets| rows — driver-free and broadcast by AQE; the only
        # row shuffle is the |buckets|-row aggregate.
        if not node.args or not isinstance(node.args[0], str):
            raise StreamExprError("timeseries wants a collection name")
        coll = node.args[0]
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}; have {sorted(tables)}")
        fld = node.kwargs.get("field")
        start, end, gap = (node.kwargs.get(k) for k in ("start", "end", "gap"))
        if not fld or not start or not end or not gap:
            raise StreamExprError("timeseries wants field=, start=, end=, gap=")
        start_s, end_s, gap_s = _iso_epoch(start), _iso_epoch(end), _gap_seconds(gap)
        if end_s <= start_s:
            raise StreamExprError("timeseries wants end > start")
        if gap_s <= 0:
            raise StreamExprError(f"timeseries wants a positive gap, got {gap!r}")
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, Node)]
        if not metrics:
            raise StreamExprError("timeseries wants at least one metric")
        df = q_filter(tables[coll], node.kwargs.get("q", "*:*"))
        if fld not in df.columns:
            raise StreamExprError(f"unknown field {fld!r}; have {df.columns}")
        ep = F.unix_timestamp(F.col(fld))
        agg = (
            df.where((ep >= start_s) & (ep < end_s))
            .withColumn(
                "bucket_start",
                (
                    F.lit(start_s)
                    + F.floor((ep - F.lit(start_s)) / F.lit(gap_s)) * F.lit(gap_s)
                ).cast("long"),
            )
            .groupBy("bucket_start")
            .agg(*metrics)
        )
        spine = (
            df.sparkSession.range(start_s, end_s, gap_s)
            .select(F.col("id").cast("long").alias("bucket_start"))
        )
        out = spine.join(agg, "bucket_start", "left")
        # count metrics read 0 in empty buckets (Solr's contract); other
        # aggregates stay NULL — there is no value to aggregate.
        for m in node.args[1:]:
            if isinstance(m, Node) and m.name == "count":
                name = m.out_alias or "count_all"
                out = out.withColumn(
                    name, F.coalesce(F.col(name), F.lit(0)).cast("long")
                )
        return out.orderBy("bucket_start")
    if n == "fetch":
        # fetch(collection, <stream>, fl="a,b", on="streamF=collF") —
        # decorate each stream tuple with fields fetched by key from
        # the collection. Solr batches point-lookups; Spark-side the
        # right relation projects to (key, fl...) only and broadcasts
        # (fetch's implied assertion is that per-batch lookups are
        # cheap, i.e. the projected dim is small next to the stream).
        if not node.args or not isinstance(node.args[0], str):
            raise StreamExprError("fetch wants a collection name")
        coll = node.args[0]
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}; have {sorted(tables)}")
        stream = _stream_arg(node, tables, 1)
        on = node.kwargs.get("on")
        fl = node.kwargs.get("fl")
        if not on or not fl:
            raise StreamExprError("fetch wants on= and fl=")
        pairs = _on_pairs(on)
        if len(pairs) != 1:
            raise StreamExprError("fetch wants a single on= key")
        lf, rf = pairs[0]
        fields = [c.strip() for c in fl.split(",")]
        right = tables[coll].select(rf, *fields)
        joined = stream.join(F.broadcast(right), stream[lf] == right[rf], "left")
        return joined.drop(right[rf])
    if n == "nodes":
        # nodes(edges, <root stream>, walk="rootF->edgeF", gather="g")
        # — Solr's graph streaming expression: ONE hop over the edge
        # collection from the inner stream's root set, gathered nodes
        # deduped with their in-walk counts (the count(*) Solr emits
        # when requested; we always emit it). Multi-hop walks compose
        # by nesting nodes() — each hop is one join, exactly Solr's
        # contract. Plan: the root set reduces to DISTINCT keys first
        # (roots are a result page — small; AQE broadcasts the probe),
        # then one join against the edge scan + a groupBy(gather):
        # edges shuffle once on the gather key, never the corpus.
        if not node.args or not isinstance(node.args[0], str):
            raise StreamExprError("nodes wants an edge collection name")
        coll = node.args[0]
        if coll not in tables:
            raise StreamExprError(f"unknown collection {coll!r}; have {sorted(tables)}")
        inner = _stream_arg(node, tables, 1)
        walk = node.kwargs.get("walk")
        gather = node.kwargs.get("gather")
        if not walk or "->" not in walk or not gather:
            raise StreamExprError('nodes wants walk="rootField->edgeField" and gather=')
        root_f, edge_f = (s.strip() for s in walk.split("->", 1))
        edges = tables[coll]
        if edge_f not in edges.columns or gather not in edges.columns:
            raise StreamExprError(
                f"walk/gather fields must exist on {coll!r}: have {edges.columns}"
            )
        roots = inner.select(F.col(root_f).alias("_root")).distinct()
        return (
            edges.join(roots, edges[edge_f] == F.col("_root"), "inner")
            .groupBy(F.col(gather).alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("count"))
            .select("node", F.lit(1).cast("int").alias("level"), "count")
        )
    raise StreamExprError(f"unknown streaming function {n!r}")


# ---------------------------------------------------------------------------
# /sql handler
# ---------------------------------------------------------------------------

_SQL_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|drop|create|alter|merge|truncate|grant|copy|call)\b|;",
    re.IGNORECASE,
)


def sql_handler(spark, tables: dict[str, DataFrame], sql: str) -> DataFrame:
    """Solr's ``/sql`` handler analog: run one read-only SELECT over
    the named collections. Solr translates SQL into streaming
    expressions executed on the cluster; here the translation target
    is Catalyst itself — ``spark.sql`` over temp views of the same
    tables the streaming functions see. Guard: SELECT-only (the
    handler is a query surface, not DML)."""
    if not re.match(r"^\s*(select|with)\b", sql, re.IGNORECASE):
        raise StreamExprError("/sql accepts a single SELECT")
    if _SQL_FORBIDDEN.search(sql):
        raise StreamExprError("/sql is read-only")
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)


def json_props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured payload extraction — the props column is a JSON
    blob (the shape every real event stream carries: typed envelope +
    schemaless payload). Extract ``$.k`` with the engine's native JSON
    path (`get_json_object`, codegen — no Python, no UDF; DuckDB
    replays it with ``json_extract_string``) and aggregate per
    event_type: (event_type, n_events, n_with_k, k_min, k_max, k_sum,
    k_avg_scaled), ordered event_type ASC. ``k_avg_scaled`` is exact
    integer division over exact BIGINT sums; rows whose props lack a
    numeric ``k`` count in n_events but not n_with_k (NULL-skipping
    aggregates, identical on both engines).

    Plan: map-only JSON extraction + ONE |event_types|-row aggregate
    with map-side combine — the scan reads (event_type, props) only.
    At 100 TB the win is the same as every map-only op here: no
    shuffle wider than the group-by key's cardinality."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    per = events.select("event_type", k.alias("k"))
    return (
        per.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.sum("k").cast("long").alias("k_sum"),
        )
        .select(
            "event_type",
            "n_events",
            "n_with_k",
            "k_min",
            "k_max",
            "k_sum",
            F.expr("CASE WHEN n_with_k > 0 THEN (k_sum * 1000000) "
                   "div n_with_k ELSE 0 END").cast("long")
            .alias("k_avg_scaled"),
        )
        .orderBy("event_type")
    )
