"""Randomized query-COMPOSITION differential harness (round-14).

Random small frames (hypothesis) x random 2-4-stage pipelines over the
EXISTING DT API — filter -> join -> group/agg or window -> sort/limit,
drawn from the SURVEY §2 surface — executed on Spark AND translated
stage-for-stage to DuckDB SQL, compared with the driver's frame_sig
normalizer (the exact compare the correctness gate runs).

This generalizes the reference's own fixed-example differential pattern
(/root/reference/inst/tests/optimize.Rraw:1, R/test.data.table.R:384-415)
to the COMPOSITION space: operator-INTERACTION bugs (null group keys
through aggregation, window columns over join output, computed columns
through distinct, limit-after-sort determinism) live between operators,
not inside the single-operator examples the Rraw corpus covered.

Determinism ground rules (each is load-bearing — see the generator):
- doubles are dyadic rationals (m/8, products by positive dyadics
  only), so every sum/avg is EXACT in binary and Spark's partial-
  aggregation order cannot drift from DuckDB's serial fold at the
  normalizer's 9 significant digits;
- -0.0 is never generated (0.0-0.0 = +0.0; no negative double
  factors), so DISTINCT never faces the +0.0/-0.0 equality split;
- every window orders by the unique non-null row id ``i``;
- the terminal sort orders by ALL output columns with explicit NULLS
  LAST on both engines, so LIMIT n is a well-defined row multiset;
- NaN is excluded: the NaN/NA two-level key is single-operator
  semantics with dedicated vector + property coverage elsewhere, and
  DuckDB's NaN total order differs from the reference's by design.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_table_spark import DT
from data_table_spark.functions import between, fcoalesce, fifelse
from data_table_spark.operators.grouping import unique as dt_unique
from data_table_spark.operators.joins import join as dt_join
from data_table_spark.operators.window import cumfn, shift

_spec = importlib.util.spec_from_file_location(
    "check_correctness_for_composition",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "check_correctness.py",
    ),
)
_cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cc)
frame_sig = _cc.frame_sig

MAIN_DDL = "i int, k int, g string, v int, x double, s string"
MAIN_SCHEMA = {
    "i": "int", "k": "int", "g": "string",
    "v": "int", "x": "double", "s": "string",
}
DIM_DDL = "k int, w int, lbl string"

GROUPS = ["a", "b", "c", None]
STRS = ["x", "yy", "zzz", "ab", "q", None]


def _main_rows(draw):
    n = draw(st.integers(min_value=0, max_value=22))
    rows = []
    for i in range(n):
        k = draw(st.one_of(st.none(), st.integers(0, 6)))
        g = draw(st.sampled_from(GROUPS))
        v = draw(st.one_of(st.none(), st.integers(-20, 20)))
        m = draw(st.one_of(st.none(), st.integers(-40, 40)))
        x = None if m is None else m / 8.0  # dyadic; never -0.0
        s = draw(st.sampled_from(STRS))
        rows.append((i, k, g, v, x, s))
    return rows


def _dim_rows(draw):
    ks = draw(st.lists(st.integers(0, 8), unique=True, max_size=7))
    rows = []
    for k in ks:
        w = draw(st.one_of(st.none(), st.integers(-10, 10)))
        lbl = draw(st.sampled_from(["L1", "L2", None]))
        rows.append((k, w, lbl))
    return rows


def _sql_lit(v):
    if isinstance(v, str):
        return "'" + v + "'"  # generator emits [A-Za-z0-9%] only
    return repr(v)


# --------------------------------------------------------------- stages
# Each stage generator returns (dt_fn, sql_fn, describe) and mutates the
# schema state. dt_fn(dt, dim) -> DT drives the DT API; sql_fn(sql) ->
# sql wraps the running DuckDB query so the two executions stay
# stage-for-stage equivalent.

def _numeric(state, include_i=False):
    return [
        c for c, t in state["cols"].items()
        if t in ("int", "bigint", "double") and (include_i or c != "i")
    ]


def _strings(state):
    return [c for c, t in state["cols"].items() if t == "string"]


def _gen_atom(draw, state):
    """One 3-valued-logic-identical predicate atom on both engines."""
    num = _numeric(state)
    strs = _strings(state)
    kinds = []
    if num:
        kinds += ["cmp", "notnull_n", "between"]
    if strs:
        kinds += ["isin", "like", "notnull_s"]
    kind = draw(st.sampled_from(kinds))
    if kind == "between":
        c = draw(st.sampled_from(num))
        lo = draw(st.integers(-10, 5))
        hi = lo + draw(st.integers(0, 10))
        if state["cols"][c] == "double":
            lo, hi = lo / 2.0, hi / 2.0
        return (between(F.col(c), lo, hi),
                f'"{c}" BETWEEN {_sql_lit(lo)} AND {_sql_lit(hi)}')
    if kind == "cmp":
        c = draw(st.sampled_from(num))
        op = draw(st.sampled_from([">", "<", ">=", "<="]))
        lit = draw(st.integers(-10, 10))
        if state["cols"][c] == "double":
            lit = lit / 2.0
        col = F.col(c)
        expr = {">": col > lit, "<": col < lit,
                ">=": col >= lit, "<=": col <= lit}[op]
        return expr, f'"{c}" {op} {_sql_lit(lit)}'
    if kind in ("notnull_n", "notnull_s"):
        c = draw(st.sampled_from(num if kind == "notnull_n" else strs))
        return F.col(c).isNotNull(), f'"{c}" IS NOT NULL'
    if kind == "isin":
        c = draw(st.sampled_from(strs))
        vals = draw(st.lists(
            st.sampled_from(["a", "b", "x", "yy", "L1"]),
            min_size=1, max_size=3, unique=True))
        return (F.col(c).isin(vals),
                f'"{c}" IN ({", ".join(_sql_lit(v) for v in vals)})')
    c = draw(st.sampled_from(strs))
    pat = draw(st.sampled_from(["a%", "%y", "z%", "%b%"]))
    return F.col(c).like(pat), f'"{c}" LIKE {_sql_lit(pat)}'


def _gen_filter(draw, state):
    e1, s1 = _gen_atom(draw, state)
    if draw(st.booleans()):
        e2, s2 = _gen_atom(draw, state)
        if draw(st.booleans()):
            expr, sql = e1 & e2, f"({s1}) AND ({s2})"
        else:
            expr, sql = e1 | e2, f"({s1}) OR ({s2})"
    else:
        expr, sql = e1, s1
    return (
        lambda dt, dim, _e=expr: dt.query(i=_e),
        lambda q, _s=sql: f"SELECT * FROM ({q}) WHERE {_s}",
        f"filter[{sql}]",
    )


def _gen_compute(draw, state, idx):
    cols = state["cols"]
    name = f"c{idx}"
    ints = [c for c, t in cols.items()
            if t in ("int", "bigint") and c != "i"]
    dbls = [c for c, t in cols.items() if t == "double"]
    strs = _strings(state)
    kinds = []
    if ints:
        kinds += ["iarith", "ififelse", "icoal"]
    if dbls:
        kinds += ["darith"]
    if strs:
        kinds += ["supper"]
    kind = draw(st.sampled_from(kinds))
    if kind == "iarith":
        a = draw(st.sampled_from(ints))
        b = draw(st.sampled_from(ints))
        op = draw(st.sampled_from(["+", "-"]))
        expr = F.col(a) + F.col(b) if op == "+" else F.col(a) - F.col(b)
        sql = f'"{a}" {op} "{b}"'
        typ = "bigint" if "bigint" in (cols[a], cols[b]) else "int"
    elif kind == "darith":
        a = draw(st.sampled_from(dbls))
        b = draw(st.sampled_from(dbls + ints))
        op = draw(st.sampled_from(["+", "-", "*2"]))
        if op == "*2":
            # positive dyadic factor only: keeps exactness, avoids -0.0
            expr, sql = F.col(a) * 2.0, f'"{a}" * 2.0'
        else:
            expr = F.col(a) + F.col(b) if op == "+" else F.col(a) - F.col(b)
            sql = f'"{a}" {op} "{b}"'
        typ = "double"
    elif kind == "ififelse":
        a = draw(st.sampled_from(ints))
        p = draw(st.sampled_from(ints))
        lit = draw(st.integers(-5, 5))
        no = draw(st.integers(-5, 5))
        # fifelse NULL-test rows yield NULL (reference NA branch) — the
        # SQL twin needs the explicit NOT branch, since CASE..ELSE
        # would catch the NULL test
        expr = fifelse(F.col(p) > lit, F.col(a), F.lit(no))
        sql = (f'CASE WHEN "{p}" > {lit} THEN "{a}" '
               f'WHEN NOT ("{p}" > {lit}) THEN {no} END')
        typ = cols[a]
    elif kind == "icoal":
        a = draw(st.sampled_from(ints))
        lit = draw(st.integers(-5, 5))
        expr = fcoalesce(F.col(a), F.lit(lit))
        sql = f'COALESCE("{a}", {lit})'
        typ = cols[a]
    else:
        a = draw(st.sampled_from(strs))
        expr = F.upper(F.col(a))
        sql = f'UPPER("{a}")'
        typ = "string"
    state["cols"] = {**cols, name: typ}
    return (
        lambda dt, dim, _e=expr, _n=name: dt.let(**{_n: _e}),
        lambda q, _s=sql, _n=name: f'SELECT *, {_s} AS "{_n}" FROM ({q})',
        f"compute[{name}={sql}]",
    )


def _gen_join(draw, state):
    how = draw(st.sampled_from(["inner", "left", "semi", "anti"]))
    state["joined"] = True
    if how in ("inner", "left"):
        state["cols"] = {**state["cols"], "w": "int", "lbl": "string"}
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        return (
            lambda dt, dim, _h=how: dt_join(dt, dim, on="k", how=_h),
            lambda q, _k=kw: (
                f'SELECT t.*, d."w", d."lbl" FROM ({q}) t '
                f'{_k} dim d ON t."k" = d."k"'
            ),
            f"join[{how}]",
        )
    neg = "NOT " if how == "anti" else ""
    return (
        lambda dt, dim, _h=how: dt_join(dt, dim, on="k", how=_h),
        lambda q, _n=neg: (
            f'SELECT * FROM ({q}) t WHERE {_n}EXISTS '
            f'(SELECT 1 FROM dim d WHERE d."k" = t."k")'
        ),
        f"join[{how}]",
    )


def _gen_agg(draw, state):
    cols = state["cols"]
    by_cands = [c for c, t in cols.items()
                if c != "i" and t in ("int", "bigint", "string")]
    by = draw(st.lists(st.sampled_from(by_cands), unique=True,
                       max_size=2)) if by_cands else []
    num = _numeric(state)
    strs = _strings(state)
    agg_kinds = [("n", None)]
    for c in num:
        if c in by:
            continue
        agg_kinds += [("sum", c), ("avg", c), ("min", c), ("max", c),
                      ("nd", c)]
    for c in strs:
        if c not in by:
            agg_kinds += [("min", c), ("max", c), ("nd", c)]
    picks = draw(st.lists(st.sampled_from(agg_kinds), unique=True,
                          min_size=1, max_size=3))
    jmap, parts, out_cols = {}, [], {}
    for kind, c in picks:
        if kind == "n":
            name = "n"
            jmap[name] = F.count(F.lit(1))
            parts.append(f'COUNT(*) AS "{name}"')
            out_cols[name] = "bigint"
        elif kind == "sum":
            name = f"sum_{c}"
            jmap[name] = F.sum(c)
            if cols[c] == "double":
                parts.append(f'SUM("{c}") AS "{name}"')
                out_cols[name] = "double"
            else:
                # DuckDB SUM(INTEGER) is HUGEINT; Spark's is BIGINT
                parts.append(f'CAST(SUM("{c}") AS BIGINT) AS "{name}"')
                out_cols[name] = "bigint"
        elif kind == "avg":
            name = f"avg_{c}"
            jmap[name] = F.avg(c)
            parts.append(f'AVG("{c}") AS "{name}"')
            out_cols[name] = "double"
        elif kind in ("min", "max"):
            name = f"{kind}_{c}"
            jmap[name] = (F.min if kind == "min" else F.max)(c)
            parts.append(f'{kind.upper()}("{c}") AS "{name}"')
            out_cols[name] = cols[c]
        else:
            name = f"nd_{c}"
            jmap[name] = F.countDistinct(c)
            parts.append(f'COUNT(DISTINCT "{c}") AS "{name}"')
            out_cols[name] = "bigint"
    state["agged"] = True
    state["has_i"] = False
    state["cols"] = {**{b: cols[b] for b in by}, **out_cols}
    bysql = ", ".join(f'"{b}"' for b in by)
    sel = (bysql + ", " if by else "") + ", ".join(parts)
    group = f" GROUP BY {bysql}" if by else ""
    return (
        lambda dt, dim, _j=jmap, _b=by: dt.query(j=_j, by=list(_b)),
        lambda q, _s=sel, _g=group: f"SELECT {_s} FROM ({q}){_g}",
        f"agg[by={by} {sorted(jmap)}]",
    )


def _gen_window(draw, state):
    cols = state["cols"]
    num = _numeric(state)
    c = draw(st.sampled_from(num))
    by_cands = [b for b, t in cols.items()
                if b not in ("i", c) and t in ("int", "string")]
    by = draw(st.one_of(st.none(), st.sampled_from(by_cands))) \
        if by_cands else None
    part = f'PARTITION BY "{by}" ' if by else ""
    fun = draw(st.sampled_from(["lag", "lead", "cumsum", "cummax"]))
    if fun in ("lag", "lead"):
        nlag = draw(st.integers(1, 2))
        name = f"{c}_{fun}_{nlag}"
        # Spark's withColumns REPLACES an existing column of the same
        # name (data.table := rebind); the SQL twin must EXCLUDE it
        star = f'* EXCLUDE ("{name}")' if name in cols else "*"
        state["cols"] = {**cols, name: cols[c]}
        return (
            lambda dt, dim, _c=c, _n=nlag, _f=fun, _b=by: shift(
                dt, [_c], n=_n, type_=_f, by=_b, order="i"),
            lambda q, _c=c, _n=nlag, _f=fun, _p=part, _nm=name,
            _st=star: (
                f'SELECT {_st}, {_f.upper()}("{_c}", {_n}) OVER '
                f'({_p}ORDER BY "i") AS "{_nm}" FROM ({q})'
            ),
            f"window[{fun}{nlag} {c} by={by}]",
        )
    agg = fun[3:]  # sum | max
    name = f"{c}_cum{agg}"
    star = f'* EXCLUDE ("{name}")' if name in cols else "*"
    if agg == "sum" and cols[c] in ("int", "bigint"):
        typ, cast_o, cast_c = "bigint", "CAST(", " AS BIGINT)"
    else:
        typ, cast_o, cast_c = cols[c], "", ""
    state["cols"] = {**cols, name: typ}
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    return (
        lambda dt, dim, _c=c, _a=agg, _b=by: cumfn(
            dt, _a, [_c], by=_b, order="i"),
        lambda q, _c=c, _a=agg, _p=part, _nm=name, _co=cast_o,
        _cc=cast_c, _fr=frame, _st=star: (
            f'SELECT {_st}, {_co}{_a.upper()}("{_c}") OVER '
            f'({_p}ORDER BY "i" {_fr}){_cc} AS "{_nm}" FROM ({q})'
        ),
        f"window[cum{agg} {c} by={by}]",
    )


def _gen_distinct(draw, state):
    keep_cands = [c for c in state["cols"] if c != "i"]
    keep = draw(st.lists(st.sampled_from(keep_cands), unique=True,
                         min_size=1, max_size=3))
    state["cols"] = {c: state["cols"][c] for c in keep}
    state["has_i"] = False
    sel = ", ".join(f'"{c}"' for c in keep)
    return (
        lambda dt, dim, _k=keep: dt_unique(dt.query(j=list(_k))),
        lambda q, _s=sel: f"SELECT DISTINCT {_s} FROM ({q})",
        f"distinct[{keep}]",
    )


def _gen_sort_limit(draw, state):
    cols = list(state["cols"])
    order = draw(st.permutations(cols))
    descs = [draw(st.booleans()) for _ in order]
    n = draw(st.integers(1, 15))
    specs = [("-" + c) if d else c for c, d in zip(order, descs)]
    osql = ", ".join(
        f'"{c}" {"DESC" if d else "ASC"} NULLS LAST'
        for c, d in zip(order, descs)
    )
    return (
        lambda dt, dim, _s=specs, _n=n: dt.order(*_s).head(_n),
        lambda q, _o=osql, _n=n: (
            f"SELECT * FROM ({q}) ORDER BY {_o} LIMIT {_n}"
        ),
        f"sort_limit[{specs} n={n}]",
    )


def _gen_mid_sort_limit(draw, state):
    """DT.order(...).head(n) MID-pipeline: later stages consume the
    result of the declared-order limit (the r14 bug class: na_last
    placement lost on re-application)."""
    return _gen_sort_limit(draw, state)


def _gen_unique_by(draw, state):
    """unique(by=) keeping the FIRST row per group in the DECLARED
    order — exercises the _OrderList na_last flag riding through
    order() into grouping.unique. Declares a fresh total order (all
    cols, i last when present) so both engines agree on 'first'."""
    from data_table_spark.operators.grouping import unique as dt_unique

    cols = [c for c in state["cols"] if c != "i"]
    tail = ["i"] if state["has_i"] else []
    order_cols = draw(st.permutations(cols))
    descs = [draw(st.booleans()) for _ in order_cols]
    specs = [("-" + c) if d else c
             for c, d in zip(order_cols, descs)] + tail
    osql = ", ".join(
        f'"{c}" {"DESC" if d else "ASC"} NULLS LAST'
        for c, d in zip(order_cols, descs)
    ) + ("".join(f', "{t}" ASC NULLS LAST' for t in tail))
    by = draw(st.lists(st.sampled_from(cols), unique=True,
                       min_size=1, max_size=2))
    bysql = ", ".join(f'"{b}"' for b in by)
    return (
        lambda dt, dim, _s=specs, _b=by: dt_unique(
            dt.order(*_s), by=list(_b)),
        lambda q, _o=osql, _b=bysql: (
            f"SELECT * EXCLUDE (__rn) FROM (SELECT *, ROW_NUMBER() "
            f"OVER (PARTITION BY {_b} ORDER BY {_o}) AS __rn "
            f"FROM ({q})) WHERE __rn = 1"
        ),
        f"unique_by[{by} order={specs}]",
    )


def _gen_melt(draw, state):
    """melt (wide->long unpivot, §2.8) with a UNION ALL SQL twin. Rows
    duplicate per measure, so the unique-i invariant ends here."""
    from data_table_spark.operators.reshape import melt

    cols = state["cols"]
    measures = [c for c in ("v", "k") if cols.get(c) in ("int",)]
    ids = [c for c in cols if c not in measures]
    idsql = ", ".join(f'"{c}"' for c in ids)
    arms = " UNION ALL ".join(
        f"SELECT {idsql}, '{m}' AS \"variable\", \"{m}\" AS \"value\""
        f" FROM __q" for m in measures
    )
    state["cols"] = {**{c: cols[c] for c in ids},
                     "variable": "string", "value": "int"}
    state["has_i"] = False
    return (
        lambda dt, dim, _i=ids, _m=measures: melt(dt, _i, _m),
        lambda q, _a=arms: f"WITH __q AS ({q}) {_a}",
        f"melt[{measures}]",
    )


def _gen_dcast(draw, state):
    """dcast (long->wide pivot, §2.8): sum(v) spread over the g levels
    (NULL coalesced to 'na'), conditional-aggregation SQL twin."""
    from data_table_spark.operators.reshape import dcast

    cols = state["cols"]
    by = draw(st.sampled_from([c for c in ("k", "s") if c in cols]))
    vals = ["a", "b", "c", "na"]
    arms = ", ".join(
        f"CAST(SUM(CASE WHEN COALESCE(\"g\", 'na') = '{lv}' THEN \"v\""
        f" END) AS BIGINT) AS \"{lv}\"" for lv in vals
    )
    state["cols"] = {by: cols[by], **{lv: "bigint" for lv in vals}}
    state["has_i"] = False
    state["agged"] = True
    return (
        lambda dt, dim, _b=by, _v=vals: dcast(
            dt.let(g2=F.coalesce(F.col("g"), F.lit("na"))),
            [_b], "g2", "v", fun_agg={"s": F.sum("v")},
            pivot_values=_v,
        ),
        lambda q, _b=by, _a=arms: (
            f'SELECT "{_b}", {_a} FROM ({q}) GROUP BY "{_b}"'
        ),
        f"dcast[by={by}]",
    )



def _gen_stage(draw, state, idx, forced=None):
    opts = ["filter", "compute"]
    if not state["joined"] and state["cols"].get("k") == "int":
        opts += ["join"]
    if not state["agged"]:
        opts += ["agg"]
    if state["has_i"] and _numeric(state):
        opts += ["window"]
    if len(state["cols"]) > (1 if state["has_i"] else 0):
        opts += ["distinct"]
    if len(state["cols"]) > (1 if state["has_i"] else 0):
        opts += ["sort_limit_mid", "unique_by"]
    kind = forced if forced in opts else draw(st.sampled_from(opts))
    if kind == "filter":
        return _gen_filter(draw, state)
    if kind == "compute":
        return _gen_compute(draw, state, idx)
    if kind == "join":
        return _gen_join(draw, state)
    if kind == "agg":
        return _gen_agg(draw, state)
    if kind == "window":
        return _gen_window(draw, state)
    if kind == "sort_limit_mid":
        return _gen_mid_sort_limit(draw, state)
    if kind == "unique_by":
        return _gen_unique_by(draw, state)
    return _gen_distinct(draw, state)


# ------------------------------------------------------------ execution

def _run_pipeline(spark, rows, dim_rows, stages):
    dt = DT(spark.createDataFrame(rows, MAIN_DDL))
    dim = DT(spark.createDataFrame(dim_rows, DIM_DDL))
    sql = "SELECT * FROM t0"
    descs = []
    for dt_fn, sql_fn, desc in stages:
        dt = dt_fn(dt, dim)
        sql = sql_fn(sql)
        descs.append(desc)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t0 (i INTEGER, k INTEGER, g VARCHAR,"
        " v INTEGER, x DOUBLE, s VARCHAR)")
    con.execute("CREATE TABLE dim (k INTEGER, w INTEGER, lbl VARCHAR)")
    if rows:
        con.executemany("INSERT INTO t0 VALUES (?,?,?,?,?,?)", rows)
    if dim_rows:
        con.executemany("INSERT INTO dim VALUES (?,?,?)", dim_rows)

    got = dt.df.toPandas()
    exp = con.execute(sql).fetchdf()
    con.close()

    ctx = (f"pipeline: {' | '.join(descs)}\nsql: {sql}\n"
           f"rows: {rows}\ndim: {dim_rows}")
    gc, gr = frame_sig(got)
    ec, er = frame_sig(exp)
    assert gc == ec, f"columns {gc} vs {ec}\n{ctx}"
    assert len(gr) == len(er), f"rows {len(gr)} vs {len(er)}\n{ctx}"
    bad = [(a, b) for a, b in zip(gr, er) if a != b]
    assert not bad, (
        f"{len(bad)}/{len(gr)} rows differ; first:\n"
        f"  spark: {bad[0][0]}\n  duck : {bad[0][1]}\n{ctx}"
    )


@settings(max_examples=85, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large,
                                 HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(data=st.data())
def test_composition_random(spark, data):
    """85 fully random 2-4-stage pipelines (+optional terminal
    sort/limit) — the general composition sweep."""
    draw = data.draw
    rows = _main_rows(draw)
    dim_rows = _dim_rows(draw)
    state = {"cols": dict(MAIN_SCHEMA), "has_i": True,
             "joined": False, "agged": False}
    stages = [
        _gen_stage(draw, state, idx)
        for idx in range(draw(st.integers(2, 4)))
    ]
    if draw(st.booleans()):
        stages.append(_gen_sort_limit(draw, state))
    _run_pipeline(spark, rows, dim_rows, stages)


@settings(max_examples=45, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large,
                                 HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(data=st.data())
def test_composition_join_window_agg(spark, data):
    """45 pipelines forced through the deepest interaction chain the
    verdict named: join -> window over the join output -> aggregate of
    the window column, then a terminal sort/limit."""
    draw = data.draw
    rows = _main_rows(draw)
    dim_rows = _dim_rows(draw)
    state = {"cols": dict(MAIN_SCHEMA), "has_i": True,
             "joined": False, "agged": False}
    stages = [
        _gen_stage(draw, state, 0, forced="join"),
        _gen_stage(draw, state, 1, forced="window"),
        _gen_stage(draw, state, 2, forced="agg"),
    ]
    stages.append(_gen_sort_limit(draw, state))
    _run_pipeline(spark, rows, dim_rows, stages)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large,
                                 HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(data=st.data())
def test_composition_reshape(spark, data):
    """30 pipelines through the reshape dimension: optional filter ->
    melt or dcast -> 0-2 generic stages -> optional sort/limit."""
    draw = data.draw
    rows = _main_rows(draw)
    dim_rows = _dim_rows(draw)
    state = {"cols": dict(MAIN_SCHEMA), "has_i": True,
             "joined": False, "agged": False}
    stages = []
    if draw(st.booleans()):
        stages.append(_gen_filter(draw, state))
    if draw(st.booleans()):
        stages.append(_gen_melt(draw, state))
    else:
        stages.append(_gen_dcast(draw, state))
    for j in range(draw(st.integers(0, 2))):
        stages.append(_gen_stage(draw, state, 10 + j))
    if draw(st.booleans()):
        stages.append(_gen_sort_limit(draw, state))
    _run_pipeline(spark, rows, dim_rows, stages)
