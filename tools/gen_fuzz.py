#!/usr/bin/env python3
"""Deterministic differential-fuzz query generator.

Generates N random aggregate/join/filter queries in the COMMON
Spark<->DuckDB SQL dialect and writes them as a TSV (name<TAB>sql, one
line each; SQL is generated single-line so no escaping is needed).
`graft.FuzzRunner` executes each query with spark.sql over the
registered fixture views and dumps Verify-shaped output, after which
tools/check_oracles.py applies the SAME pandas-canonicalized comparator
the driver uses. Both engines evaluate the IDENTICAL query text, so a
mismatch is a genuine cross-engine semantic divergence (type coercion,
overflow, null ordering) rather than a transcription bug — this
generalizes the reference's differential-testing backbone
(reference: tests/tpch.rs:168-194, fixed query corpus) to an unbounded
generated corpus.

Dialect discipline (what keeps the common subset common):
- no raw double aggregates (float addition order diverges): money
  columns aggregate via the scaled-BIGINT fix6 form and are EMITTED as
  BIGINT micros;
- every integer SUM is CAST(... AS BIGINT) (DuckDB HUGEINT -> pandas
  float64 otherwise — see COVERAGE.md type contract);
- timestamp columns are only touched through year()/month() (timestamp
  vs date-literal coercion differs between engines);
- string literals in predicates are SAMPLED FROM THE FIXTURE via
  DuckDB, so selectivity is real;
- LEFT JOIN templates group only by never-null string dims and count
  with COUNT(col), avoiding engine-specific null-group dtype coercion;
- DECIMAL templates quantize doubles in pure IEEE-754 first
  (FLOOR(x*100+0.5), the fix6 form at cent scale: double->decimal tie
  rounding differs between engines, Spark HALF_UP vs DuckDB
  half-even), do exact decimal arithmetic inside bounded precision
  (products stay under p=38 so neither engine truncates scale), and
  EMIT decimals as fixed-scale strings (CAST .. AS STRING: pandas
  coerces oracle-side DECIMAL to float64 otherwise — the same
  representation trap x_decimal_arith documents);
- interval arithmetic shifts timestamps only against OTHER timestamps
  (ts + INTERVAL k < other_ts) or re-enters year()/month() — no
  timestamp literals cross an engine boundary;
- NULL-key outer joins pre-aggregate each side (one row per key) and
  COALESCE every nullable output to a typed sentinel, so the null-key
  non-match semantics are exercised while the emitted frame stays
  sentinel-typed (no engine-specific null-group dtype coercion).

usage: gen_fuzz.py <sfDir> <seed> <n> <outTsv>
"""
import os
import random
import sys

import duckdb


def main() -> None:
    sf_dir, seed, n, out = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    rng = random.Random(seed)
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "lineitem", "part", "supplier"]:
        tp = f"{sf_dir}/{t}.parquet"
        # ScaleUp replicas are Spark-style parquet DIRECTORIES of part files
        src = f"{tp}/*.parquet" if os.path.isdir(tp) else tp
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    def sample_vals(table, col, k):
        rows = con.execute(
            f"SELECT DISTINCT {col} FROM {table} ORDER BY {col}").fetchall()
        vals = [r[0] for r in rows if r[0] is not None]
        return rng.sample(vals, min(k, len(vals)))

    # (source SQL, available tables, left-join?) — join keys are the
    # fixture's natural foreign keys
    sources = [
        ("orders", ["orders"], False),
        ("lineitem", ["lineitem"], False),
        ("customer", ["customer"], False),
        ("part", ["part"], False),
        ("orders JOIN customer ON o_custkey = c_custkey",
         ["orders", "customer"], False),
        ("orders JOIN customer ON o_custkey = c_custkey "
         "JOIN nation ON c_nationkey = n_nationkey",
         ["orders", "customer", "nation"], False),
        ("lineitem JOIN part ON l_partkey = p_partkey",
         ["lineitem", "part"], False),
        ("lineitem JOIN supplier ON l_suppkey = s_suppkey",
         ["lineitem", "supplier"], False),
        ("lineitem JOIN orders ON l_orderkey = o_orderkey",
         ["lineitem", "orders"], False),
        ("customer LEFT JOIN orders ON o_custkey = c_custkey",
         ["customer", "orders"], True),
    ]

    str_cols = {  # never-null low-cardinality string dims per table
        "orders": ["o_orderstatus", "o_orderpriority"],
        "customer": ["c_mktsegment"],
        "nation": ["n_name"],
        "lineitem": ["l_returnflag", "l_linestatus"],
        "part": ["p_brand"],
        "supplier": [],
    }
    int_cols = {
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey", "c_nationkey"],
        "nation": ["n_nationkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_linenumber"],
        "part": ["p_partkey", "p_size"],
        "supplier": ["s_suppkey", "s_nationkey"],
    }
    dbl_cols = {  # (col, lo, hi) plausible threshold range
        "orders": [("o_totalprice", 5000, 300000)],
        "customer": [("c_acctbal", -500, 8000)],
        "nation": [],
        "lineitem": [("l_quantity", 5, 45), ("l_extendedprice", 2000, 80000),
                     ("l_discount", 0.02, 0.08)],
        "part": [("p_retailprice", 950, 1950)],
        "supplier": [("s_acctbal", -500, 8000)],
    }
    ts_cols = {
        "orders": ["o_orderdate"],
        "lineitem": ["l_shipdate"],
        "customer": [], "nation": [], "part": [], "supplier": [],
    }

    def pick(xs):
        return xs[rng.randrange(len(xs))]

    def dims_for(tables, left):
        cands = []
        for t in tables:
            # the left-join right side's columns may be NULL: group only
            # by the preserved side's dims there
            if left and t == "orders":
                continue
            for c in str_cols[t]:
                cands.append((c, c))
            if not left:
                for c in ts_cols[t]:
                    cands.append((f"year({c})", f"y_{c[:5]}"))
                    cands.append((f"month({c})", f"m_{c[:5]}"))
                for c in int_cols[t]:
                    k = pick([3, 5, 7, 11])
                    cands.append((f"{c} % {k}", f"b_{c[2:8]}"))
                for c, lo, hi in dbl_cols[t]:
                    thr = round(rng.uniform(lo, hi), 2)
                    cands.append((
                        f"CASE WHEN {c} > {thr} THEN 'hi' ELSE 'lo' END",
                        f"c_{c[2:8]}"))
        rng.shuffle(cands)
        seen, out = set(), []
        for expr, name in cands[: rng.randint(1, 2)]:
            if name not in seen:
                seen.add(name)
                out.append((expr, name))
        return out

    def aggs_for(tables, left):
        aggs = [("COUNT(*)", "cnt")]
        pool = []
        for t in tables:
            if left and t == "orders":
                # right side of the left join: COUNT(col) counts matches
                pool.append(("COUNT(o_orderkey)", "n_orders"))
                continue
            for c in int_cols[t]:
                pool.append((f"CAST(SUM({c} % 97) AS BIGINT)", f"s_{c[2:8]}"))
                pool.append((f"CAST(MIN({c}) AS BIGINT)", f"mn_{c[2:8]}"))
            for c in str_cols[t]:
                pool.append((f"COUNT(DISTINCT {c})", f"d_{c[2:8]}"))
                pool.append((f"MAX({c})", f"mx_{c[2:8]}"))
            for c, _, _ in dbl_cols[t]:
                pool.append((
                    f"CAST(SUM(CAST(FLOOR({c} * 1000000.0 + 0.5) AS BIGINT))"
                    f" AS BIGINT)", f"f6_{c[2:8]}"))
        rng.shuffle(pool)
        seen = {"cnt"}
        for expr, name in pool[: rng.randint(1, 3)]:
            if name not in seen:
                seen.add(name)
                aggs.append((expr, name))
        return aggs

    def pred_atom(tables, left):
        t = pick(tables)
        kind_pool = []
        if dbl_cols[t]:
            kind_pool.append("dbl")
        if not (left and t == "orders"):
            if str_cols[t]:
                kind_pool += ["in", "like"]
            if int_cols[t]:
                kind_pool.append("mod")
            if ts_cols[t]:
                kind_pool += ["year", "month"]
        if not kind_pool:
            return None
        kind = pick(kind_pool)
        if kind == "dbl":
            c, lo, hi = pick(dbl_cols[t])
            thr = round(rng.uniform(lo, hi), 2)
            return f"{c} {pick(['<', '>', '<=', '>='])} {thr}"
        if kind == "mod":
            c = pick(int_cols[t])
            k = pick([3, 5, 7, 11, 13])
            op = pick(["=", "<>", "<"])
            # a modulus is never negative, so "< 0" would be always-false —
            # degenerate coverage, and empty input is a real divergence
            # class for grouping sets (see grouping_sets)
            lit = rng.randrange(1, k) if op == "<" else rng.randrange(k)
            return f"{c} % {k} {op} {lit}"
        if kind == "in":
            c = pick(str_cols[t])
            vals = sample_vals(t, c, rng.randint(1, 3))
            lit = ", ".join("'" + v.replace("'", "''") + "'" for v in vals)
            return f"{c} {pick(['IN', 'NOT IN'])} ({lit})"
        if kind == "like":
            c = pick(str_cols[t])
            v = sample_vals(t, c, 1)
            if not v:
                return None
            return f"{c} LIKE '{v[0][:2]}%'"
        if kind == "year":
            c = pick(ts_cols[t])
            return f"year({c}) {pick(['=', '>=', '<'])} {rng.randint(1995, 2001)}"
        c = pick(ts_cols[t])
        months = sorted(rng.sample(range(1, 13), rng.randint(2, 4)))
        return f"month({c}) IN ({', '.join(map(str, months))})"

    def where_of(tables, left, lo=0, hi=2):
        atoms = [a for a in (pred_atom(tables, left)
                             for _ in range(rng.randint(lo, hi))) if a]
        if not atoms:
            return ""
        return " WHERE " + pick([" AND ", " OR "]).join(atoms)

    def grouped(src, tables, left):
        dims = dims_for(tables, left)
        aggs = aggs_for(tables, left)
        where = where_of(tables, left)
        sel = ", ".join([f"{e} AS {n}" for e, n in dims] +
                        [f"{e} AS {n}" for e, n in aggs])
        group = ""
        if dims:
            group = " GROUP BY " + ", ".join(e for e, _ in dims)
            if rng.random() < 0.3:
                group += f" HAVING COUNT(*) >= {rng.randint(2, 5)}"
        return f"SELECT {sel} FROM {src}{where}{group}"

    def union_all(src, tables, left):
        # two branches, same shape, different predicates, tagged by leg —
        # exercises by-position union binding on both engines
        aggs = aggs_for(tables, left)
        sel = ", ".join(f"{e} AS {n}" for e, n in aggs)
        w1, w2 = where_of(tables, left, 1, 2), where_of(tables, left, 1, 2)
        return (f"SELECT 'a' AS leg, {sel} FROM {src}{w1} "
                f"UNION ALL SELECT 'b' AS leg, {sel} FROM {src}{w2}")

    def in_subquery():
        # semi-join via IN: customers in a balance band, counted by orders
        thr = round(rng.uniform(0, 6000), 2)
        op = pick(["IN", "NOT IN"])
        return (f"SELECT o_orderstatus AS o_orderstatus, COUNT(*) AS cnt,"
                f" CAST(SUM(o_orderkey % 97) AS BIGINT) AS s_orderk"
                f" FROM orders WHERE o_custkey {op}"
                f" (SELECT c_custkey FROM customer WHERE c_acctbal > {thr})"
                f" GROUP BY o_orderstatus")

    def exists_subquery():
        # correlated EXISTS: decorrelates to a semi/anti join on Spark
        y = rng.randint(1995, 2001)
        neg = pick(["EXISTS", "NOT EXISTS"])
        return (f"SELECT c_mktsegment AS c_mktsegment, COUNT(*) AS cnt"
                f" FROM customer WHERE {neg} (SELECT 1 FROM orders"
                f" WHERE o_custkey = c_custkey AND year(o_orderdate) = {y})"
                f" GROUP BY c_mktsegment")

    def scalar_subquery():
        # exact scalar threshold (MIN/MAX, never AVG: a float-averaged
        # threshold can flip boundary rows between engines)
        off = rng.randint(1000, 80000)
        return (f"SELECT o_orderpriority AS o_orderpriority, COUNT(*) AS cnt"
                f" FROM orders WHERE o_totalprice >"
                f" (SELECT MIN(o_totalprice) FROM orders) + {off}"
                f" GROUP BY o_orderpriority")

    def topk():
        # row-level ORDER BY + LIMIT, made deterministic by the unique-key
        # tiebreak; raw doubles round-trip exactly (no aggregation)
        t, key, val, s = pick([
            ("orders", "o_orderkey", "o_totalprice", "o_orderstatus"),
            ("customer", "c_custkey", "c_acctbal", "c_mktsegment"),
            ("part", "p_partkey", "p_retailprice", "p_brand"),
        ])
        where = where_of([t], False, 0, 1)
        d = pick(["DESC", "ASC"])
        return (f"SELECT {key} AS k, {val} AS v, {s} AS s FROM {t}{where}"
                f" ORDER BY {val} {d}, {key} LIMIT {rng.randint(5, 20)}")

    def window_rank():
        # per-group top-n via ROW_NUMBER with unique tiebreak
        nn = rng.randint(2, 4)
        return (f"SELECT c_mktsegment, c_custkey, rn FROM"
                f" (SELECT c_mktsegment, c_custkey, ROW_NUMBER() OVER"
                f" (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC,"
                f" c_custkey) AS rn FROM customer) t WHERE rn <= {nn}")

    def window_frame():
        # RANGE/ROWS frame aggregates (r8 verdict item 8: the classic
        # cross-engine divergence nest). Determinism discipline: a RANGE
        # frame includes every PEER of its boundary rows, so the ORDER BY
        # key is chosen tie-RICH (year/modulo buckets) and the framed
        # aggregate is deterministic because peer sets are; a ROWS frame
        # is only deterministic under a TOTAL order, so the unique key
        # joins the ORDER BY. Money enters fix6-quantized (BIGINT cents)
        # per the dialect discipline; output is sliced by a key modulus
        # OUTSIDE the window subquery so frames see the full table while
        # the emitted frame stays bounded at replica scale.
        t, pk, part, okey, val = pick([
            ("orders", "o_orderkey", "o_orderstatus", "year(o_orderdate)",
             "o_totalprice"),
            ("customer", "c_custkey", "c_mktsegment", "c_nationkey % 5",
             "c_acctbal"),
            ("part", "p_partkey", "p_brand", "p_size % 7", "p_retailprice"),
        ])
        cents = f"CAST(FLOOR({val} * 100.0 + 0.5) AS BIGINT)"
        a, b = rng.randint(1, 3), rng.randint(1, 3)
        frame = pick([
            f"RANGE BETWEEN {a} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {b} FOLLOWING",
            f"RANGE BETWEEN {a} PRECEDING AND {b} FOLLOWING",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {a} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ])
        order = okey if frame.startswith("RANGE") else f"{okey}, {pk}"
        agg = pick([f"SUM({cents})", "COUNT(*)", f"MIN({cents})",
                    f"MAX({cents})"])
        m = rng.randint(0, 196)
        return (f"SELECT k, CAST(w AS BIGINT) AS w FROM"
                f" (SELECT {pk} AS k, {agg} OVER"
                f" (PARTITION BY {part} ORDER BY {order} {frame}) AS w"
                f" FROM {t}) t WHERE k % 197 = {m}")

    def window_nulls():
        # NULLS FIRST/LAST inversions inside window ORDER BY (r9 verdict
        # item 8). Dialect hazard this template documents: Spark's
        # default null placement is NULLS FIRST for ASC / NULLS LAST for
        # DESC, DuckDB's default is NULLS LAST either way — so the
        # grammar ALWAYS writes the placement explicitly; the divergence
        # class is covered by drawing all four direction/placement
        # combinations. NULLIF manufactures nulls from the dense modular
        # key; the unique pk joins the ORDER BY so ranks are total-order
        # deterministic (ties inside the null bucket included).
        t, pk, part, nkey = pick([
            ("customer", "c_custkey", "c_mktsegment", "c_nationkey % 5"),
            ("orders", "o_orderkey", "o_orderstatus", "o_custkey % 7"),
            ("part", "p_partkey", "p_brand", "p_size % 6"),
        ])
        v = rng.randint(0, 4)
        d = pick(["ASC", "DESC"])
        fl = pick(["NULLS FIRST", "NULLS LAST"])
        fn = pick(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
        m = rng.randint(0, 30)
        return (f"SELECT k, CAST(r AS BIGINT) AS r FROM"
                f" (SELECT {pk} AS k, {fn} OVER (PARTITION BY {part}"
                f" ORDER BY NULLIF({nkey}, {v}) {d} {fl}, {pk}) AS r"
                f" FROM {t}) t WHERE k % 31 = {m}")

    def except_all():
        # EXCEPT ALL / INTERSECT ALL duplicate multiplicity (r9 verdict
        # item 8): bag semantics keep max(0, countL - countR) (resp.
        # min(countL, countR)) copies per row — the classic divergence
        # nest vs the DISTINCT set ops the grammar already draws. Both
        # legs project dup-RICH modular rows from the same table under
        # different predicates; the outer GROUP BY pins the multiplicity
        # exactly while keeping the compared output bounded.
        op = pick(["EXCEPT ALL", "INTERSECT ALL"])
        k = rng.randint(2, 6)
        p1, p2 = rng.randint(0, 2), rng.randint(0, 3)
        return (f"SELECT a, b, COUNT(*) AS cnt FROM"
                f" (SELECT l_returnflag AS a,"
                f" CAST(l_suppkey % {k} AS BIGINT) AS b"
                f" FROM lineitem WHERE l_partkey % 3 = {p1}"
                f" {op}"
                f" SELECT l_returnflag AS a,"
                f" CAST(l_suppkey % {k} AS BIGINT) AS b"
                f" FROM lineitem WHERE l_orderkey % 4 = {p2}) t"
                f" GROUP BY a, b")

    def interval_chain():
        # chained date±interval arithmetic, both comparison sides shifted
        # (r8 verdict item 8): date->timestamp promotion, interval add
        # ordering and end-of-month clamping are all exercised, while no
        # timestamp literal ever crosses an engine boundary (the dialect
        # rule interval_shift established)
        k1, k2, k3 = rng.randint(1, 60), rng.randint(1, 20), rng.randint(1, 6)
        u1 = pick(["DAY", "MONTH"])
        u2 = pick(["HOUR", "DAY"])
        cmp = pick(["<", "<=", ">="])
        return (f"SELECT l_returnflag AS flag, l_linestatus AS ls,"
                f" COUNT(*) AS cnt, CAST(SUM(l_suppkey % 53) AS BIGINT) AS s"
                f" FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
                f" WHERE o_orderdate + INTERVAL {k1} {u1} + INTERVAL {k2} {u2}"
                f" {cmp} l_shipdate - INTERVAL {k3} DAY"
                f" GROUP BY l_returnflag, l_linestatus")

    def dd(c):
        # exact double -> DECIMAL(15,2): IEEE-pure cent quantization
        # (identical bit-level FLOOR on both engines), then an exact
        # integer*decimal product — never a double->decimal CAST, whose
        # tie rounding diverges (Spark HALF_UP, DuckDB half-even)
        return (f"CAST(CAST(FLOOR({c} * 100.0 + 0.5) AS BIGINT)"
                f" * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(15,2))")

    def decimal_agg():
        # exact decimal aggregation chains, emitted as fixed-scale strings
        src, tables, left = pick([s for s in sources if not s[2]])
        dims = dims_for(tables, left)
        money = [c for t in tables for c, _, _ in dbl_cols[t]]
        rng.shuffle(money)
        aggs = [("COUNT(*)", "cnt")]
        for c in money[: rng.randint(1, 2)]:
            form = pick(["sum", "minmax"])
            if form == "sum":
                aggs.append((f"CAST(CAST(SUM({dd(c)}) AS DECIMAL(27,2))"
                             f" AS STRING)", f"sd_{c[2:8]}"))
            else:
                aggs.append((f"CAST(MIN({dd(c)}) AS STRING)", f"mnd_{c[2:8]}"))
                aggs.append((f"CAST(MAX({dd(c)}) AS STRING)", f"mxd_{c[2:8]}"))
        if "lineitem" in tables and rng.random() < 0.7:
            # product chain: (15,2)x(16,2) -> p=32 exact on both engines
            # (under 38, so no engine-side scale truncation kicks in)
            aggs.append((
                f"CAST(CAST(SUM({dd('l_extendedprice')} *"
                f" (CAST(1 AS DECIMAL(3,0)) - {dd('l_discount')}))"
                f" AS DECIMAL(38,4)) AS STRING)", "sd_disc_price"))
        where = where_of(tables, left)
        sel = ", ".join([f"{e} AS {n}" for e, n in dims] +
                        [f"{e} AS {n}" for e, n in aggs])
        group = " GROUP BY " + ", ".join(e for e, _ in dims) if dims else ""
        return f"SELECT {sel} FROM {src}{where}{group}"

    def grouping_sets():
        # multi-set aggregation: GROUPING SETS / ROLLUP / CUBE over two
        # never-null string dims, null placeholders COALESCE'd and the
        # grouping flags emitted as BIGINT (dtype-stable on both sides)
        src, d1, d2 = pick([
            ("lineitem", "l_returnflag", "l_linestatus"),
            ("orders", "o_orderstatus", "o_orderpriority"),
            ("orders JOIN customer ON o_custkey = c_custkey",
             "c_mktsegment", "o_orderstatus"),
        ])
        tables = (["orders", "customer"] if "JOIN" in src
                  else [src.split()[0]])
        spec = pick([
            f"GROUPING SETS (({d1}, {d2}), ({d1}), ())",
            f"GROUPING SETS (({d1}), ({d2}))",
            f"ROLLUP ({d1}, {d2})",
            f"CUBE ({d1}, {d2})",
        ])
        extra = aggs_for(tables, False)[1:2]  # 0-1 extra aggregate
        sel = ", ".join(
            [f"COALESCE({d1}, 'ALL') AS a", f"COALESCE({d2}, 'ALL') AS b",
             f"CAST(GROUPING({d1}) AS BIGINT) AS g1",
             f"CAST(GROUPING({d2}) AS BIGINT) AS g2",
             "COUNT(*) AS cnt"] + [f"{e} AS {n}" for e, n in extra])
        where = where_of(tables, False, 0, 1)
        # HAVING guard: on EMPTY input Spark's Expand-based grouping sets
        # emit NO global () row while the standard (and DuckDB) emit one
        # with cnt=0 — a real engine divergence (found by fz160, seed 6).
        # COUNT(*) > 0 is an identity on every non-empty group, and it
        # filters the divergent empty-input global row on both engines,
        # making the template immune to any always-false WHERE draw.
        return (f"SELECT {sel} FROM {src}{where} GROUP BY {spec}"
                " HAVING COUNT(*) > 0")

    def full_outer():
        # FULL OUTER JOIN on NULL-heavy derived keys: each side is
        # pre-aggregated (one row per key incl. one NULL-key row), so the
        # null-key rows MUST surface unmatched on both engines; every
        # nullable output is COALESCE'd to a typed sentinel
        (ta, ka), (tb, kb) = pick([
            (("customer", "c_nationkey"), ("supplier", "s_nationkey")),
            (("orders", "o_custkey"), ("customer", "c_custkey")),
            (("lineitem", "l_partkey"), ("part", "p_partkey")),
        ])
        m = pick([5, 7, 9, 11, 13])
        ra, rb = rng.randrange(m), rng.randrange(m)
        wa, wb = where_of([ta], False, 0, 1), where_of([tb], False, 0, 1)
        sa = f"CAST(SUM({ka} % 89) AS BIGINT)"
        sb = f"CAST(SUM({kb} % 83) AS BIGINT)"
        return (
            f"SELECT CAST(COALESCE(a.k, b.k, -1) AS BIGINT) AS k,"
            f" COALESCE(a.ca, -1) AS ca, COALESCE(b.cb, -1) AS cb,"
            f" COALESCE(a.sa, -1) AS sa, COALESCE(b.sb, -1) AS sb FROM"
            f" (SELECT NULLIF({ka} % {m}, {ra}) AS k,"
            f" CAST(COUNT(*) AS BIGINT) AS ca, {sa} AS sa"
            f" FROM {ta}{wa} GROUP BY 1) a"
            f" FULL OUTER JOIN"
            f" (SELECT NULLIF({kb} % {m}, {rb}) AS k,"
            f" CAST(COUNT(*) AS BIGINT) AS cb, {sb} AS sb"
            f" FROM {tb}{wb} GROUP BY 1) b ON a.k = b.k")

    def decimal_grouping_sets():
        # v4: exact decimal PRODUCT chains aggregated over multi-set
        # grouping — the decimal_agg and grouping_sets seams composed
        # (round-7 verdict item 8). Dims follow grouping_sets (never-null
        # strings, COALESCE'd placeholders, GROUPING flags as BIGINT);
        # measures follow decimal_agg (IEEE-pure cent quantization,
        # products bounded under p=38, emitted as fixed-scale strings).
        src, d1, d2 = pick([
            ("lineitem", "l_returnflag", "l_linestatus"),
            ("lineitem JOIN part ON l_partkey = p_partkey",
             "l_returnflag", "p_brand"),
            ("lineitem JOIN orders ON l_orderkey = o_orderkey",
             "o_orderstatus", "l_linestatus"),
        ])
        tables = (["lineitem", src.split(" JOIN ")[1].split()[0]]
                  if "JOIN" in src else ["lineitem"])
        spec = pick([
            f"GROUPING SETS (({d1}, {d2}), ({d1}), ())",
            f"GROUPING SETS (({d1}), ({d2}))",
            f"ROLLUP ({d1}, {d2})",
            f"CUBE ({d1}, {d2})",
        ])
        aggs = [("COUNT(*)", "cnt"),
                (f"CAST(CAST(SUM({dd('l_extendedprice')} *"
                 f" (CAST(1 AS DECIMAL(3,0)) - {dd('l_discount')}))"
                 f" AS DECIMAL(38,4)) AS STRING)", "sd_disc_price")]
        if rng.random() < 0.5:
            # second product: three-factor chain with NARROW typed terms
            # so the result precision stays exact on both engines:
            # (15,2) x (1-(3,2))=(6,2) -> (22,4); x (1+(6,2))=(7,2) ->
            # (30,6) — under p=38, no engine-side scale truncation
            disc = ("CAST(CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)"
                    " * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(3,2))")
            qty = ("CAST(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)"
                   " * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(6,2))")
            aggs.append((
                f"CAST(CAST(SUM({dd('l_extendedprice')} *"
                f" (CAST(1 AS DECIMAL(3,0)) - {disc}) *"
                f" (CAST(1 AS DECIMAL(3,0)) + {qty}))"
                f" AS DECIMAL(38,6)) AS STRING)", "sd_charge"))
        else:
            aggs.append((f"CAST(MIN({dd('l_extendedprice')}) AS STRING)",
                         "mnd_extend"))
        sel = ", ".join(
            [f"COALESCE({d1}, 'ALL') AS a", f"COALESCE({d2}, 'ALL') AS b",
             f"CAST(GROUPING({d1}) AS BIGINT) AS g1",
             f"CAST(GROUPING({d2}) AS BIGINT) AS g2"] +
            [f"{e} AS {n}" for e, n in aggs])
        where = where_of(tables, False, 0, 1)
        # HAVING guard: on EMPTY input Spark's Expand-based grouping sets
        # emit NO global () row while the standard (and DuckDB) emit one
        # with cnt=0 — a real engine divergence (found by fz160, seed 6).
        # COUNT(*) > 0 is an identity on every non-empty group, and it
        # filters the divergent empty-input global row on both engines,
        # making the template immune to any always-false WHERE draw.
        return (f"SELECT {sel} FROM {src}{where} GROUP BY {spec}"
                " HAVING COUNT(*) > 0")

    def full_outer_decimal():
        # v4: NULL-key FULL OUTER against pre-aggregated sides carrying
        # EXACT DECIMAL measures — the full_outer and decimal_agg seams
        # composed. Unmatched sides surface NULL decimals; every output
        # is COALESCE'd to a same-dtype sentinel STRING, so the frame
        # stays dtype-stable on both engines.
        (ta, ka, ma), (tb, kb, mb) = pick([
            (("customer", "c_nationkey", "c_acctbal"),
             ("supplier", "s_nationkey", "s_acctbal")),
            (("orders", "o_custkey", "o_totalprice"),
             ("customer", "c_custkey", "c_acctbal")),
            (("lineitem", "l_partkey", "l_extendedprice"),
             ("part", "p_partkey", "p_retailprice")),
        ])
        m = pick([5, 7, 9, 11, 13])
        ra, rb = rng.randrange(m), rng.randrange(m)
        wa, wb = where_of([ta], False, 0, 1), where_of([tb], False, 0, 1)
        da = f"CAST(CAST(SUM({dd(ma)}) AS DECIMAL(27,2)) AS STRING)"
        db = f"CAST(MAX({dd(mb)}) AS STRING)"
        return (
            f"SELECT CAST(COALESCE(a.k, b.k, -1) AS BIGINT) AS k,"
            f" COALESCE(a.ca, -1) AS ca, COALESCE(b.cb, -1) AS cb,"
            f" COALESCE(a.da, 'none') AS da, COALESCE(b.db, 'none') AS db"
            f" FROM"
            f" (SELECT NULLIF({ka} % {m}, {ra}) AS k,"
            f" CAST(COUNT(*) AS BIGINT) AS ca, {da} AS da"
            f" FROM {ta}{wa} GROUP BY 1) a"
            f" FULL OUTER JOIN"
            f" (SELECT NULLIF({kb} % {m}, {rb}) AS k,"
            f" CAST(COUNT(*) AS BIGINT) AS cb, {db} AS db"
            f" FROM {tb}{wb} GROUP BY 1) b ON a.k = b.k")

    def left_nullkey():
        # LEFT JOIN whose right side carries a NULL-heavy key: the right
        # side is pre-aggregated to one row per key, the probe groups by
        # a never-null dim; COUNT(col) counts matches, SUM COALESCE'd
        m = pick([5, 7, 9, 11])
        r = rng.randrange(m)
        seg = pick(["c_mktsegment", "c_nationkey % 4"])
        alias = "seg" if seg == "c_mktsegment" else "nk"
        wb = where_of(["supplier"], False, 0, 1)
        return (
            f"SELECT {seg} AS {alias}, COUNT(*) AS cnt,"
            f" COUNT(b.ns) AS matched,"
            f" COALESCE(CAST(SUM(b.ns) AS BIGINT), -1) AS s_ns FROM"
            f" customer LEFT JOIN"
            f" (SELECT NULLIF(s_nationkey % {m}, {r}) AS k,"
            f" CAST(COUNT(*) AS BIGINT) AS ns FROM supplier{wb}"
            f" GROUP BY 1) b ON c_nationkey = b.k GROUP BY {seg}")

    def interval_shift():
        # date +/- INTERVAL arithmetic: shifted timestamps re-enter the
        # dialect through year()/month() dims or compare against OTHER
        # timestamp columns — no timestamp literal ever crosses engines
        if rng.random() < 0.5:
            t, c = pick([("orders", "o_orderdate"),
                         ("lineitem", "l_shipdate")])
            k = rng.randint(1, 11)
            unit = pick(["MONTH", "DAY"])
            sign = pick(["+", "-"])
            dim = f"year({c} {sign} INTERVAL {k} {unit})"
            where = where_of([t], False, 0, 1)
            return (f"SELECT {dim} AS y, COUNT(*) AS cnt,"
                    f" CAST(SUM({'o_orderkey' if t == 'orders' else 'l_orderkey'}"
                    f" % 97) AS BIGINT) AS s FROM {t}{where} GROUP BY {dim}")
        k = rng.randint(10, 90)
        return (f"SELECT l_returnflag AS flag, COUNT(*) AS cnt,"
                f" CAST(SUM(l_linenumber) AS BIGINT) AS s_ln"
                f" FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
                f" WHERE o_orderdate + INTERVAL {k} DAY < l_shipdate"
                f" GROUP BY l_returnflag")

    def string_edges():
        # string-function surface: substring/upper/length/concat dims,
        # MIN/MAX over strings (binary collation on both engines)
        t, exprs, mcol = pick([
            ("customer",
             [("upper(substring(c_name, 10, 3))", "u_name"),
              ("length(c_name) % 4", "l_name"),
              ("concat(c_mktsegment, '_', CAST(c_nationkey % 3 AS STRING))",
               "seg_nk")], "c_name"),
            ("part",
             [("substring(p_type, 1, 5)", "t5"),
              ("upper(substring(p_name, 1, 2))", "u2"),
              ("length(p_name) % 5", "l5")], "p_name"),
            ("orders",
             [("concat(o_orderstatus, '_', o_orderpriority)", "st_pri"),
              ("substring(o_orderpriority, 1, 1)", "pri1")], "o_orderpriority"),
        ])
        rng.shuffle(exprs)
        dims = exprs[: rng.randint(1, 2)]
        where = where_of([t], False, 0, 1)
        sel = ", ".join([f"{e} AS {n}" for e, n in dims] +
                        ["COUNT(*) AS cnt", f"MIN({mcol}) AS mn",
                         f"MAX({mcol}) AS mx"])
        group = " GROUP BY " + ", ".join(e for e, _ in dims)
        return f"SELECT {sel} FROM {t}{where}{group}"

    def gen_one(i):
        r = rng.random()
        if r < 0.34:
            src, tables, left = pick(sources)
            sql = grouped(src, tables, left)
        elif r < 0.42:
            src, tables, left = pick(sources)
            sql = union_all(src, tables, left)
        elif r < 0.48:
            sql = in_subquery()
        elif r < 0.54:
            sql = exists_subquery()
        elif r < 0.59:
            sql = scalar_subquery()
        elif r < 0.63:
            sql = topk()
        elif r < 0.67:
            sql = window_rank()
        elif r < 0.70:
            sql = window_frame()
        elif r < 0.72:
            sql = window_nulls()
        elif r < 0.77:
            sql = full_outer()
        elif r < 0.81:
            sql = left_nullkey()
        elif r < 0.845:
            sql = grouping_sets()
        elif r < 0.865:
            sql = except_all()
        elif r < 0.89:
            sql = decimal_agg()
        elif r < 0.905:
            sql = interval_shift()
        elif r < 0.93:
            sql = interval_chain()
        elif r < 0.95:
            sql = string_edges()
        elif r < 0.98:
            sql = decimal_grouping_sets()
        else:
            sql = full_outer_decimal()
        return f"fz{i:03d}", sql

    lines = []
    for i in range(n):
        name, sql = gen_one(i)
        assert "\t" not in sql and "\n" not in sql
        lines.append(f"{name}\t{sql}")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[gen-fuzz] wrote {n} queries (seed={seed}) -> {out}")


if __name__ == "__main__":
    main()
