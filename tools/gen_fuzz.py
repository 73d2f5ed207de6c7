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
  with COUNT(col), avoiding engine-specific null-group dtype coercion.

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
            return f"{c} % {k} {pick(['=', '<>', '<'])} {rng.randrange(k)}"
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

    def gen_one(i):
        r = rng.random()
        if r < 0.55:
            src, tables, left = pick(sources)
            sql = grouped(src, tables, left)
        elif r < 0.65:
            src, tables, left = pick(sources)
            sql = union_all(src, tables, left)
        elif r < 0.73:
            sql = in_subquery()
        elif r < 0.81:
            sql = exists_subquery()
        elif r < 0.87:
            sql = scalar_subquery()
        elif r < 0.94:
            sql = topk()
        else:
            sql = window_rank()
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
