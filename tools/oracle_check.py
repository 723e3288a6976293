#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf_dir parquet
tables, and compares: row count, sorted column names, and a hash of all
values (rows sorted canonically, columns sorted by name, floats rounded
to 9 significant digits before hashing so both engines' float printing
agrees). Prints PASS/FAIL per query and sample diffs.

Dev tool only — not part of the library (driver has its own comparator).
"""
import json, math, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return repr(round(v, 9 - int(math.floor(math.log10(abs(v)))) - 1)) if abs(v) > 1e-300 else "0"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    crows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in crows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    npass = nfail = nskip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')")
            gcols, grows = [d[0] for d in got.description], got.fetchall()
            gtypes = dict(zip(gcols, [str(t) for t in got.types]))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            nfail += 1
            continue
        try:
            want = con.sql(oracle[name])
            wcols, wrows = [d[0] for d in want.description], want.fetchall()
            wtypes = dict(zip(wcols, [str(t) for t in want.types]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            nfail += 1
            continue
        problems = []
        if sorted(gcols) != sorted(wcols):
            problems.append(f"cols spark={sorted(gcols)} oracle={sorted(wcols)}")
        else:
            tmis = {c: (gtypes[c], wtypes[c]) for c in gcols if gtypes[c] != wtypes[c]}
            if tmis:
                problems.append(f"types {tmis}")
        if len(grows) != len(wrows):
            problems.append(f"rows spark={len(grows)} oracle={len(wrows)}")
        if not problems:
            gh, wh = table_hash(gcols, grows), table_hash(wcols, wrows)
            if gh != wh:
                problems.append(f"hash spark={gh} oracle={wh}")
                order_g = sorted(range(len(gcols)), key=lambda i: gcols[i])
                order_w = sorted(range(len(wcols)), key=lambda i: wcols[i])
                sg = sorted("|".join(canon(r[i]) for i in order_g) for r in grows)
                sw = sorted("|".join(canon(r[i]) for i in order_w) for r in wrows)
                diffs = [(a, b) for a, b in zip(sg, sw) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark : {a[:160]}")
                    print(f"    oracle: {b[:160]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            nfail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            npass += 1
    import os
    noracle = [d for d in os.listdir(out)
               if os.path.isdir(f"{out}/{d}") and d not in oracle]
    for name in sorted(noracle):
        print(f"SKIP {name} (rows-only, no oracle)")
        nskip += 1
    print(f"\n{npass} pass, {nfail} fail, {nskip} rows-only")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
