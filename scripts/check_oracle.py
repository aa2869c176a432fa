#!/usr/bin/env python3
"""Local dev mirror of the driver's correctness gate (not part of the
shipped library). Usage:

    python3 scripts/check_oracle.py <sfdir> <verify_outdir> [name ...]

Trailing names declare an intentional subset run (mirroring Verify's
trailing-args subset): only those queries' output dirs may be absent
(reported as "SKIP"). With no trailing names, a missing output dir is a
FAIL — Verify catches per-query Throwables and only logs to stderr, so a
crashed query's ONLY gate-visible signal is its missing dir.

Reads <verify_outdir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfdir>/*.parquet, and compares against the Spark result parquet at
<verify_outdir>/<name>/ — columns sorted by name, rows in produced order,
exact match for non-floats and 1e-9 relative tolerance for floats.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, np.floating):
            return round(float(v), 9)
        if isinstance(v, np.integer):
            return int(v)
    except ImportError:
        pass
    return v


def close(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is None and b is None
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-7, abs_tol=1e-7)
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    subset = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Verify records every per-query crash here (name -> exception); a
    # crashed query must be a NAMED red row with its cause, not an absent
    # dir the reader has to interpret (r9: 40 silent absences).
    import os
    failures = {}
    if os.path.exists(f"{outdir}/failures.json"):
        failures = json.load(open(f"{outdir}/failures.json"))
    # Subset names absent from oracle_sql.json are either no-oracle keys
    # (fine — nothing to compare) or typos; Verify itself fail-fasts on
    # typos against the full query key set, so just report them here.
    unoracled = subset - set(oracle)
    if unoracled:
        print(f"note: subset names with no oracle entry "
              f"(spec-gated keys, nothing to compare): {sorted(unoracled)}")
    n_ok = n_bad = n_skip = 0
    # No-oracle (spec-gated) keys never get a compare row below, so a crash
    # there would otherwise stay invisible to the gate.
    for name in sorted(set(failures) - set(oracle)):
        print(f"FAIL {name}: crashed in Verify: {failures[name]}")
        n_bad += 1
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            ora = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if not os.path.isdir(f"{outdir}/{name}"):
            # Only a declared subset run may legitimately leave dirs absent;
            # otherwise a missing dir means the query crashed inside Verify
            # (which swallows Throwables) and MUST fail the gate. When
            # failures.json recorded the crash, name the cause.
            if subset and name not in subset:
                print(f"SKIP {name} (not in requested subset)")
                n_skip += 1
                continue
            cause = failures.get(
                name, "query crashed in Verify or was never run")
            print(f"FAIL {name}: spark output dir missing ({cause})")
            n_bad += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        oc, gc = sorted(ora.columns), sorted(got.columns)
        if oc != gc:
            print(f"FAIL {name}: columns differ: oracle={oc} spark={gc}")
            n_bad += 1
            continue
        # driver parity: the real gate's pandas sort_values cannot hash
        # array/map/struct cells (TypeError: unhashable numpy.ndarray) — a
        # query emitting them is red there even if the values match here
        nonscalar = [c for c in gc if got[c].map(
            lambda v: isinstance(v, (list, dict))
            or type(v).__name__ == 'ndarray').any()]
        if nonscalar:
            print(f"FAIL {name}: non-scalar result columns {nonscalar} "
                  "(driver comparator cannot hash them)")
            n_bad += 1
            continue
        if len(ora) != len(got):
            print(f"FAIL {name}: rows differ: oracle={len(ora)} "
                  f"spark={len(got)}")
            n_bad += 1
            continue
        ov = ora[oc].values.tolist()
        gv = got[oc].values.tolist()
        bad = None
        for i, (r1, r2) in enumerate(zip(ov, gv)):
            for c, (a, b) in enumerate(zip(r1, r2)):
                # pandas NaN for SQL NULL
                a_null = a is None or (isinstance(a, float) and math.isnan(a))
                b_null = b is None or (isinstance(b, float) and math.isnan(b))
                if a_null and b_null:
                    continue
                if a_null != b_null or not close(a, b):
                    bad = (i, oc[c], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(ora)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {n_skip} skipped")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
