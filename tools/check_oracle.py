#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sf_dir> <verify_out_dir>

Registers each parquet table as a DuckDB view, runs every oracle_sql.json
entry, loads the corresponding Spark result parquet, sorts columns by name
and rows by all columns, and compares values (exact for ints/strings,
bit-exact for floats unless GRAFT_TOL is set).
"""
import json, sys, glob, math, os
import duckdb
import pandas as pd

TOL = float(os.environ.get("GRAFT_TOL", "0"))
sf_dir, out_dir = sys.argv[1], sys.argv[2]
def fresh_connection():
    con = duckdb.connect()
    # experiment knobs for scale-sidecar debugging. Measured on the
    # sf10 dedup oracles: DEFAULT settings are the right production
    # call — preserve_insertion_order=false counterintuitively made
    # the MATERIALIZED-CTE oracles OOM (same query green on defaults,
    # red with no_order, reproducibly), and thread reduction didn't
    # help; what actually bounded memory was materializing shared CTEs
    # in the SQL itself (see SparkEntry.collapsedDocPairsCtes).
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"PRAGMA threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if os.environ.get("GRAFT_DUCKDB_NO_ORDER"):
        con.execute("SET preserve_insertion_order=false")
    if os.environ.get("GRAFT_DUCKDB_TMP"):
        # in-memory connections have NO temp_directory, which DISABLES
        # out-of-core spilling entirely — every blocking operator must
        # fit under memory_limit (~80% RAM). The sf10 dedup oracles sit
        # right at that edge and fail nondeterministically; pointing
        # temp at disk turns those OOMs into spills.
        con.execute(
            f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        # scale-sidecar dirs (e.g. /tmp/sf10) may carry only the
        # non-TPC-H tables; a query against a missing view then fails
        # per-query instead of killing the whole compare
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except duckdb.IOException:
            pass
    return con


con = fresh_connection()

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
# CORRECTNESS-style JSON sidecar (same shape as the driver's artifact)
results = {}


def record(name, **kw):
    base = dict(rows_match=None, schema_match=None, hash_match=None,
                spark_rows=None, oracle_rows=None, err=None)
    base.update(kw)
    results[name] = base


# GRAFT_HASH_MODE=1: the scale-sidecar compare — NO pandas
# materialization of either side. Both the oracle result and the Spark
# parquet dump are hashed INSIDE DuckDB (count + sum of per-row
# hash(...) over name-sorted columns, a commutative aggregate => order
# independent, constant memory), so a 100M-row result verifies without
# the 2 GB coalesce(1) dump or a 100M-row DataFrame in RAM. Hashing
# both sides in ONE engine sidesteps cross-engine hash compatibility;
# TIMESTAMP columns are canonicalized to epoch micros first (parquet
# TZ adjustment would otherwise flip the type), mirroring the normal
# mode's datetime→int64 normalization. Bit-exact contract only (no
# GRAFT_TOL support): every oracle in this repo is exact-arithmetic.
HASH_MODE = bool(os.environ.get("GRAFT_HASH_MODE"))


def hash_compare(con, name, oracle_sql):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        record(name, err="no spark output")
        return False
    got_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"

    def desc(sql):
        rows = con.execute(f"DESCRIBE ({sql})").fetchall()
        return {r[0]: r[1] for r in rows}

    def canon_type(t):
        return "BIGINT" if t.upper().startswith("TIMESTAMP") else t

    exp_d, got_d = desc(oracle_sql), desc(got_sql)
    if sorted(exp_d) != sorted(got_d):
        print(f"FAIL {name}: columns exp={sorted(exp_d)} got={sorted(got_d)}")
        record(name, schema_match=False, err="columns")
        return False
    dt_bad = [c for c in exp_d
              if canon_type(exp_d[c]) != canon_type(got_d[c])]
    if dt_bad:
        print(f"FAIL {name}: dtype mismatch " + ", ".join(
            f"{c}: exp={exp_d[c]} got={got_d[c]}" for c in dt_bad))
        record(name, schema_match=False, err="dtype")
        return False
    cols = sorted(exp_d)

    def agg(sql, d):
        exprs = ", ".join(
            f'epoch_us("{c}")' if d[c].upper().startswith("TIMESTAMP")
            else f'"{c}"' for c in cols)
        return con.execute(
            f"SELECT count(*), sum(CAST(hash({exprs}) AS HUGEINT)) "
            f"FROM ({sql})").fetchone()

    en, eh = agg(oracle_sql, exp_d)
    gn, gh = agg(got_sql, got_d)
    if en != gn:
        print(f"FAIL {name}: rows exp={en} got={gn}")
        record(name, rows_match=False, schema_match=True,
               spark_rows=gn, oracle_rows=en, err="rows")
        return False
    if eh != gh:
        print(f"FAIL {name}: multiset hash exp={eh} got={gh}")
        record(name, rows_match=True, schema_match=True,
               hash_match=False, spark_rows=gn, oracle_rows=en,
               err="mismatch")
        return False
    print(f"PASS {name} ({en} rows, hash-mode)")
    record(name, rows_match=True, schema_match=True, hash_match=True,
           spark_rows=gn, oracle_rows=en)
    return True


def failure_manifest(name):
    """Verify writes <name>_FAILED.json when a query THROWS — turning
    what used to be a silent missing-dump absentee into an `err` row
    carrying the exception text."""
    p = f"{out_dir}/{name}_FAILED.json"
    if os.path.exists(p):
        try:
            return json.load(open(p)).get("error", "failed (no detail)")
        except Exception:
            return "failed (unreadable manifest)"
    return None


for name in sorted(oracle):
    try:
        mf = failure_manifest(name)
        if mf:
            print(f"FAIL {name}: query failed in Verify: {mf}")
            record(name, err=f"verify_failed: {mf}")
            n_fail += 1
            continue
        # a long sidecar run accumulates buffer-pool state across the
        # heavy MATERIALIZED-CTE oracles until later queries hit the
        # memory limit (witnessed: split_leakage OOM in sequence, green
        # solo) — a fresh connection per query keeps runs independent
        if os.environ.get("GRAFT_DUCKDB_FRESH_CON"):
            con.close()
            con = fresh_connection()
        if HASH_MODE:
            if hash_compare(con, name, oracle[name]):
                n_pass += 1
            else:
                n_fail += 1
            continue
        exp = con.execute(oracle[name]).df()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        def norm(df):
            df = df.reindex(sorted(df.columns), axis=1)
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = pd.to_datetime(df[c]).astype("int64")
                if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes, bytearray)):
                    df[c] = df[c].apply(lambda b: b.hex())
            df = df.sort_values(by=list(df.columns), ignore_index=True)
            return df
        exp, got = norm(exp), norm(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1; continue
        dt_bad = [c for c in exp.columns if str(exp[c].dtype) != str(got[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch " +
                  ", ".join(f"{c}: exp={exp[c].dtype} got={got[c].dtype}" for c in dt_bad))
            n_fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); n_fail += 1; continue
        # vectorized equality first (the python loop on a 10M-row sf10
        # dump takes minutes per query); fall back to the elementwise
        # loop ONLY on mismatch, purely to report the offending cell —
        # semantics identical: exact equality, NaN==NaN passes, TOL
        # applies to float pairs
        def col_equal(e_s, g_s):
            if str(e_s.dtype).startswith("float"):
                both_nan = e_s.isna() & g_s.isna()
                if TOL:
                    close = (e_s - g_s).abs() <= TOL
                    return bool((both_nan | (e_s == g_s) | close).all())
                return bool((both_nan | (e_s == g_s)).all())
            both_na = e_s.isna() & g_s.isna()
            return bool((both_na | (e_s == g_s)).all())
        ok = True
        for c in exp.columns:
            try:
                fast_eq = col_equal(exp[c], got[c])
            except Exception:
                fast_eq = False  # non-scalar cells: let the loop decide
            if fast_eq:
                continue
            e, g = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(e, g)):
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if a != b and not abs(a - b) <= TOL:
                        print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r} (diff {a-b:.3e})")
                        ok = False; break
                elif (pd.isna(a) and pd.isna(b)):
                    continue
                elif a != b:
                    print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r}")
                    ok = False; break
            if not ok:
                break
        if ok:
            print(f"PASS {name} ({len(exp)} rows)"); n_pass += 1
            record(name, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=len(got),
                   oracle_rows=len(exp))
        else:
            n_fail += 1
            record(name, rows_match=len(exp) == len(got),
                   schema_match=list(exp.columns) == list(got.columns),
                   hash_match=False, spark_rows=len(got),
                   oracle_rows=len(exp), err="mismatch")
    except Exception as ex:
        print(f"FAIL {name}: {type(ex).__name__}: {ex}"); n_fail += 1
        record(name, err=f"{type(ex).__name__}: {ex}")

# queries dumped by Verify but carrying no SQL oracle (sketch family):
# rows-only accounting, the driver's `no_oracle` convention
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in results:
        continue
    try:
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else None
        record(name, spark_rows=n, err="no_oracle")
    except Exception as ex:
        record(name, err=f"{type(ex).__name__}: {ex}")

# failed queries with no oracle entry (sketch family that threw): the
# manifest is the only trace — surface it rather than dropping the row
for p in sorted(glob.glob(f"{out_dir}/*_FAILED.json")):
    name = os.path.basename(p)[: -len("_FAILED.json")]
    if name not in results:
        mf = failure_manifest(name)
        print(f"FAIL {name}: query failed in Verify: {mf}")
        record(name, err=f"verify_failed: {mf}")
        n_fail += 1

json_out = os.environ.get("GRAFT_JSON_OUT")
if json_out:
    with open(json_out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {json_out} ({len(results)} queries)")
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
