"""Simulate the spark-graft driver: smoke entry() at sf0.001, then run every
queries()[k] at sf0.01 vs oracle_sql()[k] in DuckDB — row count + schema +
order-insensitive value hash.

Round 7 additions (VERDICT r6 §What's wrong 1c/2 — make a red row
diagnosable post-hoc and flakes catchable in the act):
- Session config is env-tunable so tools/flake_harness.py can sweep it:
  SPARK_GRAFT_SIM_CORES (local[N], default 8), SPARK_GRAFT_SIM_PARTS
  (shuffle partitions, default 16), SPARK_GRAFT_SIM_TZ (session
  timezone, default UTC).
- SPARK_GRAFT_SIM_OUT=path writes a JSON artifact with per-key spark +
  oracle value-hashes (and the config), so N runs can be compared.
- SPARK_GRAFT_SIM_LINES=path writes every key's canonical Spark lineset
  (gzip JSON) so a cross-run divergence can be diffed WITHOUT rerunning.
- On any hash mismatch the divergent linesets are PERSISTED to
  DIVERGENCE_{key}.json next to the repo root (not just printed).

Round 9 adds SPARK_GRAFT_SIM_FETCH=pandas: both sides are fetched
through the DATAFRAME path (spark .toPandas() / duckdb .fetchdf())
before canonicalization instead of row lists. Client-side type
conversion is itself a divergence channel — duckdb's HUGEINT (integer
sum()) reaches fetchall() as a plain int but fetchdf() as float64
("150.0" vs "150"), which is the round-9 explanation for the ONLY two
driver-red keys (tests/test_oracle_types.py). This mode keeps the whole
class exercised.
"""
import gzip, json, os, sys, time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from pyspark.sql import SparkSession
from tools.canon import lines_of, norm, vhash  # noqa: F401 — THE canonicalizer (tools/canon.py)
from tools.engineversions import engine_versions

SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
CORES = os.environ.get("SPARK_GRAFT_SIM_CORES", "8")
PARTS = os.environ.get("SPARK_GRAFT_SIM_PARTS", "16")
TZ = os.environ.get("SPARK_GRAFT_SIM_TZ", "UTC")
FETCH = os.environ.get("SPARK_GRAFT_SIM_FETCH", "rows")  # rows | pandas
OUT = os.environ.get("SPARK_GRAFT_SIM_OUT")
LINES_OUT = os.environ.get("SPARK_GRAFT_SIM_LINES")
DIVDIR = os.environ.get("SPARK_GRAFT_SIM_DIVDIR", "/root/repo")
#: keys to run WITHOUT their oracle (rows+hash recorded, no comparison) —
#: for oracles that exceed the sandbox at stress scale (round 10: the
#: neardup shingle×perm expansion spills >79 GB of DuckDB temp at sf1)
ROWS_ONLY = {k.strip() for k in os.environ.get(
    "SPARK_GRAFT_SIM_ROWS_ONLY", "").split(",") if k.strip()}
#: optional DuckDB resource caps, e.g. "memory_limit=48GB,temp=30GB" —
#: an over-budget oracle then fails FAST (caught per-key below) instead
#: of grinding for half an hour and filling the device (round-10 lesson)
DUCK_LIMITS = os.environ.get("SPARK_GRAFT_SIM_DUCK_LIMITS", "")

spark = (SparkSession.builder.appName("driver-sim").master(f"local[{CORES}]")
         .config("spark.sql.shuffle.partitions", PARTS)
         # one JVM runs every registered key back-to-back; the 1g default heap is
         # borderline at sf0.1 (observed: a transient localCheckpoint
         # failure on the alphabetically-late pagerank_suite). Env-tunable
         # for the sf1 full-contract stress (round 10).
         .config("spark.driver.memory",
                 os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM", "8g"))
         .config("spark.sql.session.timeZone", TZ).getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# --- t1 smoke ---
df = E.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): rows={len(rows)} schema={[f.name for f in df.schema.fields]}")
assert len(rows) >= 0

# --- t2 correctness ---
import duckdb
con = duckdb.connect()
if DUCK_LIMITS:
    # fail-soft parsing: a malformed segment must not abort the whole
    # run at t=0 (code-review r10) — warn and continue. The SET itself
    # is wrapped too: a recognized key with a malformed VALUE (e.g.
    # memory_limit=4x8) raises inside con.execute, which would
    # otherwise abort before the first key ran (ADVICE r10)
    for part in DUCK_LIMITS.split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        k, v = k.strip(), v.strip()
        try:
            if k == "memory_limit" and v:
                con.execute(f"SET memory_limit='{v}'")
            elif k == "temp" and v:
                con.execute("SET temp_directory='/tmp/driver_sim_duck'")
                con.execute(f"SET max_temp_directory_size='{v}'")
            else:
                print(f"driver_sim: ignoring malformed DUCK_LIMITS segment "
                      f"{part!r} (want memory_limit=<size> and/or temp=<size>)",
                      file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — warn and run unlimited
            print(f"driver_sim: DUCK_LIMITS segment {part!r} rejected by "
                  f"duckdb ({type(exc).__name__}: {exc}) — continuing "
                  f"without it", file=sys.stderr)
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    # the driver fixtures are single files; Spark-written replicas
    # (tools/stress_contract.py) are directories — glob those
    path = f"{SF}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

def fetch_spark(sdf):
    """(cols, rows) via the configured fetch path."""
    if FETCH == "pandas":
        pdf = sdf.toPandas()
        return list(pdf.columns), [
            tuple(r) for r in pdf.itertuples(index=False, name=None)
        ]
    return sdf.columns, [tuple(r) for r in sdf.collect()]


def fetch_duck(cur):
    """(cols, rows) via the configured fetch path."""
    if FETCH == "pandas":
        pdf = cur.fetchdf()
        return list(pdf.columns), [
            tuple(r) for r in pdf.itertuples(index=False, name=None)
        ]
    return [d[0] for d in cur.description], cur.fetchall()

def divergence_report(name, scols, slines, dlines, limit=5):
    """On hash mismatch: print which variant/rows diverge AND persist
    both divergent linesets to DIVERGENCE_{name}.json so a red driver
    row stays diagnosable after the run (VERDICT r6 §What's wrong 2).
    A rounding-grid boundary tie (cluster.KM_ROUND note) shows one value
    off by exactly one grid step in one variant; a bug shows broad diffs."""
    s, d = set(slines), set(dlines)
    only_s, only_d = sorted(s - d), sorted(d - s)
    vi = next((i for i, c in enumerate(sorted(scols)) if c in ("variant", "algo", "method")), None)
    if vi is not None:
        per = {}
        for side, lines in (("spark", only_s), ("oracle", only_d)):
            for ln in lines:
                v = ln.split("|")[vi]
                per.setdefault(v, [0, 0])[0 if side == "spark" else 1] += 1
        print(f"  {name} divergence by variant: " +
              ", ".join(f"{v}(spark:{a},oracle:{b})" for v, (a, b) in sorted(per.items())))
    for side, lines in (("spark-only", only_s), ("oracle-only", only_d)):
        for ln in lines[:limit]:
            print(f"  {name} {side}: {ln}")
    if len(only_s) > limit or len(only_d) > limit:
        print(f"  {name} … {len(only_s)} spark-only / {len(only_d)} oracle-only rows total")
    path = os.path.join(DIVDIR, f"DIVERGENCE_{name}.json")
    with open(path, "w") as fh:
        json.dump({"key": name, "sf": SF,
                   "config": {"cores": CORES, "parts": PARTS, "tz": TZ, "fetch": FETCH},
                   "sorted_cols": sorted(scols),
                   "spark_only": only_s, "oracle_only": only_d}, fh, indent=1)
    print(f"  {name} divergent linesets persisted to {path}")

qmap, omap = E.queries(), E.oracle_sql()
only = os.environ.get("SPARK_GRAFT_SIM_KEYS")
if only:
    keys = {k.strip() for k in only.split(",")}
    qmap = {k: v for k, v in qmap.items() if k in keys}
results = {}
all_lines = {}
versions = engine_versions(spark)


def _flush_out(res, complete=False):
    """Crash-durable artifact: rewritten after EVERY key, so a mid-run
    crash (an oracle OOM, a killed box) keeps the completed keys' rows
    instead of losing a 45-minute run to an end-only write (round-10
    sf1 stress lesson). ``complete`` flips to True only on the final
    end-of-run write — consumers that must distinguish a finished run
    from a crash-survivor partial (tools/flake_harness.py's crashed-run
    exclusion, tools/stress_contract.py's verdict) key off it
    (code-review r10)."""
    if OUT:
        with open(OUT, "w") as fh:
            json.dump({"sf": SF,
                       "config": {"cores": CORES, "parts": PARTS, "tz": TZ,
                                  "fetch": FETCH},
                       "versions": versions,
                       "complete": complete,
                       "results": res}, fh, indent=1)
for name, fn in sorted(qmap.items()):
    # one failing key must cost only its own row, never the run
    # (the bench.py round-2 lesson, applied to the sim)
    t0 = time.perf_counter()
    try:
        sdf = fn(spark, SF)
        scols, srows = fetch_spark(sdf)
    except Exception as exc:  # noqa: BLE001 — record and move on
        results[name] = {"count_match": False, "err": f"{type(exc).__name__}: {exc}"[:200]}
        print(f"{name}: ERR {results[name]['err']}")
        _flush_out(results)
        continue
    spark_sec = round(time.perf_counter() - t0, 1)
    slines = lines_of(scols, srows)
    if LINES_OUT:
        all_lines[name] = slines
    if name not in omap or name in ROWS_ONLY:
        results[name] = {"mode": "rows-only", "rows": len(srows),
                         "spark_hash": vhash(slines),
                         "spark_sec": spark_sec}
        if name in ROWS_ONLY and name in omap:
            results[name]["mode"] = "rows-only (oracle force-skipped)"
        print(f"{name}: rows-only rows={len(srows)}")
        _flush_out(results)
        continue
    # oracle-side failures are isolated per key too: an oracle that
    # exceeds the sandbox (OOM/temp-disk) must cost only its own row,
    # never the 24 green keys before it (round-10 sf1 stress lesson)
    t0 = time.perf_counter()
    try:
        dcols, drows = fetch_duck(con.execute(omap[name]))
    except Exception as exc:  # noqa: BLE001 — record and move on
        results[name] = {"count_match": False, "rows": len(srows),
                         "spark_hash": vhash(slines),
                         "spark_sec": spark_sec,
                         "err": f"oracle: {type(exc).__name__}: {exc}"[:200]}
        print(f"{name}: ERR {results[name]['err']}")
        _flush_out(results)
        continue
    oracle_sec = round(time.perf_counter() - t0, 1)
    dlines = lines_of(dcols, drows)
    ok_count = len(srows) == len(drows)
    ok_schema = sorted(scols) == sorted(dcols)
    sh, dh = vhash(slines), vhash(dlines)
    ok_hash = sh == dh
    results[name] = {"rows": len(srows), "count_match": ok_count,
                     "schema_match": ok_schema, "hash_match": ok_hash,
                     "spark_hash": sh, "oracle_hash": dh,
                     "spark_sec": spark_sec, "oracle_sec": oracle_sec}
    flag = "OK " if (ok_count and ok_schema and ok_hash) else "FAIL"
    print(f"{name}: {flag} rows={len(srows)}/{len(drows)} schema={ok_schema} hash={sh}=={dh}:{ok_hash}")
    _flush_out(results)
    if ok_schema and not ok_hash:
        divergence_report(name, scols, slines, dlines)

bad = [k for k, v in results.items() if not all(v.get(f, True) for f in ("count_match", "schema_match", "hash_match"))]
print(json.dumps({"failed": bad, "versions": versions}))
_flush_out(results, complete=True)
if LINES_OUT:
    with gzip.open(LINES_OUT, "wt") as fh:
        json.dump(all_lines, fh)
spark.stop()
sys.exit(1 if bad else 0)
