#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, execute each oracle SQL in DuckDB over the same parquet
tables, and compare (rows, schema-ish, values). Dev tool only — not
part of the Spark library."""
import json, subprocess, sys, tempfile
from pathlib import Path

import duckdb
import pandas as pd

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = args[0] if args else "/root/testdata/sf0.01"
OUT = Path(args[1]) if len(args) > 1 else Path(tempfile.mkdtemp(prefix="graft_verify_"))
SKIP_VERIFY = "--no-verify" in sys.argv
# --skip=q1:reason,q2:reason — exclude queries whose ORACLE is
# infeasible at this scale (e.g. the deliberately-ungoverned quadratic
# twin at sf1). Each skip carries an explicit reason; both land in the
# sweep's completeness stamp so a reduced sweep can never masquerade
# as full coverage (VERDICT r13 item 3 — Bench.scala's stamp is the
# template; this is the correctness-sweep twin of it).
SKIP = {}
ONLY = set()
for a in sys.argv[1:]:
    if a.startswith("--skip="):
        for ent in a[len("--skip="):].split(","):
            name, _, reason = ent.partition(":")
            SKIP[name] = reason or "unspecified"
    if a.startswith("--only="):  # restrict the compare to these names
        ONLY.update(a[len("--only="):].split(","))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if not SKIP_VERIFY:
    # forward --only to Verify so a restricted compare also restricts
    # the Spark dump: without this, an --only sweep at sf10 still
    # dumps the FULL surface — including the deliberately-quadratic
    # audit queries whose sf10 run is a documented kill
    extra = (" " + " ".join(sorted(ONLY))) if ONLY else ""
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}{extra}']
    r = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    src = f"{SF_DIR}/{t}.parquet"
    if Path(src).is_dir():  # Spark-written table = a directory of parts
        src = f"{src}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.loads((OUT / "oracle_sql.json").read_text())
fails = 0
compared = []
for name, sql in sorted(oracle.items()):
    if name in SKIP or (ONLY and name not in ONLY):
        if name in SKIP:
            print(f"SKIP {name} ({SKIP[name]})")
        continue
    compared.append(name)
    pdir = OUT / name
    if not pdir.exists():
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    # driver-style compare: sort columns by name, then hash values
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    dtg = {c: str(got[c].dtype) for c in got.columns}
    dtw = {c: str(want[c].dtype) for c in want.columns}
    if dtg != dtw:
        bad = {c: (dtg[c], dtw[c]) for c in dtg if dtg[c] != dtw[c]}
        print(f"FAIL {name}: dtype mismatch {bad}"); fails += 1; continue
    # normalize dtypes for value compare
    g = got.astype(str).reset_index(drop=True)
    w = want.astype(str).reset_index(drop=True)
    if not g.equals(w):
        diff = (g != w).any(axis=1)
        print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first:")
        idx = diff.idxmax()
        print("  spark :", got.iloc[idx].to_dict())
        print("  duckdb:", want.iloc[idx].to_dict())
        fails += 1; continue
    print(f"OK   {name} ({len(got)} rows)")

# Structural-completeness stamp (same invariant Bench.scala enforces
# for its artifacts): compared ∪ skipped must equal the DECLARED query
# surface dumped by Verify. Any gap — a query added after the sweep's
# Verify run, a stale OUT dir, a typo'd skip — stamps complete:false
# with the missing names, so an incomplete sweep can never read as
# full coverage. An --only run is by definition partial and stamps the
# same way. Verify dumps queries.json since round 14; an OUT dir
# without it (pre-r14) falls back to the oracle keys.
qj = OUT / "queries.json"
declared = set(json.loads(qj.read_text())) if qj.exists() else set(oracle)
missing = sorted(declared - set(compared) - set(SKIP))
stamp = {
    "sf": SF_DIR,
    "n_declared": len(declared),
    "n_compared": len(compared),
    "n_failed": fails,
    "skipped": {n: SKIP[n] for n in sorted(SKIP)},
    "complete": not missing,
    "missing": missing,
}
(OUT / "sweep_stamp.json").write_text(json.dumps(stamp, indent=1))
print(f"\nSWEEP_STAMP {json.dumps(stamp)}")
print(f"{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} "
      f"({len(compared)}/{len(declared)} compared, {len(SKIP)} skipped, "
      f"complete={not missing}, sf={SF_DIR}, out={OUT})")
sys.exit(1 if fails else 0)
