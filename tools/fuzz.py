#!/usr/bin/env python3
"""Randomized differential fuzzer vs the DuckDB oracle (VERDICT r9
item 2). Rounds 7 and 9 each caught a real cross-engine divergence
only because the fixed testdata happened to hit a boundary; this tool
makes that systematic: per seed, generate random-but-adversarial
customer/supplier/part/documents/embeddings tables (seeded numpy —
reruns are byte-identical), run every dedup_*/text_*/ann_*/enrich_*
query through graft.tools.FuzzVerify (ONE JVM for all seeds), replay
each DuckDB twin on the same parquet, and diff with the driver's
compare (columns sorted by name, dtypes, then stringified values).

Generator design notes (what each ingredient is aimed at):
  - names: ASCII by default; --unicode-names (round 11) adds
    accented/CJK/Greek/Cyrillic company names now that the oracle's
    normalize spells out the Unicode properties (?U)\\w implies
    (graft.oracle.Sql). Each unicode name starts with a UNIQUE
    non-ASCII first character, so every one lands in its own block:
    the F1-F5/K1 normalize chain, blocking, clustering and election
    are graded cross-engine on unicode, while no cross-engine
    Jaro-Winkler compare ever runs on a non-ASCII pair (DuckDB's JW
    is byte-based vs our code-point reference dialect —
    JaroWinklerSpec pins that divergence; unicode names are also
    never near-dup-mutated for the same reason). Within ASCII it
    stacks suffixes to the fixpoint bound, acronym keys, country
    tails, punctuation that normalizes away, case/whitespace variants,
    exact dups, one-char JW near-dups, empty/blank names.
  - documents: duplicate + near-duplicate families (MinHash/SimHash),
    repeated lines (line dedup), PII literals, bullet/symbol-heavy and
    short docs (Gopher rules), empty and whitespace-only texts.
    ASCII by default; --unicode-docs adds accented/CJK docs to probe
    the text twins' dialect surface.
  - embeddings: unit-ish gaussians plus exact duplicates, 1e-6-jitter
    near-dups (cosine boundary adjacency), tiny-norm vectors, and
    exactly-representable component values (k/8) that make cross-
    engine double sums land on representable boundaries.

Usage: tools/fuzz.py [--seeds=N] [--root=DIR] [--unicode-docs]
                     [--unicode-names] [--prefixes=p1,p2] [--no-verify]
Dev tool only — not part of the Spark library.
"""
import json, subprocess, sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

SEEDS = 20
ROOT = Path("/tmp/graft_fuzz")
PREFIXES = "dedup_,text_,ann_,enrich_,events_,stream_"
UNICODE_DOCS = False
UNICODE_NAMES = False
RUN_VERIFY = True
for a in sys.argv[1:]:
    if a.startswith("--seeds="):
        SEEDS = int(a.split("=", 1)[1])
    elif a.startswith("--root="):
        ROOT = Path(a.split("=", 1)[1])
    elif a.startswith("--prefixes="):
        PREFIXES = a.split("=", 1)[1]
    elif a == "--unicode-docs":
        UNICODE_DOCS = True
    elif a == "--unicode-names":
        UNICODE_NAMES = True
    elif a == "--no-verify":
        RUN_VERIFY = False

# ---------------------------------------------------------------- names
BASES = ["ACME", "GLOBAL", "TATA", "APEX", "NOVA", "STELLAR", "UNITED",
         "PACIFIC", "QUANTUM", "VERTEX", "DELTA", "OMEGA", "PIONEER",
         "SUMMIT", "HORIZON", "ZENITH", "ATLAS", "ORION", "MERIDIAN",
         "CASCADE"]
MIDS = ["SOFTWARE", "BANK", "PHARMA", "STORE", "ENGINEERING", "TECH",
        "CAPITAL", "MEDICAL", "MARKET", "SYSTEMS", "TRADING", "LOGISTICS",
        "ENERGY", "FOODS", ""]
# mixed-case spellings of Rules.Suffixes entries (normalize upcases)
SUFFIXES = ["Private Limited", "GmbH & Co KG", "Incorporated", "Pte Ltd",
            "Pvt Ltd", "Limited", "Company", "S R L", "GmbH", "Ltd",
            "LLC", "LLP", "PLC", "Inc", "A/S", "S A", "Co", "Co Pvt Ltd",
            "Co Pvt Ltd Private Limited", ""]
COUNTRIES = ["United Kingdom", "India", "Germany", "Hong Kong", "USA",
             "Japan", "Cote Divoire", ""]
ACRONYMS = ["TCS", "HDFC", "IBM INDIA", "tcs"]
PUNCT_TEMPLATES = ["{}, {}.", "{} & Sons {}", "{}-{}/Intl", "  {}   {}  ",
                   "{} ({}) !!", "{}*{}#"]
WEIRD_NAMES = ["", " ", "...", "!!!", "& - /", "A", "Z" * 120,
               "CO", "LTD", "INDIA", "PRIVATE LIMITED"]
# Unique non-ASCII first char per name -> singleton blocks by
# construction (block key leads with the first character), so the
# normalize chain is fuzzed cross-engine without ever invoking the
# byte-vs-codepoint JW dialect on a unicode pair. Suffix/country
# tails stay space-separated (\b agrees across dialects there;
# NormalizeSpec pins the letter-abutting case).
UNICODE_COMPANY_NAMES = [
    "Café München GmbH",
    "Ñandú Foods Ltd",
    "Ørsted Energi A/S",
    "Çelik Holding Inc",
    "Ålborg Trading Company",
    "Škoda Werke GmbH & Co KG",
    "Él Paso Import/Export SA de CV!",
    "Über Apotheke (Wien) Pvt Ltd",
    "Æther Labs LLC",
    "北京信息技術公司 Limited",
    "東京システム株式会社",
    "서울무역상사 Co",
    "ΣΙΓΜΑ ΤΕΧΝΟΛΟΓΙΑ PLC",
    "Дело и Труд Incorporated India",
    "Ωμέγα Σύστημα, S.A.",
]


def gen_name(rng):
    r = rng.random()
    if UNICODE_NAMES and r < 0.10:
        return rng.choice(UNICODE_COMPANY_NAMES)
    base = rng.choice(BASES)
    mid = rng.choice(MIDS)
    core = f"{base} {mid}".strip()
    if r < 0.06:
        return rng.choice(WEIRD_NAMES)
    if r < 0.12:
        return rng.choice(ACRONYMS)
    if r < 0.25:
        t = rng.choice(PUNCT_TEMPLATES)
        return t.format(core, rng.choice(SUFFIXES) or "Co")
    name = core
    if rng.random() < 0.7:
        suf = rng.choice(SUFFIXES)
        if suf:
            name += " " + suf
    if rng.random() < 0.3:
        ctry = rng.choice(COUNTRIES)
        if ctry:
            name += " " + ctry
    if rng.random() < 0.15:  # case variant
        name = name.lower() if rng.random() < 0.5 else name.title()
    return name


def mutate(rng, name):
    """One-char edit for Jaro-Winkler near-dup pressure."""
    if not name.strip():
        return name + "X"
    i = int(rng.integers(0, len(name)))
    c = chr(ord('A') + int(rng.integers(0, 26)))
    op = rng.random()
    if op < 0.4:
        return name[:i] + c + name[i + 1:]
    if op < 0.7:
        return name[:i] + c + name[i:]
    return name[:i] + name[i + 1:]


def gen_names(rng, n):
    names = []
    while len(names) < n:
        name = gen_name(rng)
        names.append(name)
        r = rng.random()
        if r < 0.15 and len(names) < n:       # exact duplicate
            names.append(name)
        elif r < 0.35 and len(names) < n and name.isascii():
            # near-duplicate; never mutate unicode names (a mutation
            # could drop them into an ASCII block and put a non-ASCII
            # pair in front of both engines' JW — the pinned dialect)
            names.append(mutate(rng, name))
    return names[:n]


# ------------------------------------------------------------ documents
WORDS = ("the quick brown fox jumps over lazy dog machine learning data "
         "pipeline quality filter token language model corpus sample "
         "training text analysis score count word line duplicate near "
         "exact shingle hash band bucket join cluster embedding vector "
         "cosine distance index search approximate neighbor stop and of "
         "to in a is it for on with as by this that").split()
UNICODE_WORDS = ["café", "naïve", "über", "señor",
                 "株式会社", "中文",
                 "café", "élève"]
PII = ["contact john.doe@example.com now", "call 555-123-4567 today",
       "ssn 123-45-6789 on file", "ip 192.168.1.1 logged"]
LANGS = ["en", "de", "fr", "es", "zh"]
SOURCES = [f"src{i}" for i in range(20)]


def gen_doc(rng):
    r = rng.random()
    if r < 0.03:
        return ""
    if r < 0.05:
        return "   "
    nwords = int(rng.integers(3, 120))
    pool = list(WORDS)
    if UNICODE_DOCS and rng.random() < 0.2:
        pool += UNICODE_WORDS
    words = [pool[int(rng.integers(0, len(pool)))] for _ in range(nwords)]
    if rng.random() < 0.1:                      # PII literals
        words.insert(int(rng.integers(0, len(words))), rng.choice(PII))
    if rng.random() < 0.1:                      # bullet/symbol heavy
        words = ["- " + w if i % 3 == 0 else w for i, w in enumerate(words)]
    if rng.random() < 0.08:                     # numbers + symbols
        words += [str(int(rng.integers(0, 10 ** 6))), "$$$", "%%%", "..."]
    text = " ".join(words)
    if rng.random() < 0.15:                     # repeated lines
        line = " ".join(words[:min(8, len(words))])
        text = "\n".join([line, text, line, line])
    if rng.random() < 0.1:
        text = text.upper()
    return text


def gen_documents(rng, n):
    texts = []
    while len(texts) < n:
        t = gen_doc(rng)
        texts.append(t)
        r = rng.random()
        if r < 0.12 and len(texts) < n:        # exact duplicate
            texts.append(t)
        elif r < 0.3 and len(texts) < n and t.strip():  # near-dup family
            words = t.split(" ")
            for _ in range(int(rng.integers(1, 4))):
                if len(texts) >= n:
                    break
                w = list(words)
                i = int(rng.integers(0, len(w)))
                w[i] = rng.choice(WORDS)
                texts.append(" ".join(w))
    texts = texts[:n]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": [LANGS[int(rng.integers(0, len(LANGS)))] for _ in range(n)],
        "source": [SOURCES[int(rng.integers(0, len(SOURCES)))] for _ in range(n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


# --------------------------------------------------------------- events
EVENT_TYPES = ["signup", "view", "click", "purchase", "ping"]
# adversarial props for events_json: missing key, non-numeric k,
# malformed JSON, JSON null, NULL column — Spark's get_json_object +
# cast returns NULL for every one of these; the twin must agree
PROPS_SPECIALS = ['{}', '{"j": 5}', '{"k": "xyz"}', '{"k": null}',
                  'not json', '', None]


def gen_events(rng, n, n_users=40):
    """Events with the boundaries the event-time twins compute on:
    exact hour starts and epoch-week multiples (tumbling/retention
    buckets), .000001/.999999 fractional seconds (floor(epoch)
    truncation), same-(user, ts) ties (lag ordering falls to
    event_id), pairs exactly 1800 s apart (the session-gap and
    range-join `> 1800` / `>= ts - 1800` boundaries), negative k and
    junk props (json bucket), half-even-representable values like
    k + 0.125 (DECIMAL(18,2) cast rounding), negative values, and
    NULL values."""
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span_us = 3 * 86400 * 1_000_000
    ts_us = base_us + rng.integers(0, span_us, size=n)
    r = rng.random(n)
    hour = 3600 * 1_000_000
    # exact hour starts
    ts_us = np.where(r < 0.08, (ts_us // hour) * hour, ts_us)
    # epoch-week multiples (the retention cohort boundary)
    week = 604800 * 1_000_000
    ts_us = np.where((r >= 0.08) & (r < 0.12), (ts_us // week) * week, ts_us)
    # fractional-second extremes around floor(epoch) truncation
    sec = 1_000_000
    ts_us = np.where((r >= 0.12) & (r < 0.16), (ts_us // sec) * sec + 999_999, ts_us)
    ts_us = np.where((r >= 0.16) & (r < 0.20), (ts_us // sec) * sec + 1, ts_us)
    user_id = rng.integers(0, n_users, size=n)
    etype = [EVENT_TYPES[int(rng.integers(0, len(EVENT_TYPES)))]
             for _ in range(n)]
    # per-user funnels need ordered signup -> view -> purchase chains:
    # force the first events of a third of the users into that shape
    for u in range(0, n_users, 3):
        idx = np.where(user_id == u)[0]
        if len(idx) >= 3:
            for j, t in zip(idx[:3], ["signup", "view", "purchase"]):
                etype[j] = t
            order = np.sort(ts_us[idx[:3]])
            ts_us[idx[:3]] = order
    # exact 1800 s gaps: the session twin's `> 1800` and the range
    # join's `>= ts - 1800` both sit ON this boundary
    for i in range(0, n - 1, 37):
        user_id[i + 1] = user_id[i]
        ts_us[i + 1] = ts_us[i] + 1800 * sec
    # same-(user, ts) ties: ordering must fall to event_id in both
    # engines
    for i in range(7, n - 1, 41):
        user_id[i + 1] = user_id[i]
        ts_us[i + 1] = ts_us[i]
    rv = rng.random(n)
    value = rng.integers(-10000, 100000, size=n) / 100.0
    # exactly-representable half-way points: k + 1/8 lands on .125 —
    # a DECIMAL(18,2) rounding boundary both engines must break the
    # same way
    value = np.where(rv < 0.15, rng.integers(-100, 100, size=n) + 0.125, value)
    value = np.where((rv >= 0.15) & (rv < 0.25),
                     rng.integers(-100, 100, size=n) + 0.375, value)
    value = value.astype(object)
    for i in range(11, n, 29):  # NULL values
        value[i] = None
    props = []
    for i in range(n):
        q = rng.random()
        if q < 0.15:
            props.append(PROPS_SPECIALS[int(rng.integers(0, len(PROPS_SPECIALS)))])
        else:
            k = int(rng.integers(-40, 120))  # negative k: floor(k/10) bucket
            props.append('{"k": %d}' % k)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts_us.astype("datetime64[us]"),
        "user_id": user_id.astype(np.int64),
        "event_type": etype,
        "value": value,
        "props": props,
    })


# ----------------------------------------------------------- embeddings
def gen_embeddings(rng, n, dim=64):
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    # exactly-representable grid values: double sums land on boundaries
    grid_rows = rng.choice(n, size=max(1, n // 10), replace=False)
    vecs[grid_rows] = (rng.integers(-8, 9, size=(len(grid_rows), dim))
                       / 8.0).astype(np.float32)
    # exact duplicates + 1e-6 near-dups (cosine ~1 boundary)
    for i in range(0, n - 1, 17):
        vecs[i + 1] = vecs[i]
    for i in range(5, n - 1, 23):
        vecs[i + 1] = vecs[i] + np.float32(1e-6)
    # tiny-norm vector (NOT exactly zero: both engines then divide by a
    # denormal-adjacent norm instead of 0)
    vecs[n - 1] = np.float32(1e-20)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": rng.integers(0, 10, size=n).astype(np.int32),
    })


def gen_seed(seed, out_dir):
    rng = np.random.default_rng(seed * 9973 + 11)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_cust, n_supp, n_part, n_doc, n_emb = 250, 60, 150, 160, 96
    pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": gen_names(rng, n_cust),
        "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
        # boundary-adjacent doubles: k/200 halves land exactly on the
        # round-half grid; a few irrationals for contrast
        "c_acctbal": np.where(rng.random(n_cust) < 0.5,
                              rng.integers(-1000, 200000, size=n_cust) / 200.0,
                              rng.standard_normal(n_cust) * 5000.0),
        "c_mktsegment": [["BUILDING", "MACHINERY", "FURNITURE", "AUTOMOBILE",
                          "HOUSEHOLD"][int(rng.integers(0, 5))]
                         for _ in range(n_cust)],
    }).to_parquet(out_dir / "customer.parquet", index=False)
    pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": gen_names(rng, n_supp),
        "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
        "s_acctbal": rng.integers(-1000, 2000000, size=n_supp) / 200.0,
    }).to_parquet(out_dir / "supplier.parquet", index=False)
    part_names = gen_names(rng, max(20, n_part // 4))  # heavy duplication
    pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [part_names[int(rng.integers(0, len(part_names)))]
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{int(rng.integers(1, 6))}{int(rng.integers(1, 6))}"
                    for _ in range(n_part)],
        "p_type": [["small widget", "large bolt", "blue rod"]
                   [int(rng.integers(0, 3))] for _ in range(n_part)],
        "p_size": rng.integers(1, 51, size=n_part).astype(np.int32),
        "p_retailprice": rng.integers(90000, 200000, size=n_part) / 100.0,
    }).to_parquet(out_dir / "part.parquet", index=False)
    gen_documents(rng, n_doc).to_parquet(out_dir / "documents.parquet",
                                         index=False)
    gen_events(rng, 1200).to_parquet(out_dir / "events.parquet", index=False)
    gen_embeddings(rng, n_emb).to_parquet(out_dir / "embeddings.parquet",
                                          index=False)


# ------------------------------------------------------------- comparison
def compare_seed(seed, oracle):
    """check.py's driver-style compare, restricted to one seed dir."""
    data, out = ROOT / f"seed{seed}" / "data", ROOT / f"seed{seed}" / "out"
    con = duckdb.connect()
    for t in ["customer", "supplier", "part", "documents", "embeddings",
              "events"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{data}/{t}.parquet'")
    fails = []
    for name, sql in sorted(oracle.items()):
        pdir = out / name
        if not pdir.exists():
            fails.append((name, "no spark output")); continue
        try:
            got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            fails.append((name, f"oracle error: {e}")); continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            fails.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            continue
        if len(got) != len(want):
            fails.append((name, f"rows {len(got)} != {len(want)}")); continue
        dtg = {c: str(got[c].dtype) for c in got.columns}
        dtw = {c: str(want[c].dtype) for c in want.columns}
        if dtg != dtw:
            bad = {c: (dtg[c], dtw[c]) for c in dtg if dtg[c] != dtw[c]}
            fails.append((name, f"dtype mismatch {bad}")); continue
        g = got.astype(str).reset_index(drop=True)
        w = want.astype(str).reset_index(drop=True)
        if not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff.idxmax()
            fails.append((name, f"{int(diff.sum())}/{len(g)} rows differ; "
                          f"spark={got.iloc[idx].to_dict()} "
                          f"duckdb={want.iloc[idx].to_dict()}"))
    con.close()
    return fails


def main():
    print(f"[fuzz] generating {SEEDS} seed datasets under {ROOT} "
          f"(unicode_docs={UNICODE_DOCS}, unicode_names={UNICODE_NAMES})")
    for s in range(SEEDS):
        gen_seed(s, ROOT / f"seed{s}" / "data")
    if RUN_VERIFY:
        cmd = ["sbt", "-batch",
               f"runMain graft.tools.FuzzVerify {ROOT} {SEEDS} {PREFIXES}"]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=str(Path(__file__).resolve().parent.parent))
        for line in (r.stdout + r.stderr).splitlines():
            if "[fuzz]" in line:
                print(line)
        if r.returncode != 0 and not (ROOT / "oracle_sql.json").exists():
            # total failure (compile error etc.) — nothing to compare
            print(r.stdout[-4000:]); print(r.stderr[-4000:])
            sys.exit(1)
        # per-query Spark failures surface below as "no spark output"
        # for their seed — keep going so ONE run reports every
        # divergence, not just the first
    oracle = json.loads((ROOT / "oracle_sql.json").read_text())
    total_fails = 0
    for s in range(SEEDS):
        fails = compare_seed(s, oracle)
        status = "GREEN" if not fails else f"{len(fails)} FAIL"
        print(f"seed{s}: {status} ({len(oracle)} queries)")
        for name, why in fails:
            print(f"  FAIL {name}: {why[:500]}")
        total_fails += len(fails)
    print(f"\n{'ALL GREEN' if total_fails == 0 else f'{total_fails} FAILURES'}"
          f" ({SEEDS} seeds x {len(oracle)} queries)")
    sys.exit(1 if total_fails else 0)


if __name__ == "__main__":
    main()
