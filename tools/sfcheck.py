#!/usr/bin/env python3
"""Validate the standing SfGen sf1 fixture against its MANIFEST.json:
the per-base-table content md5 (stale fixture after a driver testdata
regeneration) and the per-scaled-table row count from parquet metadata
(corrupt/truncated fixture). Harness-side twin of SfGen's JVM check.

Usage: python3 tools/sfcheck.py [baseDir=/root/testdata/sf0.1] [fixtureDir=/tmp/graft_sf1] [--factor N]
--factor N additionally asserts the fixture was built at scale factor N
(ADVICE r9: without it a ×10 tree silently satisfies a ×30 run).
Exit 0 = fixture is current and whole; exit 1 = stale/corrupt (message says why).
"""
import hashlib, json, os, sys
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def md5_file(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    argv = sys.argv[1:]
    want_factor = None
    if "--factor" in argv:
        i = argv.index("--factor")
        if i + 1 >= len(argv):
            sys.exit("FAIL: --factor requires an integer operand "
                     "(usage: --factor N)")
        try:
            want_factor = int(argv[i + 1])
        except ValueError:
            sys.exit(f"FAIL: --factor operand {argv[i + 1]!r} is not an "
                     f"integer (usage: --factor N)")
        argv = argv[:i] + argv[i + 2:]
    base = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    fix = argv[1] if len(argv) > 1 else "/tmp/graft_sf1"
    mf_path = os.path.join(fix, "MANIFEST.json")
    if not os.path.exists(os.path.join(fix, "_SUCCESS")):
        sys.exit(f"FAIL: {fix} has no _SUCCESS (unbuilt or partial)")
    if not os.path.exists(mf_path):
        sys.exit(f"FAIL: {fix} has no MANIFEST.json (predates the guard) - rebuild")
    mf = json.load(open(mf_path))
    if want_factor is not None and mf.get("factor") != want_factor:
        sys.exit(f"FAIL: fixture built at factor {mf.get('factor')}, "
                 f"this run requests factor {want_factor} - delete {fix} and rebuild")
    for t in TABLES:
        ent = mf["tables"].get(t)
        if ent is None:
            sys.exit(f"FAIL: {t} missing from manifest")
        bp = os.path.join(base, f"{t}.parquet")
        if not os.path.exists(bp):
            sys.exit(f"FAIL: base {bp} is gone")
        got = md5_file(bp)
        if got != ent["base_md5"]:
            sys.exit(f"FAIL: base {t}.parquet changed since fixture build "
                     f"(driver testdata regenerated?) - delete {fix} and rebuild")
        fp = os.path.join(fix, f"{t}.parquet")
        if not os.path.exists(fp):
            sys.exit(f"FAIL: scaled {fp} missing")
        try:
            rows = pq.ParquetFile(fp).metadata.num_rows
        except Exception as e:  # truncated/garbled footer: loud, named, no traceback
            sys.exit(f"FAIL: scaled {t}.parquet unreadable ({e}) - corrupt fixture")
        if rows != ent["scaled_rows"]:
            sys.exit(f"FAIL: scaled {t}.parquet has {rows} rows, "
                     f"manifest says {ent['scaled_rows']} (corrupt fixture)")
    print(f"OK: {fix} is current vs {base} "
          f"(factor {mf['factor']}, {len(TABLES)} tables)")


if __name__ == "__main__":
    main()
