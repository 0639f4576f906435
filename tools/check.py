#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and compare rows/schema/values
at the Arrow level (types + exact values).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
(outDir must already contain graft.Verify output.)
"""
import json, os, sys, tempfile
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

# unique auto-named spill dir, removed on interpreter exit — a fixed
# /tmp/duck_spill_{pid} leaked stale spill from crashed runs and could
# collide with a leftover dir after pid reuse
_SPILL = tempfile.TemporaryDirectory(prefix="duck_spill_")

def fresh_con(sf_dir):
    # one connection PER QUERY: at sf1 a single shared connection's
    # buffer pool accumulated across 118 heavy oracles until trivial
    # filters OOM'd (and starved pyarrow's own allocations); a bounded
    # memory_limit + disk spill + reconnect keeps each oracle honest
    con = duckdb.connect()
    con.execute(f"SET memory_limit TO '{os.environ.get('DUCK_MEM', '24GB')}'")
    con.execute(f"SET temp_directory TO '{_SPILL.name}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        con = None
        try:
            con = fresh_con(sf_dir)
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        finally:
            # close on the error path too — releasing the buffer pool is
            # the point of per-query connections; GC is not prompt
            if con is not None:
                con.close()
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}"); n_fail += 1; continue
        cols_e, cols_g = sorted(exp.column_names), sorted(got.column_names)
        if cols_e != cols_g:
            print(f"FAIL {name}: cols spark={cols_g} oracle={cols_e}"); n_fail += 1; continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows spark={got.num_rows} oracle={exp.num_rows}"); n_fail += 1; continue
        bad = []
        for c in cols_e:
            ev, gv = exp.column(c).combine_chunks(), got.column(c).combine_chunks()
            if ev.type != gv.type:
                # driver compares value hashes; flag type drift as a warning-level diff
                try:
                    gv = gv.cast(ev.type)
                    note = f" [type drift: spark={got.column(c).type} oracle={exp.column(c).type}]"
                except Exception:
                    bad.append(f"{c}: type spark={gv.type} oracle={ev.type}"); continue
            else:
                note = ""
            if pa.types.is_list(ev.type) or pa.types.is_large_list(ev.type):
                el, gl = ev.to_pylist(), gv.to_pylist()
                diffl = [a != b for a, b in zip(el, gl)]
                ndiff = sum(diffl)
                if ndiff:
                    i = diffl.index(True)
                    bad.append(f"{c}[row{i}]: spark={gl[i]} oracle={el[i]} ({ndiff} diffs)")
                continue
            neq = pc.fill_null(pc.not_equal(ev, gv), False)
            nullmix = pc.xor(pc.is_null(ev), pc.is_null(gv))
            diff = pc.or_(neq, nullmix)
            ndiff = pc.sum(diff).as_py() or 0
            if ndiff:
                i = diff.to_pylist().index(True)
                bad.append(f"{c}[row{i}]: spark={gv[i]} oracle={ev[i]} ({ndiff} diffs){note}")
            elif note:
                bad.append(f"{c}: OK after cast{note}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:4])); n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} oracled")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
