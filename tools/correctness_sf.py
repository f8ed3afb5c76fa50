#!/usr/bin/env python3
"""Driver-scale correctness artifact generator.

Runs the SAME code path the round driver runs — `graft.Verify` dumps every
`SparkEntry.queries` result to parquet plus `oracle_sql.json` — then executes
each oracle in DuckDB over the same scale-factor tables and emits a
per-query {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err} JSON in the driver's CORRECTNESS format.

Usage:
  python3 tools/correctness_sf.py <sf_dir> <out_json> [verify_out_dir] \
      [--exclude exclusions.json]

--exclude: JSON mapping query name -> reason. Excluded queries are
skipped on BOTH sides (Verify via SPARK_GRAFT_VERIFY_EXCLUDE, DuckDB
here) and recorded in the artifact as {"excluded": true, "reason": ...}
so the exclusion list is part of the evidence, not a silent hole.

One-line regeneration of the committed sf0.1 artifact:
  python3 tools/correctness_sf.py /root/testdata/sf0.1 CORRECTNESS_sf01_r10.json

If <verify_out_dir> is omitted a fresh `sbt runMain graft.Verify` is driven
into a temp dir first (slow half); pass an existing dump to re-check only.

Match semantics mirror the driver: columns sorted by name, rows sorted by
all columns, dtype KIND strict (int vs float is a fail), and the value hash
is sha256 over a canonical text rendering — floats quantized at 1e-9
absolute (the driver's comparison tolerance) so an engine-noise ulp does
not flip the hash while any real drift does.
"""
import json, sys, glob, os, hashlib, subprocess, tempfile

import duckdb
import numpy as np
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        # Sort by non-float (key) columns FIRST, then by 1e-9-quantized,
        # signed-zero-normalized floats as tie-breakers: raw-float sort
        # keys could order tie rows differently across engines when a
        # value differs inside the tolerance, misaligning the
        # element-wise compare.
        key = df.copy()
        for c in key.columns:
            if key[c].dtype.kind == "f":
                key[c] = np.round(key[c].to_numpy(), 9) + 0.0
        cols = sorted(df.columns,
                      key=lambda c: (df[c].dtype.kind == "f", c))
        order = key.sort_values(by=cols).index
        df = df.loc[order].reset_index(drop=True)
    return df


def canon_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(df.columns)).encode())
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            # quantize at the driver's 1e-9 comparison tolerance;
            # `+ 0.0` collapses IEEE -0.0 to +0.0 (numerically equal,
            # but "%.9f" would render the sign)
            vals = np.where(np.isnan(col.to_numpy()), None,
                            np.round(col.to_numpy(), 9) + 0.0)
            rend = ["NaN" if v is None else ("%.9f" % v) for v in vals]
        else:
            rend = [repr(v) for v in col.astype(str).to_numpy()]
        h.update(("\x1f".join(rend)).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def values_close(got: pd.DataFrame, want: pd.DataFrame) -> bool:
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            ga, wa = g.to_numpy(), w.to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            if (~both_nan & ~np.isclose(ga, wa, atol=1e-9, rtol=0)).any():
                return False
        else:
            if (g.astype(str).to_numpy() != w.astype(str).to_numpy()).any():
                return False
    return True


def main() -> None:
    args = list(sys.argv[1:])
    excluded = {}
    if "--exclude" in args:
        i = args.index("--exclude")
        with open(args[i + 1]) as f:
            excluded = json.load(f)
        del args[i:i + 2]
    sf_dir, out_json = args[0], args[1]
    verify_out = args[2] if len(args) > 2 else None
    if verify_out is None:
        verify_out = tempfile.mkdtemp(prefix="verify_sf_")
        cmd = ["sbt", "-batch",
               f"runMain graft.Verify {sf_dir} {verify_out}"]
        print("+ " + " ".join(cmd), file=sys.stderr)
        env = dict(os.environ)
        if excluded:
            env["SPARK_GRAFT_VERIFY_EXCLUDE"] = ",".join(sorted(excluded))
        subprocess.run(cmd, check=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

    with open(os.path.join(verify_out, "oracle_sql.json")) as f:
        oracles = json.load(f)

    report = {}
    nfail = 0
    for name in sorted(oracles):
        if name in excluded:
            report[name] = {"excluded": True, "reason": excluded[name]}
            continue
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "values_match": False,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            outp = os.path.join(verify_out, name)
            got = norm(
                con.execute(f"SELECT * FROM '{outp}/*.parquet'").df()
                if os.path.isdir(outp) else pd.read_parquet(outp))
            want = norm(con.execute(oracles[name]).df())
            entry["spark_rows"] = int(len(got))
            entry["oracle_rows"] = int(len(want))
            entry["rows_match"] = len(got) == len(want)
            entry["schema_match"] = (
                list(got.columns) == list(want.columns)
                and all(got[c].dtype.kind == want[c].dtype.kind
                        for c in got.columns))
            if entry["rows_match"] and entry["schema_match"]:
                # hash_match means exactly what it says (quantized sha256
                # equality); values_match is the element-wise 1e-9
                # comparison — the driver-equivalent acceptance — kept
                # SEPARATE so artifact diffs are not misled by a float
                # straddling a quantization boundary
                entry["hash_match"] = canon_hash(got) == canon_hash(want)
                entry["values_match"] = (
                    entry["hash_match"] or values_close(got, want))
        except Exception as e:  # noqa: BLE001 — recorded per-query
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        if not (entry["rows_match"] and entry["schema_match"]
                and entry.get("values_match")):
            nfail += 1
            print(f"FAIL {name}: {entry}", file=sys.stderr)
        report[name] = entry

    with open(out_json, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    nexcl = sum(1 for v in report.values() if v.get("excluded"))
    npass = len(report) - nfail - nexcl
    print(f"wrote {out_json}: PASS {npass}  FAIL {nfail}  "
          f"EXCLUDED {nexcl}  of {len(report)} at {sf_dir}")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
