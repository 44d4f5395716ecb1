"""Cross-check a graft.Verify dump against its DuckDB oracle SQL — a
local pre-flight of the compare the round driver performs (sorted
columns, sorted rows, float tolerance instead of the driver's hash).
Verification tooling only (python duckdb/pandas), not part of the
library.

Usage: python3 bin/duck_check.py <verify-out-dir> <sf-dir> [q1,q2,...]
e.g.:  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v"
       python3 bin/duck_check.py /tmp/v /root/testdata/sf0.01"""
import duckdb, json, os, sys
import pandas as pd

d = sys.argv[1]
sf = sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
sql = json.load(open(os.path.join(d, 'oracle_sql.json')))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
bad = 0
for name, q in sorted(sql.items()):
    if only and name not in only:
        continue
    try:
        o = con.execute(q).df()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); bad += 1; continue
    s = pd.read_parquet(os.path.join(d, name))
    o = o[sorted(o.columns)]; s = s[sorted(s.columns)]
    if list(o.columns) != list(s.columns):
        print(f'{name}: SCHEMA {list(s.columns)} vs {list(o.columns)}'); bad += 1; continue
    ks = list(o.columns)
    o2 = o.sort_values(ks).reset_index(drop=True)
    s2 = s.sort_values(ks).reset_index(drop=True)
    if len(o2) != len(s2):
        print(f'{name}: ROWS spark={len(s2)} oracle={len(o2)}'); bad += 1; continue
    try:
        s2 = s2.astype(o2.dtypes.to_dict())
    except Exception:
        pass
    diff = 0
    for c in ks:
        a, b = s2[c], o2[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            import numpy as np
            m = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9) |
                  (a.isna() & b.isna()))
        else:
            m = (a != b) & ~(a.isna() & b.isna())
        diff += int(m.sum())
    if diff:
        print(f'{name}: {diff} differing cells'); bad += 1
    else:
        print(f'{name}: OK rows={len(s2)}')
print('mismatches:', bad)
