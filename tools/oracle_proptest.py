#!/usr/bin/env python3
"""Property check of the p12 ORACLE's placement CTEs on a non-trivial
corpus.

The gate corpora are near-dup saturated, so the p12 gate row exercises
the oracle's placement arithmetic (bshard / iplace / placedrows CTEs)
on ~one placed doc — a subtle SQL bug there could coincidentally match.
The Spark side is pinned by Round19OpsSpec's planted + property trials
against a plain-Scala model; this script closes the triangle by
checking DuckDB(p12Sql) against the SAME independent model (python
hashlib md5 + integer arithmetic) on seeded random novel-token corpora
with variable token counts.

Usage: python3 tools/oracle_proptest.py <oracle_sql.json>
       (the file Verify dumps, e.g. /tmp/graft_verify/oracle_sql.json)
Prints one OK/FAIL line per trial; exits non-zero on any FAIL.
"""
import sys, json, hashlib, random
import duckdb
import pandas as pd

MOD, REM, TOMB = 10, 7, 3
SHARDS, PACK = 8, 512


def md5hex(s):
    return hashlib.md5(s.encode()).hexdigest()


def hm(i):
    return int(md5hex(f"mix:{i}")[:15], 16) % 1000000


def eh(i):
    return int(md5hex(f"epoch0:{i}")[:15], 16)


def model(ids, ntok, nsrc):
    src = lambda i: f"s{i % nsrc}"
    live = [i for i in ids if i % MOD != TOMB]
    arrivals = [i for i in live if i % MOD == REM]
    base = [i for i in live if i % MOD != REM]
    srctok = {}
    for i in base:
        srctok[src(i)] = srctok.get(src(i), 0) + ntok[i]
    alltok = sum(srctok.values())

    def keep(i):
        return hm(i) * 2 * len(srctok) * srctok[src(i)] < alltok * 1000000

    bysh = {}
    for i in base:
        if keep(i):
            d, t = bysh.get(eh(i) % SHARDS, (0, 0))
            bysh[eh(i) % SHARDS] = (d + 1, t + ntok[i])
    rows, report = set(), {}
    for s_ in sorted({src(i) for i in arrivals}):
        report[s_] = [0, 0, 0, 0, 0, 0]  # arr, adm, placed, tok, pos, bin
    for i in arrivals:
        report[src(i)][0] += 1
        report[src(i)][1] += 1  # novel corpus: everything admits
    inc = {}
    for i in arrivals:
        if keep(i):
            inc.setdefault(eh(i) % SHARDS, []).append(i)
    for sh, g in inc.items():
        bd, bt = bysh.get(sh, (0, 0))
        start = bt
        for k, i in enumerate(sorted(g, key=lambda x: (eh(x), x))):
            rows.add((sh, bd + k + 1, start // PACK, start % PACK, i))
            r = report[src(i)]
            r[2] += 1
            r[3] += ntok[i]
            r[4] += bd + k + 1
            r[5] += start // PACK
            start += ntok[i]
    rep = [(s_,) + tuple(v) for s_, v in sorted(report.items())]
    return rows, rep


def main():
    sql = json.load(open(sys.argv[1]))["p12_incremental_build"]
    ok = True
    for trial in (1, 2, 3):
        rnd = random.Random(8800 + trial)
        n = 250 + rnd.randrange(250)
        nsrc = 2 + rnd.randrange(3)
        ids = list(range(100, 100 + n))
        ntok = {i: 15 + rnd.randrange(26) for i in ids}
        docs = pd.DataFrame({
            "doc_id": ids,
            "text": [" ".join(f"o{trial}d{i}t{j}" for j in range(ntok[i]))
                     for i in ids],
            "source": [f"s{i % nsrc}" for i in ids],
        })
        _, exp_rep = model(ids, ntok, nsrc)
        con = duckdb.connect()
        con.register("documents", docs)
        got = [tuple(r) for r in con.execute(sql).fetchall()]
        want = [tuple(r) for r in exp_rep]
        if got == want:
            print(f"OK   trial {trial} (n={n}, nsrc={nsrc}): "
                  f"{sum(r[3] for r in want)} placed docs match the model")
        else:
            ok = False
            print(f"FAIL trial {trial}: oracle={got[:4]}... model={want[:4]}...")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
