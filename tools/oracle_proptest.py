#!/usr/bin/env python3
"""Property check of the p12 AND p11/p13 ORACLES' CTE chains on
non-trivial corpora.

The gate corpora are near-dup saturated, so the p12 gate row exercises
the oracle's placement arithmetic (bshard / iplace / placedrows CTEs)
on ~one placed doc — a subtle SQL bug there could coincidentally match.
The Spark side is pinned by Round19OpsSpec's planted + property trials
against a plain-Scala model; this script closes the triangle by
checking DuckDB(p12Sql) against the SAME independent model (python
hashlib md5 + integer arithmetic) on seeded random novel-token corpora
with variable token counts.

Round 20 adds the p11/p13 leg (the round-19 verdict's item 6): the full
clean -> redact -> simhash-CC canonical keep -> shingle decontamination
-> mix -> shard/pack chain, re-modelled independently (python md5 +
union-find + integer arithmetic) on corpora that PLANT every branch —
duplicate clusters (exact + near), an unclean canonical shadowing its
clean copies, bench-shingle contamination, redactable PII tokens, and
short/low-uniqueness rejects. p13 is graded on the same corpus as
p11-minus-takedown re-ranked (excision semantics).

Usage: python3 tools/oracle_proptest.py <oracle_sql.json>
       (the file Verify dumps, e.g. /tmp/graft_verify/oracle_sql.json)
Prints one OK/FAIL line per trial; exits non-zero on any FAIL.
"""
import sys, json, hashlib, random
import duckdb
import pandas as pd

MOD, REM, TOMB = 10, 7, 3
TAKEDOWN = 1  # Pipeline.TakedownRem (5 collided with d20's Append2Rem)
SHARDS, PACK = 8, 512
BENCH_IDS = 20       # doc_id < 20 = benchmark docs (decon side)
SIMHASH_BITS = 60
HAMMING_MAX = 6
SHINGLE = 3


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


# ---- p11/p13 independent model ----------------------------------------


def simhash(text):
    toks = sorted(set(text.split(" ")))
    votes = [0] * SIMHASH_BITS
    for w in toks:
        h = int(md5hex(w)[:15], 16)
        for j in range(SIMHASH_BITS):
            votes[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(SIMHASH_BITS) if votes[j] >= 0)


def redact(tok):
    import re
    if re.match(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$", tok):
        return "<EMAIL>"
    low = tok.lower()
    if low.startswith(("http://", "https://", "www.")):
        return "<URL>"
    if re.match(r"^[0-9]{4,}$", tok):
        return "<NUM>"
    return tok


def p11_model(docs, takedown_rem=None):
    """docs: {doc_id: (text, source)} -> p11Sql's placed rows.
    takedown_rem: if set, exclude doc_id % MOD == takedown_rem at the
    placement stage (p13's excision)."""
    live = {i: v for i, v in docs.items() if i % MOD != TOMB}
    # simhash CC over livedocs
    fp = {i: simhash(t) for i, (t, _) in live.items()}
    ids = sorted(live)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in ids:
        for b in ids:
            if a < b and bin(fp[a] ^ fp[b]).count("1") <= HAMMING_MAX:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for i in ids:
        clusters.setdefault(find(i), []).append(i)
    ntok = {i: len(live[i][0].split(" ")) for i in ids}
    canon = set()
    for members in clusters.values():
        canon.add(sorted(members, key=lambda i: (-ntok[i], i))[0])
    # clean + keep
    red = {i: [redact(tk) for tk in live[i][0].split(" ")] for i in ids}

    def uniq_ratio(i):
        toks = live[i][0].split(" ")
        return len(set(toks)) / len(toks)

    kept = [i for i in ids
            if ntok[i] >= 15 and uniq_ratio(i) >= 0.3 and i >= BENCH_IDS
            and i in canon]
    # decontamination on redacted shingles vs the bench side
    def shingles(i):
        r = red[i]
        return {" ".join(r[k:k + SHINGLE]) for k in range(len(r) - SHINGLE + 1)}

    bench = set()
    for i in ids:
        if i < BENCH_IDS and len(red[i]) >= SHINGLE:
            bench |= shingles(i)
    decon = [i for i in kept if not (shingles(i) & bench)]
    # mixing at the post-decon rates
    srctok = {}
    for i in decon:
        srctok[live[i][1]] = srctok.get(live[i][1], 0) + ntok[i]
    alltok = sum(srctok.values())
    mixed = [i for i in decon
             if hm(i) * 2 * len(srctok) * srctok[live[i][1]] < alltok * 1000000]
    if takedown_rem is not None:
        mixed = [i for i in mixed if i % MOD != takedown_rem]
    # shard/pack placement
    rows = []
    bysh = {}
    for i in mixed:
        bysh.setdefault(eh(i) % SHARDS, []).append(i)
    for sh in sorted(bysh):
        off = 0
        for pos, i in enumerate(sorted(bysh[sh], key=lambda x: (eh(x), x)), 1):
            rmd5 = md5hex(" ".join(red[i]))
            rows.append((sh, pos, off // PACK, off % PACK,
                         i, live[i][1], ntok[i], rmd5))
            off += ntok[i]
    return rows


def p11_corpus(trial):
    """random corpus planting every p11 branch; {doc_id: (text, source)}."""
    rnd = random.Random(9900 + trial)
    nsrc = 2 + rnd.randrange(3)
    docs = {}

    def mktext(i, n):
        return " ".join(f"p{trial}d{i}t{j}" for j in range(n))

    # bench docs 0..19 (rem-3 ids die at the live filter — keep them in
    # to exercise it)
    for i in range(BENCH_IDS):
        docs[i] = (mktext(i, 15 + rnd.randrange(10)), f"s{i % nsrc}")
    n = 90 + rnd.randrange(60)
    for i in range(100, 100 + n):
        docs[i] = (mktext(i, 15 + rnd.randrange(26)), f"s{i % nsrc}")
    corpus_ids = sorted(i for i in docs if i >= 100)
    # duplicate clusters: exact copies + near copies (one token swapped);
    # one cluster canonical is UNCLEAN (low uniqueness) so its clean
    # copies are shadowed
    for g in range(6):
        base = corpus_ids[rnd.randrange(len(corpus_ids))]
        for c in range(1 + rnd.randrange(2)):
            cp = corpus_ids[rnd.randrange(len(corpus_ids))]
            if cp == base:
                continue
            t = docs[base][0]
            if rnd.random() < 0.5:
                toks = t.split(" ")
                toks[-1] = f"p{trial}sw{g}c{c}"
                t = " ".join(toks)
            docs[cp] = (t, docs[cp][1])
    shadow = corpus_ids[rnd.randrange(len(corpus_ids))]
    long_dup = " ".join(["dupword"] * 40)  # uniq 1/40 < 0.3: unclean
    docs[shadow] = (long_dup, docs[shadow][1])
    docs[shadow + 1 if shadow + 1 in docs else corpus_ids[0]] = (
        " ".join(["dupword"] * 39 + ["tail"]), docs[corpus_ids[0]][1])
    # contamination: 4 docs get a bench shingle spliced in
    bench_toks = docs[0][0].split(" ")
    for k in range(4):
        i = corpus_ids[rnd.randrange(len(corpus_ids))]
        toks = docs[i][0].split(" ")
        if len(toks) >= SHINGLE:
            toks[0:SHINGLE] = bench_toks[0:SHINGLE]
            docs[i] = (" ".join(toks), docs[i][1])
    # redactable PII tokens (arity-preserving)
    for k in range(6):
        i = corpus_ids[rnd.randrange(len(corpus_ids))]
        toks = docs[i][0].split(" ")
        toks[k % len(toks)] = ["12345", "https://x.example/y",
                               "bob@example.com"][k % 3]
        docs[i] = (" ".join(toks), docs[i][1])
    # short reject
    i = corpus_ids[-1]
    docs[i] = (mktext(i, 8), docs[i][1])
    return docs


TRIALS_RUN = [0]  # zero-trial tripwire: SKIPs alone must not read green


def p11_trials(oracle, ok):
    for name, rem in (("p11_corpus_build", None),
                      ("p13_placement_takedown", TAKEDOWN)):
        if name not in oracle:
            # Verify's optional prefix filter dumps partial files —
            # absent entries are a skipped trial, not a FAIL (but see
            # the zero-trial tripwire in main: a dump covering NONE of
            # the proptested entries exits non-zero, so a renamed
            # oracle key can never silently pass as all-SKIP green)
            print(f"SKIP {name}: not in this oracle dump")
            continue
        sql = oracle[name]
        TRIALS_RUN[0] += 1
        for trial in (1, 2, 3):
            docs = p11_corpus(trial)
            frame = pd.DataFrame({
                "doc_id": sorted(docs),
                "text": [docs[i][0] for i in sorted(docs)],
                "source": [docs[i][1] for i in sorted(docs)],
            })
            want = p11_model(docs, takedown_rem=rem)
            con = duckdb.connect()
            con.register("documents", frame)
            got = [tuple(r) for r in con.execute(sql).fetchall()]
            want_t = [tuple(r) for r in want]
            if got == want_t and len(want_t) > 10:
                print(f"OK   {name} trial {trial}: {len(want_t)} placed "
                      f"rows match the model")
            else:
                ok = False
                why = ("too few rows to be meaningful"
                       if got == want_t else
                       f"oracle={got[:3]}... model={want_t[:3]}...")
                print(f"FAIL {name} trial {trial}: {why}")
    return ok


def main():
    oracle = json.load(open(sys.argv[1]))
    sql = oracle.get("p12_incremental_build")
    if sql is None:
        print("SKIP p12_incremental_build: not in this oracle dump")
        ok = p11_trials(oracle, True)
        if TRIALS_RUN[0] == 0:
            print("FAIL: no proptest-covered entry in this dump — "
                  "nothing was validated (wrong file or renamed keys?)")
            sys.exit(2)
        sys.exit(0 if ok else 1)
    TRIALS_RUN[0] += 1
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
    ok = p11_trials(oracle, ok)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
