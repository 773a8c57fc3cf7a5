#!/usr/bin/env python3
"""Measure the DuckDB-side tractability ceiling of the BPE oracle replay
(round-19 ask #5): the twin's recursive CTE runs over DISTINCT WORDS x
MERGES rows (Bpe.oracleCtes), so a richer vocabulary or a longer merge
table grows the ORACLE, not just the engine under test. This script
times the exact CTE shape at a (vocab, merges) grid over the GenText
fixture and prints the wall per cell — the documented ceiling is where
the oracle stops being a practical per-round gate (~minutes).

Usage: python3 tools/bpe_oracle_ceiling.py <gentext_docs_dir> <merges_tsv>
  merges_tsv: lines "a<TAB>b" in learned order (BpeRealismProbe or
  BpeTrainTool can dump it); the grid truncates prefixes of it.
"""
import sys, time, duckdb

def cte(merges_sql, docs):
    return f"""WITH RECURSIVE
bpe_merges(step, a, b) AS (SELECT * FROM (VALUES {merges_sql}) t(step, a, b)),
bpe_base AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'), x -> len(x) > 0) AS bws
  FROM {docs}),
bpe_words AS (SELECT DISTINCT unnest(bws) AS w FROM bpe_base),
bpe_enc(w, seq, step) AS (
  SELECT w, chr(31) || array_to_string(list_transform(range(1, length(w)+1), i -> w[i:i]), chr(31)||chr(31)) || chr(31), 0 FROM bpe_words
  UNION ALL
  SELECT e.w, replace(e.seq, chr(31)||m.a||chr(31)||chr(31)||m.b||chr(31), chr(31)||m.a||m.b||chr(31)), e.step+1
  FROM bpe_enc e JOIN bpe_merges m ON m.step = e.step + 1),
bpe_counts AS (
  SELECT w, len(string_split(seq, chr(31)||chr(31))) AS ntok
  FROM bpe_enc WHERE step = (SELECT COALESCE(MAX(step), 0) FROM bpe_merges)),
bpe_doc AS (
  SELECT doc_id, CAST(SUM(c.ntok) AS INT) AS bpe_tokens
  FROM (SELECT doc_id, unnest(bws) AS w FROM bpe_base) dw
  JOIN bpe_counts c USING (w) GROUP BY doc_id)
SELECT COUNT(*), SUM(bpe_tokens) FROM bpe_doc"""

def main():
    docs_dir, merges_path = sys.argv[1], sys.argv[2]
    merges = [l.rstrip("\n").split("\t") for l in open(merges_path) if l.strip()]
    con = duckdb.connect()
    docs = f"read_parquet('{docs_dir}/*.parquet')"
    nwords = con.sql(
        f"SELECT COUNT(DISTINCT w) FROM (SELECT unnest(list_filter(string_split_regex(lower(text),'[ \\t\\n\\x0b\\f\\r]+'), x -> len(x)>0)) w FROM {docs})"
    ).fetchone()[0]
    print(f"distinct words: {nwords}")
    for m in (78, 128, 256, 512, 1024):
        if m > len(merges):
            break
        vals = ", ".join(
            f"({i+1}, '{a}', '{b}')" for i, (a, b) in enumerate(merges[:m]))
        t0 = time.time()
        row = con.sql(cte(vals, docs)).fetchone()
        dt = time.time() - t0
        print(f"merges={m:5d}  cte_rows={nwords*m:>12,}  wall={dt:7.2f} s  "
              f"(docs={row[0]}, tokens={row[1]})")

if __name__ == "__main__":
    main()
