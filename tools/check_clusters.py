#!/usr/bin/env python3
"""Derived-oracle check for the cluster-family queries (q55/q84/q90) at
scale factors where the full DuckDB oracle SQL is infeasible.

The expensive part of those oracles is the shared pair CTE — the exact
n-gram Jaccard pairs (q55/q84) or the exact cosine pairs (q90). At sf1
DuckDB's RECURSIVE closure over the quadratic pair CTE needs >90 GB and
fills the volume with spill. But the pair sets themselves ARE
independently verified: q37's rows (same nearDupJaccard(16, fractional df cap, 0.5)
call q55/q84 cluster) and q41's rows (the same exact-cosine >= 0.4 set
q90's band counts) hash-match their own DuckDB oracles at the same SF.
So this tool re-derives the CHEAP remainder of each oracle from the
verified dumps:

  q55: connected components (min-id label) over the verified q37 pairs,
       one row per document, keep = (doc_id == cluster_id)   [exact]
  q84: q55's decision + split_bucket = md5(text of the cluster canonical)
       % 100 via a LINEAR DuckDB pass over documents          [exact]
  q90: band row (n_vecs, n_exact_pairs, refine_ok, pair_recall_ok) with
       n_exact_pairs = |verified q41 rows|, n_vecs = non-null embeddings,
       flags = literal 1 (the oracle's own shape)             [exact]

Usage: tools/check_clusters.py <verify_out_dir> <sf_dir>
where verify_out_dir holds q37_ngram_jaccard_pairs/, q41_embedding_neardup/,
q55_dedup_clusters/, q84_cluster_safe_split/, q90_semantic_dedup/.
"""
import sys, os, glob
import duckdb
import pyarrow.parquet as pq


def read(out_dir, name, sort_by=None):
    # read EVERY part file: a multi-part dump (Verify without coalesce(1),
    # or a re-partitioned rerun) must not silently drop rows and report a
    # spurious FAIL. Ordered comparisons re-sort explicitly (sort_by)
    # instead of trusting file layout to match the query's ORDER BY.
    files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not files:
        sys.exit(f"missing spark dump {name}")
    df = pq.read_table(files).to_pandas()
    if sort_by is not None:
        df = df.sort_values(sort_by, ignore_index=True)
    return df


def components(pairs, all_ids):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for i, j in pairs:
        ri, rj = find(i), find(j)
        if ri != rj:
            # min-id root keeps the oracle's min(r) labeling
            lo, hi = (ri, rj) if ri < rj else (rj, ri)
            parent[hi] = lo
    return {d: find(d) for d in all_ids}


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    docs_glob = f"{sf_dir}/documents.parquet"
    if os.path.isdir(docs_glob):
        docs_glob += "/*.parquet"
    emb_glob = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(emb_glob):
        emb_glob += "/*.parquet"

    n_fail = 0

    # ---- q55 ----
    q37 = read(out_dir, "q37_ngram_jaccard_pairs")
    doc_rows = con.execute(
        f"SELECT doc_id, CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 100 "
        f"FROM read_parquet('{docs_glob}') ORDER BY doc_id").fetchall()
    all_ids = [r[0] for r in doc_rows]
    bucket = dict(doc_rows)
    comp = components(zip(q37.i, q37.j), all_ids)
    q55 = read(out_dir, "q55_dedup_clusters", sort_by="doc_id")
    exp55 = [(d, comp[d], 1 if d == comp[d] else 0) for d in all_ids]
    got55 = list(zip(q55.doc_id, q55.cluster_id, q55.keep))
    if got55 == exp55:
        print(f"PASS q55_dedup_clusters rows={len(got55)} (derived oracle)")
    else:
        n_fail += 1
        bad = next(i for i in range(len(exp55)) if got55[i] != exp55[i])
        print(f"FAIL q55: first diff at {bad}: got={got55[bad]} exp={exp55[bad]}")

    # ---- q84 ----
    q84 = read(out_dir, "q84_cluster_safe_split", sort_by="doc_id")
    def split_of(b):
        return "train" if b < 80 else ("val" if b < 90 else "test")
    exp84 = [(d, comp[d], 1 if d == comp[d] else 0, bucket[comp[d]],
              split_of(bucket[comp[d]])) for d in all_ids]
    got84 = list(zip(q84.doc_id, q84.cluster_id, q84.keep, q84.split_bucket, q84.split))
    if got84 == exp84:
        print(f"PASS q84_cluster_safe_split rows={len(got84)} (derived oracle)")
    else:
        n_fail += 1
        bad = next(i for i in range(len(exp84)) if got84[i] != exp84[i])
        print(f"FAIL q84: first diff at {bad}: got={got84[bad]} exp={exp84[bad]}")

    # ---- q90 ----
    q41 = read(out_dir, "q41_embedding_neardup")
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{emb_glob}') "
        f"WHERE embedding IS NOT NULL").fetchone()[0]
    q90 = read(out_dir, "q90_semantic_dedup")
    if len(q90) != 1:
        sys.exit(f"q90 dump has {len(q90)} rows; expected exactly 1 band row")
    got90 = list(q90.iloc[0])
    exp90 = [n_vecs, len(q41), 1, 1]
    if got90 == exp90:
        print(f"PASS q90_semantic_dedup band={got90} (derived oracle)")
    else:
        n_fail += 1
        print(f"FAIL q90: got={got90} exp={exp90}")

    print(f"== {3 - n_fail} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
