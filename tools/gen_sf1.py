#!/usr/bin/env python3
"""Synthesize an sf1 scale point (r16 verdict item 7): a deterministic
x10 key-shifted replication of /root/testdata/sf0.1 into /tmp/sf1_synth.

The driver's generator produced sf{0.001,0.01,0.1} (read-only); a
fourth decade catches scaling fits that only bend past sf0.1. This
replication preserves:
  - referential integrity: EVERY int64 id column shifts by the same
    per-copy offset (1e12 * k), so any cross-table join key
    relationship holds within each copy;
  - per-copy density/distributions: values, time ranges, and dim
    tables (region/nation, int32 keys) are untouched — the corpus
    grows in entity space, not in time;
  - row identity: text gets a per-copy prefix (n_chars recomputed) and
    embeddings a per-copy dim-0 epsilon, so copies are not byte-equal.

Documented caveat for reading the audit: replicas are NEAR-duplicates
of each other by construction, so the dedup/similarity families see a
denser-than-organic candidate structure at sf1 — those rows are upper
bounds, not organic-corpus predictions.

r19 generalizations:
  - COPIES is an argument: copies=100 synthesizes the FIFTH decade
    (sf10, ~x100 sf0.1) the r18 verdict asked for.
  - --unsalted-frac F leaves a deterministic fraction F of each copy's
    documents UN-bijected (original tokens), injecting cross-copy
    near-duplicates at a measured rate — the density-bracketing corpus
    (r18 verdict item 5): salted = exactly-linear candidate growth
    (lower bound), F calibrated so CandidateDensity lands on the
    organic one-decade fit (x30.6). The selection keys on the BASE
    doc_id (id % round(1/F) == 0), so the same documents stay unsalted
    in every copy — required for them to actually collide cross-copy.

Usage: python3 tools/gen_sf1.py [outdir] [copies] [--unsalted-frac F]
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
args = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = args[0] if len(args) > 0 else "/tmp/sf1_synth"
COPIES = int(args[1]) if len(args) > 1 else 10
UNSALTED_FRAC = 0.0
for a in sys.argv[1:]:
    if a.startswith("--unsalted-frac"):
        UNSALTED_FRAC = float(a.split("=", 1)[1] if "=" in a
                              else sys.argv[sys.argv.index(a) + 1])
# id % UNSALTED_MOD == 0 -> keep original tokens in every copy
UNSALTED_MOD = round(1.0 / UNSALTED_FRAC) if UNSALTED_FRAC > 0 else 0
OFF = 10**12  # per-copy id offset: far above any sf0.1 id, no overflow

# int64 id columns per table (every other column replicates verbatim,
# except the documented text / n_chars / embedding mutations)
IDS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]  # fixed-size dims: do not replicate


def shifted_copy(tbl: pa.Table, name: str, k: int) -> pa.Table:
    cols = {}
    for col in tbl.column_names:
        arr = tbl.column(col)
        if k > 0 and col in IDS.get(name, []):
            # user_id is nullable in events: add_checked keeps nulls null
            arr = pc.add_checked(arr, k * OFF)
        elif name == "documents" and col == "text":
            if k > 0:
                # per-copy TOKEN BIJECTION (r17 verdict item 4): suffix
                # every whitespace token with the copy id. Jaccard over
                # shingles is invariant under a token renaming, so each
                # copy's INTERNAL near-dup structure is preserved
                # exactly, while cross-copy shingle overlap drops to
                # zero — the old "cp{k} " prefix left replicas as
                # near-duplicates of each other and inflated the LSH
                # band-candidate density 9x past the organic growth fit
                # (CandidateDensity, SCALE_AUDIT_r18.md).
                orig = arr.combine_chunks()
                arr = pc.replace_substring_regex(
                    orig, pattern=r"(\S+)",
                    replacement=rf"\1x{k}q")
                if UNSALTED_MOD:
                    # density bracketing: the same base docs stay
                    # un-bijected in EVERY copy, so they are genuine
                    # cross-copy near-duplicates at rate 1/UNSALTED_MOD
                    # (numpy modulo: this pyarrow build has no mod kernel)
                    import numpy as np
                    ids = tbl.column("doc_id").combine_chunks() \
                        .to_numpy(zero_copy_only=False)
                    keep = pa.array(ids % UNSALTED_MOD == 0)
                    arr = pc.if_else(keep, orig, arr)
        elif name == "documents" and col == "n_chars":
            continue  # recomputed from the mutated text below
        elif name == "embeddings" and col == "embedding" and k > 0:
            flat = arr.combine_chunks()
            values = flat.values.to_numpy(zero_copy_only=False).copy()
            offsets = flat.offsets.to_numpy(zero_copy_only=False)
            # per-copy RANDOM ROTATION (the embedding analog of the
            # token bijection): an orthogonal map preserves norms and
            # all within-copy cosines exactly, so each copy keeps the
            # original neighborhood structure, while cross-copy
            # similarities fall to the random-pair distribution —
            # replacing the old dim-0 epsilon that left replicas as
            # exact near-duplicates of each other. Fixed-width rows
            # only; ragged rows pass through unrotated (the engine
            # excludes them from every dense-vector family anyway).
            import numpy as np
            widths = offsets[1:] - offsets[:-1]
            if len(widths) and (w := int(np.bincount(widths).argmax())) > 0:
                rng = np.random.default_rng(1234 + k)
                q, _ = np.linalg.qr(rng.standard_normal((w, w)))
                dense = np.flatnonzero(widths == w)
                if UNSALTED_MOD:
                    # density bracketing, embedding side: the same base
                    # vectors stay UNROTATED in every copy — genuine
                    # cross-copy near-duplicates at rate 1/UNSALTED_MOD
                    vids = tbl.column("vec_id").combine_chunks() \
                        .to_numpy(zero_copy_only=False)
                    dense = dense[vids[dense] % UNSALTED_MOD != 0]
                starts = offsets[dense]
                idx = (starts[:, None] + np.arange(w)[None, :]).ravel()
                rot = (values[idx].reshape(-1, w) @ q.astype(np.float32))
                values[idx] = rot.ravel()
            # carry the validity bitmap through: without the mask a
            # NULL embedding row becomes an EMPTY LIST in shifted
            # copies, so replicas would not be distribution-identical
            # (r17 advice)
            null_mask = (pc.is_null(flat).to_numpy(zero_copy_only=False)
                         if flat.null_count else None)
            arr = pa.ListArray.from_arrays(flat.offsets,
                                           pa.array(values, pa.float32()),
                                           mask=null_mask)
        cols[col] = arr
    if name == "documents":
        cols["n_chars"] = pc.cast(pc.utf8_length(cols["text"]), pa.int64())
        # preserve the source column order
        cols = {c: cols[c] for c in tbl.column_names}
    return pa.table(cols)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in VERBATIM:
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tbl, f"{OUT}/{name}.parquet", compression="snappy")
        print(f"{name}: {len(tbl)} rows (verbatim)")
    for name in IDS:
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        out = f"{OUT}/{name}.parquet"
        writer = pq.ParquetWriter(out, shifted_copy(tbl, name, 0).schema,
                                  compression="snappy")
        for k in range(COPIES):
            writer.write_table(shifted_copy(tbl, name, k))
        writer.close()
        print(f"{name}: {len(tbl)} -> {len(tbl) * COPIES} rows")


if __name__ == "__main__":
    main()
