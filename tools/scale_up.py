#!/usr/bin/env python3
"""Deterministic scale-up of a driver-generated testdata directory.

Usage: python3 tools/scale_up.py <srcDir> <dstDir> <factor>

Produces a <factor>x copy of the TPC-H-ish star schema + events/documents/
embeddings tables for the scale-factor sweep (e.g. sf0.1 -> sf1.0). The
driver only generates up to sf0.1; this tool extends it one decade so
Verify + the DuckDB oracle + Bench can run at sf1.0 on the same 10-table
contract. No RNG anywhere - copy k is a pure function of copy 0 - so the
output is bit-reproducible.

Scaling model (the 100 TB axis is entity cardinality, not time):
- region/nation: fixed dimensions, copied once.
- customer/supplier/part/orders/lineitem: copy k offsets every key by
  k * stride(table). Foreign keys use the referenced table's stride, so
  copy k joins stay internal to copy k (orders->customer,
  lineitem->orders/part/supplier).
- events: event_id and user_id offset (user_id with the CUSTOMER stride -
  the m4 lookup-remap join user_id = c_custkey must keep resolving);
  timestamps/types/values/props unchanged, so the time span and per-series
  sample rate stay fixed while series cardinality grows by <factor> -
  exactly how a metrics firehose scales.
- documents: doc_id offset; copy k > 0 suffixes every whitespace token
  with the copy index, which keeps each copy's near-duplicate cluster
  structure INTERNAL to the copy (shingle sets across copies are
  disjoint): the dedup workload scales as <factor> independent corpora
  instead of exploding the all-pairs relation with factor^2 cross-copy
  duplicates. n_chars recomputed from the new text.
- embeddings: vec_id offset (same stride pool as doc_id in case of
  doc<->vec joins) AND label offset by copy - the label column is the
  block/cluster id pool (the stand-in for an IVF assignment at 100 TB),
  and real corpora grow by adding CLUSTERS, not by inflating every
  cluster <factor>x: offsetting keeps the per-block size distribution
  fixed while block cardinality scales with the corpus, the exact
  analogue of the documents token-suffix treatment (without it the
  label-blocked self-joins in d5/d25/d26 go factor^2 on cross-copy
  pairs - measured 25-34x for 10x data before the fix). Vectors are
  copied verbatim - exact-duplicate vectors across copies tie on
  cosine and every consumer tie-breaks on id.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def read(src, name):
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def write(dst, name, table):
    pq.write_table(table, os.path.join(dst, f"{name}.parquet"),
                   version="2.6", compression="snappy")


def offset_col(table, col, off):
    i = table.schema.get_field_index(col)
    t = table.schema.field(i).type
    new = pc.add(table.column(col), pa.scalar(off, type=t))
    return table.set_column(i, table.schema.field(i), new)


def stride_of(table, col):
    return pc.max(table.column(col)).as_py() + 1


def suffix_words(text, k):
    return " ".join(w + str(k) for w in text.split(" "))


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)

    for name in ("region", "nation"):
        write(dst, name, read(src, name))

    customer = read(src, "customer")
    supplier = read(src, "supplier")
    part = read(src, "part")
    orders = read(src, "orders")
    lineitem = read(src, "lineitem")
    events = read(src, "events")
    documents = read(src, "documents")
    embeddings = read(src, "embeddings")

    # one stride per key pool; user_id shares the customer pool (the m4
    # join) and vec_id shares the doc pool
    s_cust = max(stride_of(customer, "c_custkey"),
                 stride_of(events, "user_id"))
    s_supp = stride_of(supplier, "s_suppkey")
    s_part = stride_of(part, "p_partkey")
    s_ord = max(stride_of(orders, "o_orderkey"),
                stride_of(lineitem, "l_orderkey"))
    s_evt = stride_of(events, "event_id")
    s_doc = max(stride_of(documents, "doc_id"),
                stride_of(embeddings, "vec_id"))

    def copies(table, offsets, textfix=None):
        out = []
        for k in range(factor):
            t = table
            for col, stride in offsets:
                t = offset_col(t, col, k * stride)
            if textfix and k > 0:
                t = textfix(t, k)
            out.append(t)
        return pa.concat_tables(out)

    write(dst, "customer", copies(customer, [("c_custkey", s_cust)]))
    write(dst, "supplier", copies(supplier, [("s_suppkey", s_supp)]))
    write(dst, "part", copies(part, [("p_partkey", s_part)]))
    write(dst, "orders", copies(
        orders, [("o_orderkey", s_ord), ("o_custkey", s_cust)]))
    write(dst, "lineitem", copies(
        lineitem, [("l_orderkey", s_ord), ("l_partkey", s_part),
                   ("l_suppkey", s_supp)]))
    write(dst, "events", copies(
        events, [("event_id", s_evt), ("user_id", s_cust)]))

    def fix_docs(t, k):
        texts = [suffix_words(x.as_py(), k) for x in t.column("text")]
        arr = pa.array(texts, type=t.schema.field("text").type)
        t = t.set_column(t.schema.get_field_index("text"),
                         t.schema.field("text"), arr)
        n = pa.array([len(x) for x in texts],
                     type=t.schema.field("n_chars").type)
        return t.set_column(t.schema.get_field_index("n_chars"),
                            t.schema.field("n_chars"), n)

    write(dst, "documents", copies(
        documents, [("doc_id", s_doc)], textfix=fix_docs))
    write(dst, "embeddings", copies(
        embeddings, [("vec_id", s_doc), ("label", stride_of(embeddings, "label"))]))

    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        n = pq.read_metadata(os.path.join(dst, f"{name}.parquet")).num_rows
        print(f"  {name}: {n} rows")


if __name__ == "__main__":
    main()
